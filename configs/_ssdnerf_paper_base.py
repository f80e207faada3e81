"""Shared base for the SSDNeRF paper-config family.

Mirrors the reference paper recipes (`configs/paper_cfgs/*.py`): 6-channel
128x128 triplanes decoded by a TriPlaneDecoder with 18->64 base layers,
diffusion lr 1e-4 / decoder lr 1e-3 / per-scene code lr 5e-3 (paper cfgs
:75,91-93). Variants override the dataset + iteration budget.
"""
import jax
import jax.numpy as jnp

from mvedit_tpu.models.ssdnerf import SSDNeRFConfig
from mvedit_tpu.models.triplane import TriPlaneConfig
from mvedit_tpu.models.volume_renderer import RenderConfig


def make_paper_config(code_lr=5e-3):
    return SSDNeRFConfig(
        code_shape=(3, 6, 128, 128),
        latent_shape=(3, 6, 128, 128),
        triplane=TriPlaneConfig(
            n_channels=6,
            plane_cfg=("yx", "yz", "xz"),
            flip_z=True,
            base_layers=(18, 64),
            density_layers=(64, 1),
            color_layers=(64, 3),
            dir_layers=(16, 64),
            bound=0.5),
        render=RenderConfig(num_samples=96, bound=0.5, grid_size=64),
        n_rays=4096,
        code_lr=code_lr,
        decoder_lr=1e-3,
        denoiser_lr=1e-4,
    )


def build_denoiser_for(cfg, key, ch=128, layout="stack"):
    """Compact conv denoiser over the (3, C, H, W) latent.

    layout="stack": planes fold into channels, (H, W, P*C) image — the
    paper's default (code_reshape=(P*C, H, W)).
    layout="tiled": planes tile side-by-side spatially, (H, P*W, C) image
    — the reference's `_tiled` recipe (new_cfgs/
    ssdnerf_cars_recons1v_tiled.py: code_permute=(1,2,0,3) +
    code_reshape=(C, H, P*W)), which keeps in_channels at C so plane
    boundaries are seen by convs instead of channel mixing.
    """
    from flax import linen as nn
    from mvedit_tpu.models.diffusion.unet import timestep_embedding

    P, C, H, W = cfg.latent_shape

    class LatentDenoiser(nn.Module):
        ch: int = 128

        @nn.compact
        def __call__(self, x, t, cond=None):
            B = x.shape[0]
            if layout == "tiled":
                # (B, P, C, H, W) -> (B, H, P*W, C)
                h = x.transpose(0, 3, 1, 4, 2).reshape(B, H, P * W, C)
            else:
                h = x.transpose(0, 3, 4, 1, 2).reshape(B, H, W, P * C)
            temb = timestep_embedding(t, self.ch)
            temb = nn.Dense(self.ch * 4, name="temb1")(temb)
            temb = nn.Dense(self.ch * 4, name="temb2")(jax.nn.silu(temb))
            h = nn.Conv(self.ch, (3, 3), padding=1, name="conv_in")(h)
            for i in range(4):
                # ref tiled recipe uses GN groups 16 at ch=80; cap by ch
                r = nn.GroupNorm(min(32, self.ch), name=f"norm{i}")(h)
                r = jax.nn.silu(r)
                r = nn.Conv(self.ch, (3, 3), padding=1, name=f"conv{i}a")(r)
                r = r + nn.Dense(self.ch, name=f"tproj{i}")(
                    jax.nn.silu(temb))[:, None, None]
                r = nn.Conv(self.ch, (3, 3), padding=1,
                            name=f"conv{i}b")(jax.nn.silu(r))
                h = h + r
            if layout == "tiled":
                out = nn.Conv(C, (3, 3), padding=1, name="conv_out")(h)
                return out.reshape(B, H, P, W, C).transpose(0, 2, 4, 1, 3)
            out = nn.Conv(P * C, (3, 3), padding=1, name="conv_out")(h)
            return out.reshape(B, H, W, P, C).transpose(0, 3, 4, 1, 2)

    net = LatentDenoiser(ch)
    x0 = jnp.zeros((1, P, C, H, W))
    t0 = jnp.zeros((1,), jnp.int32)
    params = net.init(key, x0, t0)

    def apply_fn(p, x, t, cond=None):
        return net.apply(p, x, t, cond)

    return net, apply_fn, params
