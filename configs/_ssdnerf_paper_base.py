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


def build_denoiser_for(cfg, key, ch=128):
    """Compact conv denoiser over the (3, C, H, W) latent (planes fold
    into channels) — the paper's DDPM UNet analog at matched latent
    geometry."""
    from flax import linen as nn
    from mvedit_tpu.models.diffusion.unet import timestep_embedding

    P, C, H, W = cfg.latent_shape

    class LatentDenoiser(nn.Module):
        ch: int = 128

        @nn.compact
        def __call__(self, x, t, cond=None):
            B = x.shape[0]
            h = x.transpose(0, 3, 4, 1, 2).reshape(B, H, W, P * C)
            temb = timestep_embedding(t, self.ch)
            temb = nn.Dense(self.ch * 4, name="temb1")(temb)
            temb = nn.Dense(self.ch * 4, name="temb2")(jax.nn.silu(temb))
            h = nn.Conv(self.ch, (3, 3), padding=1, name="conv_in")(h)
            for i in range(4):
                r = nn.GroupNorm(32, name=f"norm{i}")(h)
                r = jax.nn.silu(r)
                r = nn.Conv(self.ch, (3, 3), padding=1, name=f"conv{i}a")(r)
                r = r + nn.Dense(self.ch, name=f"tproj{i}")(
                    jax.nn.silu(temb))[:, None, None]
                r = nn.Conv(self.ch, (3, 3), padding=1,
                            name=f"conv{i}b")(jax.nn.silu(r))
                h = h + r
            out = nn.Conv(P * C, (3, 3), padding=1, name="conv_out")(h)
            return out.reshape(B, H, W, P, C).transpose(0, 3, 4, 1, 2)

    net = LatentDenoiser(ch)
    x0 = jnp.zeros((1, P, C, H, W))
    t0 = jnp.zeros((1,), jnp.int32)
    params = net.init(key, x0, t0)

    def apply_fn(p, x, t, cond=None):
        return net.apply(p, x, t, cond)

    return net, apply_fn, params
