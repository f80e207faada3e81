"""SSDNeRF ShapeNet-cars config (stablessdnerf_cars_lpips.py analog).

Python-object config (dataclasses, no mmcv registry): the decoder matches
`configs/sd/stablessdnerf_cars_lpips.py:73-95` (TriPlaneDecoder 48->64,
12ch/40x40 latent triplane upsampled to 48ch/80x80); the denoiser here is a
compact DDPM UNet over the latent triplane (the StableSSDNeRF variant swaps
in the SD2.1 UNet + LoRA via build_sd_denoiser).
"""
import jax
import jax.numpy as jnp

from mvedit_tpu.models.ssdnerf import SSDNeRFConfig
from mvedit_tpu.models.triplane import TriPlaneConfig
from mvedit_tpu.models.volume_renderer import RenderConfig

# Pure-SSDNeRF mode: diffusion directly over the decoder's code triplane
# (the StableSSDNeRF variant diffuses a (3,12,40,40) latent and runs the
# VAEDecoderPreproc 12ch/40 -> 16ch/80 before decoding; wire preproc_apply
# into make_train_step for that path).
ssdnerf_config = SSDNeRFConfig(
    code_shape=(3, 12, 40, 40),
    latent_shape=(3, 12, 40, 40),
    triplane=TriPlaneConfig(
        n_channels=12,
        plane_cfg=("yx", "yz", "xz"),
        flip_z=True,
        base_layers=(36, 64),
        density_layers=(64, 1),
        color_layers=(64, 3),
        dir_layers=(16, 64),
        bound=0.5),
    render=RenderConfig(num_samples=96, bound=0.5, grid_size=64),
    n_rays=4096,
    code_lr=0.04,
    decoder_lr=1e-3,
    denoiser_lr=1e-4,
)

train_config = dict(
    batch_size=4,
    max_iters=40000,       # stablessdnerf_cars_lpips.py:189 total_iters
    log_interval=50,
    ckpt_interval=2000,
)


def build_denoiser(key):
    """Compact conv denoiser over the (3, 12, 40, 40) latent (planes fold
    into channels -> (B, 40, 40, 36))."""
    from flax import linen as nn
    from mvedit_tpu.models.diffusion.unet import timestep_embedding

    class LatentDenoiser(nn.Module):
        ch: int = 128

        @nn.compact
        def __call__(self, x, t, cond=None):
            # x: (B, 3, C, H, W) -> (B, H, W, 3C)
            B, P, C, H, W = x.shape
            h = x.transpose(0, 3, 4, 1, 2).reshape(B, H, W, P * C)
            temb = timestep_embedding(t, self.ch)
            temb = nn.Dense(self.ch * 4, name="temb1")(temb)
            temb = nn.Dense(self.ch * 4, name="temb2")(jax.nn.silu(temb))
            h = nn.Conv(self.ch, (3, 3), padding=1, name="conv_in")(h)
            for i in range(4):
                r = nn.GroupNorm(32, name=f"norm{i}")(h)
                r = jax.nn.silu(r)
                r = nn.Conv(self.ch, (3, 3), padding=1,
                            name=f"conv{i}a")(r)
                r = r + nn.Dense(self.ch, name=f"tproj{i}")(
                    jax.nn.silu(temb))[:, None, None]
                r = nn.Conv(self.ch, (3, 3), padding=1,
                            name=f"conv{i}b")(jax.nn.silu(r))
                h = h + r
            out = nn.Conv(P * C, (3, 3), padding=1, name="conv_out")(h)
            return out.reshape(B, H, W, P, C).transpose(0, 3, 4, 1, 2)

    net = LatentDenoiser()
    x0 = jnp.zeros((1, 3, 12, 40, 40))
    t0 = jnp.zeros((1,), jnp.int32)
    params = net.init(key, x0, t0)["params"]

    def apply(params, x, t, cond):
        return net.apply({"params": params}, x, t, cond)

    return net, apply, params
