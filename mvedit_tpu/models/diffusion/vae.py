"""AutoencoderKL (SD VAE) in flax, NHWC.

Rebuilds the VAE the reference loads from HF diffusers
(`lib/models/architecture/diffusers.py:571-618` PretrainedVAE /
VAEEncoder/VAEDecoder adapters). Standard SD geometry: 128/256/512/512
channels, 2 resnets per block, mid with one attention layer, scaling factor
0.18215 (SD1.5).

The pipelines use encode/decode on every denoise step (render -> latent,
latent -> view images, mvedit_3d_pipeline.py:1254-1266,1438-1479), so both
directions are bf16 and view-batched.
"""
from dataclasses import dataclass
from typing import Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn
from .norm import GroupNormNHWC

__all__ = ["VAEConfig", "Encoder", "Decoder", "AutoencoderKL", "SD_VAE"]


@dataclass(frozen=True)
class VAEConfig:
    in_channels: int = 3
    latent_channels: int = 4
    block_out_channels: Tuple[int, ...] = (128, 256, 512, 512)
    layers_per_block: int = 2
    scaling_factor: float = 0.18215
    dtype: jnp.dtype = jnp.bfloat16


SD_VAE = VAEConfig()


class VAEResnet(nn.Module):
    out_channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        in_ch = x.shape[-1]
        h = GroupNormNHWC(32, epsilon=1e-6, dtype=self.dtype, name="norm1")(x)
        h = jax.nn.silu(h)
        h = nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype,
                    name="conv1")(h)
        h = GroupNormNHWC(32, epsilon=1e-6, dtype=self.dtype, name="norm2")(h)
        h = jax.nn.silu(h)
        h = nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype,
                    name="conv2")(h)
        if in_ch != self.out_channels:
            x = nn.Conv(self.out_channels, (1, 1), dtype=self.dtype,
                        name="conv_shortcut")(x)
        return x + h


class VAEAttention(nn.Module):
    channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        B, H, W, C = x.shape
        h = GroupNormNHWC(32, epsilon=1e-6, dtype=self.dtype,
                         name="group_norm")(x)
        h = h.reshape(B, H * W, C)
        q = nn.Dense(C, dtype=self.dtype, name="to_q")(h)
        k = nn.Dense(C, dtype=self.dtype, name="to_k")(h)
        v = nn.Dense(C, dtype=self.dtype, name="to_v")(h)
        from .attention import dot_product_attention
        out = dot_product_attention(
            q[:, :, None, :], k[:, :, None, :], v[:, :, None, :])
        out = out.reshape(B, H * W, C)
        out = nn.Dense(C, dtype=self.dtype, name="to_out_0")(out)
        return x + out.reshape(B, H, W, C)


class Encoder(nn.Module):
    cfg: VAEConfig = SD_VAE

    @nn.compact
    def __call__(self, x):
        cfg, dt = self.cfg, self.cfg.dtype
        h = nn.Conv(cfg.block_out_channels[0], (3, 3), padding=1, dtype=dt,
                    name="conv_in")(x.astype(dt))
        for bi, ch in enumerate(cfg.block_out_channels):
            for li in range(cfg.layers_per_block):
                h = VAEResnet(ch, dtype=dt,
                              name=f"down_{bi}_resnets_{li}")(h)
            if bi != len(cfg.block_out_channels) - 1:
                # diffusers VAE downsample pads asymmetrically (0,1)
                h = jnp.pad(h, ((0, 0), (0, 1), (0, 1), (0, 0)))
                h = nn.Conv(ch, (3, 3), strides=(2, 2), padding="VALID",
                            dtype=dt, name=f"down_{bi}_downsample")(h)
        ch = cfg.block_out_channels[-1]
        h = VAEResnet(ch, dtype=dt, name="mid_resnets_0")(h)
        h = VAEAttention(ch, dtype=dt, name="mid_attentions_0")(h)
        h = VAEResnet(ch, dtype=dt, name="mid_resnets_1")(h)
        h = GroupNormNHWC(32, epsilon=1e-6, dtype=dt, name="conv_norm_out")(h)
        h = jax.nn.silu(h)
        h = nn.Conv(2 * cfg.latent_channels, (3, 3), padding=1, dtype=dt,
                    name="conv_out")(h)
        moments = nn.Conv(2 * cfg.latent_channels, (1, 1),
                          dtype=jnp.float32, name="quant_conv")(h)
        mean, logvar = jnp.split(moments, 2, axis=-1)
        return mean, jnp.clip(logvar, -30.0, 20.0)


class Decoder(nn.Module):
    cfg: VAEConfig = SD_VAE

    @nn.compact
    def __call__(self, z):
        cfg, dt = self.cfg, self.cfg.dtype
        z = nn.Conv(cfg.latent_channels, (1, 1), dtype=jnp.float32,
                    name="post_quant_conv")(z)
        ch = cfg.block_out_channels[-1]
        h = nn.Conv(ch, (3, 3), padding=1, dtype=dt, name="conv_in")(z.astype(dt))
        h = VAEResnet(ch, dtype=dt, name="mid_resnets_0")(h)
        h = VAEAttention(ch, dtype=dt, name="mid_attentions_0")(h)
        h = VAEResnet(ch, dtype=dt, name="mid_resnets_1")(h)
        for bi, ch in enumerate(reversed(cfg.block_out_channels)):
            for li in range(cfg.layers_per_block + 1):
                h = VAEResnet(ch, dtype=dt, name=f"up_{bi}_resnets_{li}")(h)
            if bi != len(cfg.block_out_channels) - 1:
                B, H, W, C = h.shape
                h = jax.image.resize(h, (B, H * 2, W * 2, C), "nearest")
                h = nn.Conv(ch, (3, 3), padding=1, dtype=dt,
                            name=f"up_{bi}_upsample")(h)
        h = GroupNormNHWC(32, epsilon=1e-6, dtype=dt, name="conv_norm_out")(h)
        h = jax.nn.silu(h)
        return nn.Conv(3, (3, 3), padding=1, dtype=jnp.float32,
                       name="conv_out")(h)


class AutoencoderKL(nn.Module):
    cfg: VAEConfig = SD_VAE

    def setup(self):
        self.encoder = Encoder(self.cfg, name="encoder")
        self.decoder = Decoder(self.cfg, name="decoder")

    def encode(self, x, key=None):
        """x: (B, H, W, 3) in [-1, 1] -> scaled latents (B, H/8, W/8, 4)."""
        mean, logvar = self.encoder(x)
        z = mean if key is None else (
            mean + jnp.exp(0.5 * logvar)
            * jax.random.normal(key, mean.shape, mean.dtype))
        return z * self.cfg.scaling_factor

    def decode(self, z):
        """scaled latents -> (B, H, W, 3) in [-1, 1]."""
        return self.decoder(z / self.cfg.scaling_factor)

    def __call__(self, x, key=None):
        return self.decode(self.encode(x, key))
