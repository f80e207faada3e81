"""DDPM UNet for triplane-code diffusion (DenoisingUnetMod analog).

Rebuilds `lib/models/architecture/ddpm/denoising.py:13` (mmgen's DDPM UNet
with the group-norm fix + concat-cond support) used by the pure SSDNeRF
configs: resnet down/up blocks with time embedding, self-attention at the
configured resolutions, optional concatenated image/code conditioning.

Operates on the (B, 3, C, H, W) latent triplane by folding planes into
channels (the reference reshapes codes the same way,
diffusion_nerf.py:80-216).
"""
from dataclasses import dataclass
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from .diffusion.unet import timestep_embedding, ResnetBlock, Downsample, \
    Upsample
from .diffusion.attention import dot_product_attention

__all__ = ["DDPMUNetConfig", "DDPMUNet"]


@dataclass(frozen=True)
class DDPMUNetConfig:
    in_channels: int = 36            # 3 planes x 12 ch
    out_channels: int = 36
    base_channels: int = 128
    channel_mults: Tuple[int, ...] = (1, 2, 2, 4)
    layers_per_block: int = 2
    attn_levels: Tuple[int, ...] = (2, 3)
    num_heads: int = 4
    dtype: jnp.dtype = jnp.float32


class SelfAttention2D(nn.Module):
    heads: int = 4
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        B, H, W, C = x.shape
        h = nn.GroupNorm(32, dtype=self.dtype, name="norm")(x)
        h = h.reshape(B, H * W, C)
        qkv = nn.Dense(3 * C, dtype=self.dtype, name="qkv")(h)
        q, k, v = jnp.split(qkv, 3, -1)
        d = C // self.heads

        def split(t):
            return t.reshape(B, H * W, self.heads, d)

        o = dot_product_attention(split(q), split(k), split(v))
        o = nn.Dense(C, dtype=self.dtype, name="proj")(
            o.reshape(B, H * W, C))
        return x + o.reshape(B, H, W, C)


class DDPMUNet(nn.Module):
    cfg: DDPMUNetConfig = DDPMUNetConfig()

    @nn.compact
    def __call__(self, x, t, cond=None):
        """x: (B, P, C, H, W) triplane latent (or (B, H, W, C) image).
        cond: optional (B, H, W, Cc) concat conditioning.
        """
        cfg = self.cfg
        dt = cfg.dtype
        triplane_in = x.ndim == 5
        if triplane_in:
            B, P, C, H, W = x.shape
            h = x.transpose(0, 3, 4, 1, 2).reshape(B, H, W, P * C)
        else:
            h = x
        if cond is not None:
            h = jnp.concatenate([h, cond.astype(h.dtype)], axis=-1)
        temb = timestep_embedding(t, cfg.base_channels)
        temb = nn.Dense(cfg.base_channels * 4, dtype=dt, name="temb_1")(
            temb.astype(dt))
        temb = nn.Dense(cfg.base_channels * 4, dtype=dt,
                        name="temb_2")(jax.nn.silu(temb))

        h = nn.Conv(cfg.base_channels, (3, 3), padding=1, dtype=dt,
                    name="conv_in")(h)
        skips = [h]
        for li, mult in enumerate(cfg.channel_mults):
            ch = cfg.base_channels * mult
            for bi in range(cfg.layers_per_block):
                h = ResnetBlock(ch, dtype=dt,
                                name=f"down_{li}_res_{bi}")(h, temb)
                if li in cfg.attn_levels:
                    h = SelfAttention2D(cfg.num_heads, dtype=dt,
                                        name=f"down_{li}_attn_{bi}")(h)
                skips.append(h)
            if li != len(cfg.channel_mults) - 1:
                h = Downsample(ch, dtype=dt, name=f"down_{li}_ds")(h)
                skips.append(h)

        ch = cfg.base_channels * cfg.channel_mults[-1]
        h = ResnetBlock(ch, dtype=dt, name="mid_res_0")(h, temb)
        h = SelfAttention2D(cfg.num_heads, dtype=dt, name="mid_attn")(h)
        h = ResnetBlock(ch, dtype=dt, name="mid_res_1")(h, temb)

        for li, mult in enumerate(reversed(cfg.channel_mults)):
            lvl = len(cfg.channel_mults) - 1 - li
            ch = cfg.base_channels * mult
            for bi in range(cfg.layers_per_block + 1):
                h = jnp.concatenate([h, skips.pop()], axis=-1)
                h = ResnetBlock(ch, dtype=dt,
                                name=f"up_{li}_res_{bi}")(h, temb)
                if lvl in cfg.attn_levels:
                    h = SelfAttention2D(cfg.num_heads, dtype=dt,
                                        name=f"up_{li}_attn_{bi}")(h)
            if li != len(cfg.channel_mults) - 1:
                h = Upsample(ch, dtype=dt, name=f"up_{li}_us")(h)

        h = nn.GroupNorm(32, dtype=dt, name="norm_out")(h)
        out = nn.Conv(cfg.out_channels, (3, 3), padding=1,
                      dtype=jnp.float32, name="conv_out")(jax.nn.silu(h))
        if triplane_in:
            out = out.reshape(B, H, W, P, C).transpose(0, 3, 4, 1, 2)
        return out
