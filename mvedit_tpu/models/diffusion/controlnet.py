"""ControlNet (flax), mirroring the UNet encoder + zero-conv heads.

Rebuilds the ControlNets the reference drives through diffusers
(`lib/models/architecture/diffusers.py:546-569` PretrainedControlNet;
MultiControlNet use at `lib/pipelines/adapter3d_mixin.py:86-127` with tile +
depth [+ instruct-pix2pix] conditionings). Architecture = SD UNet down+mid
stack, a small conv stack embedding the (B, H, W, 3) hint image, and
zero-initialized 1x1 convs producing per-skip residuals.

`MultiControlNet` sums residuals from several nets weighted by conditioning
scales (the reference's controlnet_softness/cond scales).
"""
from dataclasses import field
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from .attention import AttnMode, Transformer2D
from .unet import (UNetConfig, SD15_UNET, ResnetBlock, Downsample,
                   timestep_embedding, _heads)

__all__ = ["ControlNet", "apply_multi_controlnet"]


class ControlNet(nn.Module):
    cfg: UNetConfig = field(default_factory=lambda: SD15_UNET)
    conditioning_channels: int = 3
    # number of stride-2 convs in the hint embedding; 3 matches SD's /8
    # latent space (set log2(cond_size / latent_size) for other VAEs)
    hint_strides: int = 3

    @nn.compact
    def __call__(self, sample, timesteps, encoder_hidden_states, cond_image,
                 conditioning_scale=1.0, mode: AttnMode = AttnMode(),
                 ip_context=None):
        """Returns (down_residuals list[13], mid_residual)."""
        cfg = self.cfg
        dt = cfg.dtype
        t_emb = timestep_embedding(timesteps, cfg.block_out_channels[0])
        temb = nn.Dense(cfg.block_out_channels[0] * 4, dtype=dt,
                        name="time_embedding_linear_1")(t_emb.astype(dt))
        temb = nn.Dense(cfg.block_out_channels[0] * 4, dtype=dt,
                        name="time_embedding_linear_2")(jax.nn.silu(temb))

        h = nn.Conv(cfg.block_out_channels[0], (3, 3), padding=1, dtype=dt,
                    name="conv_in")(sample.astype(dt))

        # hint embedding: 16-32-96-256 conv stack, zero-init last conv
        # (diffusers ControlNetConditioningEmbedding)
        c = cond_image.astype(dt)
        c = jax.nn.silu(nn.Conv(16, (3, 3), padding=1, dtype=dt,
                                name="cond_conv_in")(c))
        n_strided = 0
        for i, ch in enumerate((16, 32, 32, 96, 96, 256)):
            stride = 2 if (i % 2 == 1 and n_strided < self.hint_strides) \
                else 1
            n_strided += stride == 2
            c = jax.nn.silu(nn.Conv(ch, (3, 3), strides=(stride, stride),
                                    padding=1, dtype=dt,
                                    name=f"cond_blocks_{i}")(c))
        c = nn.Conv(cfg.block_out_channels[0], (3, 3), padding=1, dtype=dt,
                    kernel_init=nn.initializers.zeros,
                    name="cond_conv_out")(c)
        h = h + c

        ehs = encoder_hidden_states.astype(dt)
        residuals = [h]
        for bi, ch in enumerate(cfg.block_out_channels):
            has_attn = cfg.attn_down[bi]
            for li in range(cfg.layers_per_block):
                h = ResnetBlock(ch, dtype=dt,
                                name=f"down_{bi}_resnets_{li}")(h, temb)
                if has_attn:
                    nh, hd = _heads(cfg, ch)
                    h, _ = Transformer2D(
                        ch, nh, hd, 1, cfg.cross_attention_dim,
                        cfg.use_linear_projection, dtype=dt,
                        name=f"down_{bi}_attentions_{li}")(
                            h, ehs, mode=mode, ip_context=ip_context)
                residuals.append(h)
            if bi != len(cfg.block_out_channels) - 1:
                h = Downsample(ch, dtype=dt, name=f"down_{bi}_downsample")(h)
                residuals.append(h)

        ch = cfg.block_out_channels[-1]
        nh, hd = _heads(cfg, ch)
        h = ResnetBlock(ch, dtype=dt, name="mid_resnets_0")(h, temb)
        h, _ = Transformer2D(ch, nh, hd, 1, cfg.cross_attention_dim,
                             cfg.use_linear_projection, dtype=dt,
                             name="mid_attentions_0")(h, ehs, mode=mode,
                                                      ip_context=ip_context)
        h = ResnetBlock(ch, dtype=dt, name="mid_resnets_1")(h, temb)

        down_out = []
        for i, r in enumerate(residuals):
            down_out.append(
                nn.Conv(r.shape[-1], (1, 1), dtype=dt,
                        kernel_init=nn.initializers.zeros,
                        name=f"controlnet_down_blocks_{i}")(r)
                * conditioning_scale)
        mid_out = nn.Conv(h.shape[-1], (1, 1), dtype=dt,
                          kernel_init=nn.initializers.zeros,
                          name="controlnet_mid_block")(h) * conditioning_scale
        return down_out, mid_out


def apply_multi_controlnet(nets, params_list, sample, timesteps, ehs,
                           cond_images, scales, mode=AttnMode(),
                           ip_context=None):
    """Sum residuals over several ControlNets (diffusers MultiControlNet)."""
    downs, mid = None, None
    for net, p, ci, s in zip(nets, params_list, cond_images, scales):
        d, m = net.apply({"params": p}, sample, timesteps, ehs, ci,
                         conditioning_scale=s, mode=mode,
                         ip_context=ip_context)
        if downs is None:
            downs, mid = list(d), m
        else:
            downs = [a + b for a, b in zip(downs, d)]
            mid = mid + m
    return downs, mid
