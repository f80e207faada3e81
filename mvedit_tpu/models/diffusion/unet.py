"""SD-compatible conditional UNet (flax), with encoder/decoder split.

TPU-native rebuild of the denoiser the reference drives through HF diffusers
(`lib/models/architecture/diffusers.py:57-238`): UNet2DConditionModel with
SD1.5 geometry (320/640/1280/1280, 3 cross-attn down blocks + 1 plain, mid,
4 up blocks, GEGLU FF, 8 heads). The reference splits the forward into
`unet_enc`/`unet_dec` so its "2-pass" mode can run the encoder once and the
decoder twice with ControlNet residuals injected only in pass 2
(diffusers.py:57-165, adapter3d_mixin.py:137-317) — here the same split is
`UNet2DCondition.__call__(..., part='enc'|'dec'|'all')`.

Layout choices for TPU: NHWC everywhere (conv-friendly), bf16 compute dtype
with fp32 params, attention funneled through one kernel entry point.
Parameter names mirror diffusers' state_dict so `weights.py` can convert
checkpoints key-by-key.
"""
import math
from dataclasses import dataclass, field
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from .attention import AttnMode, Transformer2D
from .norm import GroupNormNHWC

__all__ = ["UNetConfig", "UNet2DCondition", "timestep_embedding",
           "SD15_UNET", "SD21_UNET"]


@dataclass(frozen=True)
class UNetConfig:
    in_channels: int = 4
    out_channels: int = 4
    block_out_channels: Tuple[int, ...] = (320, 640, 1280, 1280)
    layers_per_block: int = 2
    cross_attention_dim: int = 768
    # which down blocks have cross-attention (SD1.5: first three)
    attn_down: Tuple[bool, ...] = (True, True, True, False)
    num_heads: int = 8
    head_dim: Optional[int] = None   # None -> channels // num_heads
    use_linear_projection: bool = False  # True for SD2.x
    dtype: jnp.dtype = jnp.bfloat16


SD15_UNET = UNetConfig()
SD21_UNET = UNetConfig(cross_attention_dim=1024, use_linear_projection=True,
                       head_dim=64, num_heads=0)


def timestep_embedding(timesteps, dim, max_period=10000.0):
    """Sinusoidal embeddings, diffusers convention (flip_sin_to_cos=True,
    downscale_freq_shift=0)."""
    half = dim // 2
    freqs = jnp.exp(-math.log(max_period) * jnp.arange(half, dtype=jnp.float32)
                    / half)
    args = timesteps.astype(jnp.float32)[:, None] * freqs[None]
    # diffusers UNet: cos first (flip_sin_to_cos)
    return jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)


class ResnetBlock(nn.Module):
    out_channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, temb):
        """x: (B, H, W, C); temb: (B, T)."""
        in_ch = x.shape[-1]
        h = GroupNormNHWC(32, epsilon=1e-5, dtype=self.dtype, name="norm1")(x)
        h = jax.nn.silu(h)
        h = nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype,
                    name="conv1")(h)
        t = nn.Dense(self.out_channels, dtype=self.dtype,
                     name="time_emb_proj")(jax.nn.silu(temb))
        h = h + t[:, None, None, :]
        h = GroupNormNHWC(32, epsilon=1e-5, dtype=self.dtype, name="norm2")(h)
        h = jax.nn.silu(h)
        h = nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype,
                    name="conv2")(h)
        if in_ch != self.out_channels:
            x = nn.Conv(self.out_channels, (1, 1), dtype=self.dtype,
                        name="conv_shortcut")(x)
        return x + h


class Downsample(nn.Module):
    channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        return nn.Conv(self.channels, (3, 3), strides=(2, 2), padding=1,
                       dtype=self.dtype, name="conv")(x)


class Upsample(nn.Module):
    channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        B, H, W, C = x.shape
        x = jax.image.resize(x, (B, H * 2, W * 2, C), "nearest")
        return nn.Conv(self.channels, (3, 3), padding=1, dtype=self.dtype,
                       name="conv")(x)


def _heads(cfg: UNetConfig, channels):
    if cfg.head_dim is not None:
        return channels // cfg.head_dim, cfg.head_dim
    return cfg.num_heads, channels // cfg.num_heads


class UNet2DCondition(nn.Module):
    """Full conditional UNet. Supports:

    - part='all': standard epsilon prediction;
    - part='enc': returns (sample_mid, down_residuals, temb, ref_writes);
    - part='dec': consumes those + optional ControlNet residuals.
    - `mode`: AttnMode for joint/IP/reference attention behavior.
    - `down_block_res` / `mid_block_res`: ControlNet residual injection
      (added to skip connections, diffusers convention).
    """
    cfg: UNetConfig = field(default_factory=lambda: SD15_UNET)

    @nn.compact
    def __call__(self, sample, timesteps, encoder_hidden_states,
                 part="all", mode: AttnMode = AttnMode(), ip_context=None,
                 ref_kv=None, down_block_res=None, mid_block_res=None,
                 enc_state=None, class_emb=None):
        cfg = self.cfg
        dt = cfg.dtype
        ref_writes = []
        ref_iter = iter(ref_kv) if ref_kv is not None else None

        def next_ref():
            return next(ref_iter) if ref_iter is not None else None

        if part in ("all", "enc"):
            t_emb = timestep_embedding(timesteps, cfg.block_out_channels[0])
            temb = nn.Dense(cfg.block_out_channels[0] * 4, dtype=dt,
                            name="time_embedding_linear_1")(t_emb.astype(dt))
            temb = nn.Dense(cfg.block_out_channels[0] * 4, dtype=dt,
                            name="time_embedding_linear_2")(jax.nn.silu(temb))
            if class_emb is not None:
                temb = temb + class_emb.astype(dt)

            h = nn.Conv(cfg.block_out_channels[0], (3, 3), padding=1,
                        dtype=dt, name="conv_in")(sample.astype(dt))
            residuals = [h]
            ehs = encoder_hidden_states.astype(dt)

            for bi, ch in enumerate(cfg.block_out_channels):
                has_attn = cfg.attn_down[bi]
                for li in range(cfg.layers_per_block):
                    h = ResnetBlock(ch, dtype=dt,
                                    name=f"down_{bi}_resnets_{li}")(h, temb)
                    if has_attn:
                        nh, hd = _heads(cfg, ch)
                        h, w_kv = Transformer2D(
                            ch, nh, hd, 1, cfg.cross_attention_dim,
                            cfg.use_linear_projection, dtype=dt,
                            name=f"down_{bi}_attentions_{li}")(
                                h, ehs, mode=mode, ip_context=ip_context,
                                ref_kv=next_ref())
                        ref_writes.append(w_kv)
                    residuals.append(h)
                if bi != len(cfg.block_out_channels) - 1:
                    h = Downsample(ch, dtype=dt,
                                   name=f"down_{bi}_downsample")(h)
                    residuals.append(h)

            # mid
            ch = cfg.block_out_channels[-1]
            nh, hd = _heads(cfg, ch)
            h = ResnetBlock(ch, dtype=dt, name="mid_resnets_0")(h, temb)
            h, w_kv = Transformer2D(
                ch, nh, hd, 1, cfg.cross_attention_dim,
                cfg.use_linear_projection, dtype=dt,
                name="mid_attentions_0")(h, ehs, mode=mode,
                                         ip_context=ip_context,
                                         ref_kv=next_ref())
            ref_writes.append(w_kv)
            h = ResnetBlock(ch, dtype=dt, name="mid_resnets_1")(h, temb)

            if part == "enc":
                return {"h": h, "residuals": residuals, "temb": temb,
                        "ehs": ehs, "ref_writes": ref_writes}
        else:
            assert enc_state is not None
            h = enc_state["h"]
            residuals = list(enc_state["residuals"])
            temb = enc_state["temb"]
            ehs = enc_state["ehs"]

        # ControlNet residual injection (diffusers convention: add to the
        # skip list + mid)
        if down_block_res is not None:
            residuals = [r + c.astype(dt)
                         for r, c in zip(residuals, down_block_res)]
        if mid_block_res is not None:
            h = h + mid_block_res.astype(dt)

        # up blocks (reversed channels; SD1.5: UpBlock2D then 3 CrossAttnUp)
        rev_ch = tuple(reversed(cfg.block_out_channels))
        rev_attn = tuple(reversed(cfg.attn_down))
        for bi, ch in enumerate(rev_ch):
            has_attn = rev_attn[bi]
            for li in range(cfg.layers_per_block + 1):
                res = residuals.pop()
                h = jnp.concatenate([h, res], axis=-1)
                h = ResnetBlock(ch, dtype=dt,
                                name=f"up_{bi}_resnets_{li}")(h, temb)
                if has_attn:
                    nh, hd = _heads(cfg, ch)
                    h, w_kv = Transformer2D(
                        ch, nh, hd, 1, cfg.cross_attention_dim,
                        cfg.use_linear_projection, dtype=dt,
                        name=f"up_{bi}_attentions_{li}")(
                            h, ehs, mode=mode, ip_context=ip_context,
                            ref_kv=next_ref())
                    ref_writes.append(w_kv)
            if bi != len(rev_ch) - 1:
                h = Upsample(ch, dtype=dt, name=f"up_{bi}_upsample")(h)

        h = GroupNormNHWC(32, epsilon=1e-5, dtype=dt, name="conv_norm_out")(h)
        h = jax.nn.silu(h)
        h = nn.Conv(cfg.out_channels, (3, 3), padding=1, dtype=jnp.float32,
                    name="conv_out")(h)
        if part == "all" and mode.reference == "write":
            return h, ref_writes
        return h
