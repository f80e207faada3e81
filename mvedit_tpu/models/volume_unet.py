"""Dense + masked-sparse 3D volume UNets (SSDNeRF volume-code variants).

TPU-native counterpart of the reference's `lib/models/architecture/volume.py`
(`UNetVolume` :287, `ResnetBlockVolume` :74, `UNetMidBlockVolume` :174,
`DownBlockVolume` :126, `UpBlockVolume` :237, plus the spconv sparse blocks
:499-697).

Design notes:
- Layout is NDHWC (XLA's conv-friendly channel-minor layout); the torch
  reference is NCDHW.
- The reference's sparse path needs spconv (GPU-only gather-scatter conv).
  On TPU the exact same semantics come out of *masked dense* compute:
  a SubMConv3d (submanifold conv: outputs only at active sites, inputs
  only from active sites) equals `conv3d(x * mask) * mask` because
  inactive features are zero by construction; SpGroupNorm (statistics over
  active rows only) equals a mask-weighted group norm. Dense 3D convs map
  straight onto the MXU, so at the reference's volume sizes (<= 160^3 with
  ~1-10% occupancy) the dense FLOPs are cheaper than emulated
  gather-scatter. `UpsampleSpVolume` (trilinear interp of the coarse
  manifold at new fine sites, volume.py:597-633) becomes a
  normalized masked trilinear upsample restricted to the fine mask.
- Mid-block attention flattens D*H*W voxels into a sequence; softmax
  accumulates in fp32 (the reference sets upcast_softmax=True).
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Tuple, Union

import jax
import jax.numpy as jnp
from flax import linen as nn

__all__ = ["VolumeUNetConfig", "UNetVolume", "ResnetBlockVolume",
           "masked_group_norm", "masked_conv3d_apply",
           "masked_trilinear_upsample", "downsample_mask"]


@dataclasses.dataclass(frozen=True)
class VolumeUNetConfig:
    """Mirrors UNetVolume.__init__ (volume.py:287-313)."""
    in_channels: int = 4
    out_channels: Optional[int] = None
    block_out_channels: Tuple[int, ...] = (320, 640, 1280, 1280)
    layers_per_block: Union[int, Tuple[int, ...]] = 2
    encoder_block_out_channels: Optional[Tuple[int, ...]] = None
    encoder_layers_per_block: Union[int, Tuple[int, ...]] = 2
    norm_num_groups: int = 32
    norm_eps: float = 1e-5
    attention_head_dim: Union[int, Tuple[int, ...]] = 8
    conv_in_kernel: int = 3
    conv_out_kernel: int = 3
    zero_init_residual: bool = True
    dtype: jnp.dtype = jnp.float32


def _conv3d(ch, k, name, dtype, zero_init=False, use_bias=True):
    init = (nn.initializers.zeros if zero_init
            else nn.initializers.he_normal())  # reference kaiming_init
    return nn.Conv(ch, (k, k, k), padding=(k - 1) // 2, dtype=dtype,
                   kernel_init=init, use_bias=use_bias, name=name)


def masked_group_norm(x, mask, groups, scale, bias, eps=1e-5):
    """Group norm with statistics over active voxels only (SpGroupNorm,
    volume.py:499-536, which normalizes the (N_active, C) feature rows).

    x: (B, D, H, W, C); mask: (B, D, H, W) bool; scale/bias: (C,).
    """
    B, D, H, W, C = x.shape
    g = groups
    xf = x.reshape(B, -1, g, C // g).astype(jnp.float32)
    m = mask.reshape(B, -1, 1, 1).astype(jnp.float32)
    n = jnp.sum(m, axis=1, keepdims=True) * (C // g) + 1e-12
    mean = jnp.sum(xf * m, axis=(1, 3), keepdims=True) / n
    var = jnp.sum(jnp.square(xf - mean) * m, axis=(1, 3), keepdims=True) / n
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    y = y.reshape(B, D, H, W, C).astype(x.dtype)
    y = y * scale.astype(x.dtype) + bias.astype(x.dtype)
    return y * mask[..., None].astype(x.dtype)


def masked_conv3d_apply(conv, x, mask):
    """SubMConv3d semantics: conv over zeroed-inactive inputs, outputs
    restricted to the active set."""
    mf = mask[..., None].astype(x.dtype)
    return conv(x * mf) * mf


def downsample_mask(mask, stride=2):
    """Active set of a stride-2 sparse conv: any active input in the
    receptive field (max-pool)."""
    return nn.max_pool(mask[..., None].astype(jnp.float32),
                       (stride,) * 3, (stride,) * 3)[..., 0] > 0.5


def masked_trilinear_upsample(x, mask, fine_mask, eps=1e-6):
    """UpsampleSpVolume (volume.py:597-633): sample the coarse masked
    volume at fine voxel centers with normalized trilinear weights
    (missing coarse corners renormalized away), restricted to fine_mask.

    x: (B, d, h, w, C) coarse; mask: (B, d, h, w); fine_mask: (B, 2d, 2h, 2w).
    """
    mf = mask[..., None].astype(jnp.float32)
    num = _trilinear2x(x.astype(jnp.float32) * mf)
    den = _trilinear2x(mf)
    out = num / (den + eps)
    return (out * fine_mask[..., None].astype(out.dtype)).astype(x.dtype), \
        fine_mask & (den[..., 0] > eps)


def _trilinear2x(x):
    """2x upsampling with half-pixel centers: fine voxel center j maps to
    coarse coordinate j/2 - 0.25 (the reference's `pts` mapping in
    UpsampleSpVolume). Border-clamped corners are exact here because the
    caller normalizes by the identically-upsampled mask."""
    for axis in (1, 2, 3):
        n = x.shape[axis]
        idx = jnp.arange(n)
        xm1 = jnp.take(x, jnp.maximum(idx - 1, 0), axis=axis)
        xp1 = jnp.take(x, jnp.minimum(idx + 1, n - 1), axis=axis)
        even = 0.25 * xm1 + 0.75 * x   # fine 2i   at coarse i - 0.25
        odd = 0.75 * x + 0.25 * xp1    # fine 2i+1 at coarse i + 0.25
        x = _interleave(even, odd, axis)
    return x


def _interleave(a, b, axis):
    """Interleave a and b along axis: [a0, b0, a1, b1, ...]."""
    stacked = jnp.stack([a, b], axis=axis + 1)
    shape = list(a.shape)
    shape[axis] *= 2
    return stacked.reshape(shape)


class ResnetBlockVolume(nn.Module):
    """GroupNorm-silu-conv x2 + shortcut (volume.py:74-122). With a mask,
    runs the SubMConv/SpGroupNorm semantics (volume.py:558-595)."""
    out_channels: int
    groups: int = 32
    eps: float = 1e-5
    zero_init_residual: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, mask=None):
        cfgn = dict(num_groups=self.groups, epsilon=self.eps,
                    dtype=self.dtype)
        conv1 = _conv3d(self.out_channels, 3, "conv1", self.dtype)
        conv2 = _conv3d(self.out_channels, 3, "conv2", self.dtype,
                        zero_init=self.zero_init_residual)
        h = x
        if mask is None:
            h = nn.GroupNorm(**cfgn, name="norm1")(h)
            h = nn.silu(h)
            h = conv1(h)
            h = nn.GroupNorm(**cfgn, name="norm2")(h)
            h = nn.silu(h)
            h = conv2(h)
        else:
            s1 = self.param("norm1_scale", nn.initializers.ones,
                            (x.shape[-1],))
            b1 = self.param("norm1_bias", nn.initializers.zeros,
                            (x.shape[-1],))
            s2 = self.param("norm2_scale", nn.initializers.ones,
                            (self.out_channels,))
            b2 = self.param("norm2_bias", nn.initializers.zeros,
                            (self.out_channels,))
            h = masked_group_norm(h, mask, self.groups, s1, b1, self.eps)
            h = nn.silu(h)
            h = masked_conv3d_apply(conv1, h, mask)
            h = masked_group_norm(h, mask, self.groups, s2, b2, self.eps)
            h = nn.silu(h)
            h = masked_conv3d_apply(conv2, h, mask)
        if x.shape[-1] != self.out_channels:
            sc = _conv3d(self.out_channels, 1, "conv_shortcut", self.dtype)
            x = sc(x) if mask is None else masked_conv3d_apply(sc, x, mask)
        return x + h


class _MidAttention(nn.Module):
    """Single-layer voxel self-attention, residual, fp32 softmax
    (diffusers Attention with residual_connection=True, upcast_softmax)."""
    head_dim: int
    groups: int
    eps: float
    zero_init_residual: bool
    dtype: jnp.dtype

    @nn.compact
    def __call__(self, x):
        B, D, H, W, C = x.shape
        heads = max(C // self.head_dim, 1)
        hd = C // heads
        res = x
        h = nn.GroupNorm(num_groups=self.groups, epsilon=self.eps,
                         dtype=self.dtype, name="group_norm")(x)
        h = h.reshape(B, D * H * W, C)
        q = nn.Dense(C, dtype=self.dtype, name="to_q")(h)
        k = nn.Dense(C, dtype=self.dtype, name="to_k")(h)
        v = nn.Dense(C, dtype=self.dtype, name="to_v")(h)
        L = D * H * W
        q = q.reshape(B, L, heads, hd).transpose(0, 2, 1, 3)
        k = k.reshape(B, L, heads, hd).transpose(0, 2, 1, 3)
        v = v.reshape(B, L, heads, hd).transpose(0, 2, 1, 3)
        a = jnp.einsum("bhqd,bhkd->bhqk", q, k).astype(jnp.float32)
        a = jax.nn.softmax(a / jnp.sqrt(hd), axis=-1).astype(v.dtype)
        o = jnp.einsum("bhqk,bhkd->bhqd", a, v)
        o = o.transpose(0, 2, 1, 3).reshape(B, L, C)
        o = nn.Dense(C, dtype=self.dtype, name="to_out",
                     kernel_init=(nn.initializers.zeros
                                  if self.zero_init_residual
                                  else nn.initializers.lecun_normal()))(o)
        return res + o.reshape(B, D, H, W, C)


class UNetVolume(nn.Module):
    """Dense 3D UNet over volume codes (volume.py:286-497).

    __call__(sample (B, D, H, W, Cin)) -> (out, extra_down_res_samples);
    with `encoder_block_out_channels` set, a strided encoder stack runs
    first and its per-stage activations are returned (the reference feeds
    them to a separate decoder)."""
    cfg: VolumeUNetConfig

    @nn.compact
    def __call__(self, sample):
        cfg = self.cfg
        dt = cfg.dtype
        nblocks = len(cfg.block_out_channels)
        lpb = cfg.layers_per_block
        lpb = (lpb,) * nblocks if isinstance(lpb, int) else tuple(lpb)
        ahd = cfg.attention_head_dim
        ahd = (ahd,) * nblocks if isinstance(ahd, int) else tuple(ahd)
        gn = cfg.norm_num_groups

        first_ch = (cfg.block_out_channels[0]
                    if cfg.encoder_block_out_channels is None
                    else cfg.encoder_block_out_channels[0])
        h = _conv3d(first_ch, cfg.conv_in_kernel, "conv_in", dt)(
            sample.astype(dt))

        # optional strided encoder (volume.py:329-352)
        extra_res = (h,)
        if cfg.encoder_block_out_channels is not None:
            elpb = cfg.encoder_layers_per_block
            elpb = ((elpb,) * len(cfg.encoder_block_out_channels)
                    if isinstance(elpb, int) else tuple(elpb))
            for i, ch in enumerate(cfg.encoder_block_out_channels):
                for j in range(elpb[i]):
                    h = ResnetBlockVolume(
                        ch, groups=gn, eps=cfg.norm_eps,
                        zero_init_residual=cfg.zero_init_residual, dtype=dt,
                        name=f"enc_{i}_res_{j}")(h)
                    extra_res += (h,)
                h = nn.Conv(ch, (3, 3, 3), strides=2, padding=1, dtype=dt,
                            kernel_init=nn.initializers.he_normal(),
                            name=f"enc_{i}_down")(h)
                extra_res += (h,)

        down_res = (h,)
        for i, ch in enumerate(cfg.block_out_channels):
            for j in range(lpb[i]):
                h = ResnetBlockVolume(
                    ch, groups=gn, eps=cfg.norm_eps,
                    zero_init_residual=cfg.zero_init_residual, dtype=dt,
                    name=f"down_{i}_res_{j}")(h)
                down_res += (h,)
            if i != nblocks - 1:
                h = nn.Conv(ch, (3, 3, 3), strides=2, padding=1, dtype=dt,
                            kernel_init=nn.initializers.he_normal(),
                            name=f"down_{i}_downsample")(h)
                down_res += (h,)

        # mid: resnet [attn resnet] (volume.py:174-234, num_layers=1)
        h = ResnetBlockVolume(cfg.block_out_channels[-1], groups=gn,
                              eps=cfg.norm_eps,
                              zero_init_residual=cfg.zero_init_residual,
                              dtype=dt, name="mid_res_0")(h)
        h = _MidAttention(head_dim=ahd[-1], groups=gn, eps=cfg.norm_eps,
                          zero_init_residual=cfg.zero_init_residual,
                          dtype=dt, name="mid_attn")(h)
        h = ResnetBlockVolume(cfg.block_out_channels[-1], groups=gn,
                              eps=cfg.norm_eps,
                              zero_init_residual=cfg.zero_init_residual,
                              dtype=dt, name="mid_res_1")(h)

        rev_ch = tuple(reversed(cfg.block_out_channels))
        rev_lpb = tuple(reversed(lpb))
        for i in range(nblocks):
            ch = rev_ch[i]
            nres = rev_lpb[i] + 1
            for j in range(nres):
                skip = down_res[-1]
                down_res = down_res[:-1]
                h = jnp.concatenate([h, skip], axis=-1)
                h = ResnetBlockVolume(
                    ch, groups=gn, eps=cfg.norm_eps,
                    zero_init_residual=cfg.zero_init_residual, dtype=dt,
                    name=f"up_{i}_res_{j}")(h)
            if i != nblocks - 1:
                B, D, H, W, C = h.shape
                h = jax.image.resize(h, (B, 2 * D, 2 * H, 2 * W, C),
                                     "nearest")
                h = _conv3d(C, 3, f"up_{i}_upsample", dt)(h)

        h = nn.GroupNorm(num_groups=gn, epsilon=cfg.norm_eps, dtype=dt,
                         name="conv_norm_out")(h)
        h = nn.silu(h)
        if cfg.out_channels is not None:
            h = _conv3d(cfg.out_channels, cfg.conv_out_kernel, "conv_out",
                        jnp.float32)(h)
        return h, extra_res
