"""EfficientNet encoder (B7) for TRACER, flax, inference-mode BN.

Faithful re-implementation of the reference's vendored encoder
(`lib/models/architecture/tracerb7/efficientnet.py`, standard EfficientNet
MBConv stack): B7 = width x2.0, depth x3.1 of B0. `EfficientEncoderB7`
returns the four feature maps TRACER consumes (channels 48/80/224/640 at
strides 4/8/16/32, tracer_b7.py:30-33).

BatchNorm runs in inference mode: (mean, var, scale, bias) are plain params
filled by the weight converter — this model is frozen in every pipeline.
"""
import math
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

__all__ = ["EfficientEncoderB7", "b7_stage_config"]


def _round_filters(c, width_mult, divisor=8):
    c *= width_mult
    new_c = max(divisor, int(c + divisor / 2) // divisor * divisor)
    if new_c < 0.9 * c:
        new_c += divisor
    return int(new_c)


def _round_repeats(r, depth_mult):
    return int(math.ceil(depth_mult * r))


# B0 stages: (expand, channels, repeats, stride, kernel)
_B0 = [(1, 16, 1, 1, 3), (6, 24, 2, 2, 3), (6, 40, 2, 2, 5),
       (6, 80, 3, 2, 3), (6, 112, 3, 1, 5), (6, 192, 4, 2, 5),
       (6, 320, 1, 1, 3)]


def b7_stage_config(width_mult=2.0, depth_mult=3.1):
    return [(e, _round_filters(c, width_mult), _round_repeats(r, depth_mult),
             s, k) for (e, c, r, s, k) in _B0]


class BN(nn.Module):
    """Inference BatchNorm with stored statistics as params.

    eps defaults to the tf-efficientnet value (1e-3); torch-default nets
    (LoFTR ResNetFPN) pass eps=1e-5."""
    dtype: jnp.dtype = jnp.float32
    eps: float = 1e-3

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        mean = self.param("mean", nn.initializers.zeros, (c,))
        var = self.param("var", nn.initializers.ones, (c,))
        inv = jax.lax.rsqrt(var + self.eps) * scale
        return (x - mean) * inv + bias


class MBConv(nn.Module):
    out_channels: int
    expand: int
    stride: int
    kernel: int
    se_ratio: float = 0.25
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        dt = self.dtype
        cin = x.shape[-1]
        h = x
        if self.expand != 1:
            h = nn.Conv(cin * self.expand, (1, 1), use_bias=False, dtype=dt,
                        name="expand_conv")(h)
            h = BN(name="bn0")(h)
            h = jax.nn.silu(h)
        cexp = cin * self.expand
        h = nn.Conv(cexp, (self.kernel, self.kernel),
                    strides=(self.stride, self.stride),
                    padding=self.kernel // 2, feature_group_count=cexp,
                    use_bias=False, dtype=dt, name="depthwise_conv")(h)
        h = BN(name="bn1")(h)
        h = jax.nn.silu(h)
        # squeeze-excite (ratio of INPUT channels, torch convention)
        se_c = max(1, int(cin * self.se_ratio))
        s = jnp.mean(h, axis=(1, 2), keepdims=True)
        s = nn.Conv(se_c, (1, 1), dtype=dt, name="se_reduce")(s)
        s = jax.nn.silu(s)
        s = nn.Conv(cexp, (1, 1), dtype=dt, name="se_expand")(s)
        h = h * jax.nn.sigmoid(s)
        h = nn.Conv(self.out_channels, (1, 1), use_bias=False, dtype=dt,
                    name="project_conv")(h)
        h = BN(name="bn2")(h)
        if self.stride == 1 and cin == self.out_channels:
            h = h + x
        return h


class EfficientEncoderB7(nn.Module):
    """Returns [stage2 (48, /4), stage3 (80, /8), stage5 (224, /16),
    stage7 (640, /32)] features."""
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        dt = self.dtype
        stages = b7_stage_config()
        h = nn.Conv(_round_filters(32, 2.0), (3, 3), strides=(2, 2),
                    padding=1, use_bias=False, dtype=dt, name="stem_conv")(x)
        h = BN(name="stem_bn")(h)
        h = jax.nn.silu(h)
        feats = []
        block_i = 0
        for si, (e, c, r, s, k) in enumerate(stages):
            for li in range(r):
                h = MBConv(c, e, s if li == 0 else 1, k, dtype=dt,
                           name=f"blocks_{block_i}")(h)
                block_i += 1
            if si in (1, 2, 4, 6):
                feats.append(h)
        return feats
