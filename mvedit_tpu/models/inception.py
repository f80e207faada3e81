"""InceptionV3 feature extractor (FID) + CLIP aesthetic score head.

Rebuilds the evaluation networks behind `lib/core/evaluation`:
- FID/KID use InceptionV3 pool3 (2048-d) activations
  (`core/evaluation/metrics.py:136-215` via mmgen's StyleGAN inception);
  weights convert from torchvision's inception_v3 with
  `convert_inception`;
- `AestheticScore` (`core/evaluation/aesthetic.py:82`): CLIP ViT-L image
  embedding -> 5-layer MLP -> scalar score.

Metric math lives in `utils/evaluation.py` (fid_from_feats/kid_from_feats).
"""
from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from .segmentors.efficientnet import BN

__all__ = ["InceptionV3Features", "AestheticHead"]


class ConvBN(nn.Module):
    ch: int
    kernel: tuple = (3, 3)
    strides: tuple = (1, 1)
    padding: object = 0

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.ch, self.kernel, strides=self.strides,
                    padding=self.padding, use_bias=False, name="conv")(x)
        return jax.nn.relu(BN(name="bn")(x))


def _pool(x, size=3, stride=1, pad=1, mode="max"):
    if mode == "max":
        x = jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)),
                    constant_values=-jnp.inf)
        return jax.lax.reduce_window(x, -jnp.inf, jax.lax.max,
                                     (1, size, size, 1),
                                     (1, stride, stride, 1), "VALID")
    x = jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)))
    s = jax.lax.reduce_window(x, 0.0, jax.lax.add, (1, size, size, 1),
                              (1, stride, stride, 1), "VALID")
    return s / (size * size)


class InceptionA(nn.Module):
    pool_ch: int

    @nn.compact
    def __call__(self, x):
        b1 = ConvBN(64, (1, 1), name="branch1x1")(x)
        b5 = ConvBN(48, (1, 1), name="branch5x5_1")(x)
        b5 = ConvBN(64, (5, 5), padding=2, name="branch5x5_2")(b5)
        b3 = ConvBN(64, (1, 1), name="branch3x3dbl_1")(x)
        b3 = ConvBN(96, (3, 3), padding=1, name="branch3x3dbl_2")(b3)
        b3 = ConvBN(96, (3, 3), padding=1, name="branch3x3dbl_3")(b3)
        bp = ConvBN(self.pool_ch, (1, 1), name="branch_pool")(
            _pool(x, mode="avg"))
        return jnp.concatenate([b1, b5, b3, bp], -1)


class InceptionB(nn.Module):
    @nn.compact
    def __call__(self, x):
        b3 = ConvBN(384, (3, 3), strides=(2, 2), name="branch3x3")(x)
        bd = ConvBN(64, (1, 1), name="branch3x3dbl_1")(x)
        bd = ConvBN(96, (3, 3), padding=1, name="branch3x3dbl_2")(bd)
        bd = ConvBN(96, (3, 3), strides=(2, 2), name="branch3x3dbl_3")(bd)
        bp = _pool(x, 3, 2, 0, "max")
        return jnp.concatenate([b3, bd, bp], -1)


class InceptionC(nn.Module):
    c7: int

    @nn.compact
    def __call__(self, x):
        c = self.c7
        b1 = ConvBN(192, (1, 1), name="branch1x1")(x)
        b7 = ConvBN(c, (1, 1), name="branch7x7_1")(x)
        b7 = ConvBN(c, (1, 7), padding=((0, 0), (3, 3)),
                    name="branch7x7_2")(b7)
        b7 = ConvBN(192, (7, 1), padding=((3, 3), (0, 0)),
                    name="branch7x7_3")(b7)
        bd = ConvBN(c, (1, 1), name="branch7x7dbl_1")(x)
        bd = ConvBN(c, (7, 1), padding=((3, 3), (0, 0)),
                    name="branch7x7dbl_2")(bd)
        bd = ConvBN(c, (1, 7), padding=((0, 0), (3, 3)),
                    name="branch7x7dbl_3")(bd)
        bd = ConvBN(c, (7, 1), padding=((3, 3), (0, 0)),
                    name="branch7x7dbl_4")(bd)
        bd = ConvBN(192, (1, 7), padding=((0, 0), (3, 3)),
                    name="branch7x7dbl_5")(bd)
        bp = ConvBN(192, (1, 1), name="branch_pool")(_pool(x, mode="avg"))
        return jnp.concatenate([b1, b7, bd, bp], -1)


class InceptionD(nn.Module):
    @nn.compact
    def __call__(self, x):
        b3 = ConvBN(192, (1, 1), name="branch3x3_1")(x)
        b3 = ConvBN(320, (3, 3), strides=(2, 2), name="branch3x3_2")(b3)
        b7 = ConvBN(192, (1, 1), name="branch7x7x3_1")(x)
        b7 = ConvBN(192, (1, 7), padding=((0, 0), (3, 3)),
                    name="branch7x7x3_2")(b7)
        b7 = ConvBN(192, (7, 1), padding=((3, 3), (0, 0)),
                    name="branch7x7x3_3")(b7)
        b7 = ConvBN(192, (3, 3), strides=(2, 2), name="branch7x7x3_4")(b7)
        bp = _pool(x, 3, 2, 0, "max")
        return jnp.concatenate([b3, b7, bp], -1)


class InceptionE(nn.Module):
    @nn.compact
    def __call__(self, x):
        b1 = ConvBN(320, (1, 1), name="branch1x1")(x)
        b3 = ConvBN(384, (1, 1), name="branch3x3_1")(x)
        b3a = ConvBN(384, (1, 3), padding=((0, 0), (1, 1)),
                     name="branch3x3_2a")(b3)
        b3b = ConvBN(384, (3, 1), padding=((1, 1), (0, 0)),
                     name="branch3x3_2b")(b3)
        bd = ConvBN(448, (1, 1), name="branch3x3dbl_1")(x)
        bd = ConvBN(384, (3, 3), padding=1, name="branch3x3dbl_2")(bd)
        bda = ConvBN(384, (1, 3), padding=((0, 0), (1, 1)),
                     name="branch3x3dbl_3a")(bd)
        bdb = ConvBN(384, (3, 1), padding=((1, 1), (0, 0)),
                     name="branch3x3dbl_3b")(bd)
        bp = ConvBN(192, (1, 1), name="branch_pool")(_pool(x, mode="avg"))
        return jnp.concatenate([b1, b3a, b3b, bda, bdb, bp], -1)


class InceptionV3Features(nn.Module):
    """(B, 299, 299, 3) in [0,1] -> (B, 2048) pool3 features."""

    @nn.compact
    def __call__(self, x):
        x = x * 2.0 - 1.0  # torchvision transform_input-free convention
        h = ConvBN(32, (3, 3), strides=(2, 2), name="Conv2d_1a_3x3")(x)
        h = ConvBN(32, (3, 3), name="Conv2d_2a_3x3")(h)
        h = ConvBN(64, (3, 3), padding=1, name="Conv2d_2b_3x3")(h)
        h = _pool(h, 3, 2, 0, "max")
        h = ConvBN(80, (1, 1), name="Conv2d_3b_1x1")(h)
        h = ConvBN(192, (3, 3), name="Conv2d_4a_3x3")(h)
        h = _pool(h, 3, 2, 0, "max")
        h = InceptionA(32, name="Mixed_5b")(h)
        h = InceptionA(64, name="Mixed_5c")(h)
        h = InceptionA(64, name="Mixed_5d")(h)
        h = InceptionB(name="Mixed_6a")(h)
        h = InceptionC(128, name="Mixed_6b")(h)
        h = InceptionC(160, name="Mixed_6c")(h)
        h = InceptionC(160, name="Mixed_6d")(h)
        h = InceptionC(192, name="Mixed_6e")(h)
        h = InceptionD(name="Mixed_7a")(h)
        h = InceptionE(name="Mixed_7b")(h)
        h = InceptionE(name="Mixed_7c")(h)
        return jnp.mean(h, axis=(1, 2))


class AestheticHead(nn.Module):
    """CLIP image embed (768) -> aesthetic score
    (core/evaluation/aesthetic.py MLP: 768-1024-128-64-16-1)."""

    @nn.compact
    def __call__(self, emb):
        emb = emb / jnp.clip(
            jnp.linalg.norm(emb, axis=-1, keepdims=True), 1e-8, None)
        h = nn.Dense(1024, name="fc1")(emb)
        h = nn.Dense(128, name="fc2")(jax.nn.relu(h))
        h = nn.Dense(64, name="fc3")(jax.nn.relu(h))
        h = nn.Dense(16, name="fc4")(jax.nn.relu(h))
        return nn.Dense(1, name="fc5")(h)[..., 0]
