"""DPT-hybrid monocular normal predictor (Omnidata), flax.

Rebuilds the reference's vendored Omnidata stack
(`omnidata_modules/midas/dpt_depth.py:87`, vit.py, blocks.py — the
`vitb_rn50_384` hybrid): ResNet50 stem+stages(1,2) -> ViT-B/16 over the
/16 feature map (with the two ResNet maps tapped as skip features) -> four
Reassemble stages -> RefineNet-style fusion -> 3-channel head, used as the
surface-normal conditioner (`adapter3d.py:338-361` load_normal_model;
consumed at `mvedit_3d_pipeline.py:248 enable_normals`).

Inference-only: BN uses stored statistics (params).
"""
from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from .efficientnet import BN

__all__ = ["DPTNormalModel"]


class Bottleneck(nn.Module):
    mid: int
    stride: int = 1

    @nn.compact
    def __call__(self, x):
        out_c = self.mid * 4
        h = nn.Conv(self.mid, (1, 1), use_bias=False, name="conv1")(x)
        h = jax.nn.relu(BN(name="bn1")(h))
        h = nn.Conv(self.mid, (3, 3), strides=(self.stride, self.stride),
                    padding=1, use_bias=False, name="conv2")(h)
        h = jax.nn.relu(BN(name="bn2")(h))
        h = nn.Conv(out_c, (1, 1), use_bias=False, name="conv3")(h)
        h = BN(name="bn3")(h)
        if x.shape[-1] != out_c or self.stride != 1:
            x = nn.Conv(out_c, (1, 1), strides=(self.stride, self.stride),
                        use_bias=False, name="downsample_conv")(x)
            x = BN(name="downsample_bn")(x)
        return jax.nn.relu(x + h)


class ResNetStages(nn.Module):
    """ResNet50 stem + layer1 (/4, 256ch) + layer2 (/8, 512ch)."""

    @nn.compact
    def __call__(self, x):
        h = nn.Conv(64, (7, 7), strides=(2, 2), padding=3, use_bias=False,
                    name="conv1")(x)
        h = jax.nn.relu(BN(name="bn1")(h))
        h = jnp.pad(h, ((0, 0), (1, 1), (1, 1), (0, 0)), constant_values=-jnp.inf)
        h = jax.lax.reduce_window(h, -jnp.inf, jax.lax.max, (1, 3, 3, 1),
                                  (1, 2, 2, 1), "VALID")
        for i in range(3):
            h = Bottleneck(64, 1, name=f"layer1_{i}")(h)
        f1 = h                       # /4, 256
        for i in range(4):
            h = Bottleneck(128, 2 if i == 0 else 1, name=f"layer2_{i}")(h)
        f2 = h                       # /8, 512
        for i in range(6):
            h = Bottleneck(256, 2 if i == 0 else 1, name=f"layer3_{i}")(h)
        f3 = h                       # /16, 1024 -> ViT input
        return f1, f2, f3


class ViTBlock(nn.Module):
    dim: int = 768
    heads: int = 12

    @nn.compact
    def __call__(self, x):
        h = nn.LayerNorm(name="norm1")(x)
        d = self.dim // self.heads
        qkv = nn.Dense(self.dim * 3, name="qkv")(h)
        q, k, v = jnp.split(qkv, 3, axis=-1)

        def split(t):
            return t.reshape(t.shape[0], t.shape[1], self.heads, d)

        from ..diffusion.attention import dot_product_attention
        o = dot_product_attention(split(q), split(k), split(v))
        o = o.reshape(x.shape)
        x = x + nn.Dense(self.dim, name="proj")(o)
        h = nn.LayerNorm(name="norm2")(x)
        h = nn.Dense(self.dim * 4, name="fc1")(h)
        h = jax.nn.gelu(h)
        return x + nn.Dense(self.dim, name="fc2")(h)


class ResidualConvUnit(nn.Module):
    ch: int

    @nn.compact
    def __call__(self, x):
        h = jax.nn.relu(x)
        h = nn.Conv(self.ch, (3, 3), padding=1, name="conv1")(h)
        h = jax.nn.relu(h)
        h = nn.Conv(self.ch, (3, 3), padding=1, name="conv2")(h)
        return x + h


class FeatureFusion(nn.Module):
    ch: int

    @nn.compact
    def __call__(self, x, skip=None):
        if skip is not None:
            x = x + ResidualConvUnit(self.ch, name="rcu1")(skip)
        x = ResidualConvUnit(self.ch, name="rcu2")(x)
        B, H, W, C = x.shape
        x = jax.image.resize(x, (B, H * 2, W * 2, C), "bilinear")
        return nn.Conv(self.ch, (1, 1), name="out_conv")(x)


class DPTNormalModel(nn.Module):
    """Input (B, H, W, 3) in [0,1], H,W multiples of 32 (ref uses 384).
    Output (B, H, W, 3) normals in [0, 1]."""
    vit_dim: int = 768
    vit_layers: int = 12
    features: int = 256
    readout_taps: Sequence[int] = (8, 11)  # ViT layers tapped (hybrid)

    @nn.compact
    def __call__(self, x):
        B, H, W, _ = x.shape
        f1, f2, f3 = ResNetStages(name="resnet")(x)
        hp, wp = f3.shape[1], f3.shape[2]
        tokens = nn.Conv(self.vit_dim, (1, 1), name="patch_embed")(f3)
        tokens = tokens.reshape(B, hp * wp, self.vit_dim)
        cls = self.param("cls_token", nn.initializers.zeros,
                         (1, 1, self.vit_dim))
        pos = self.param("pos_embed", nn.initializers.zeros,
                         (1, hp * wp + 1, self.vit_dim))
        t = jnp.concatenate(
            [jnp.broadcast_to(cls, (B, 1, self.vit_dim)), tokens], 1) + pos
        taps = []
        for i in range(self.vit_layers):
            t = ViTBlock(self.vit_dim, name=f"vit_{i}")(t)
            if i in self.readout_taps:
                taps.append(t)

        def tokens_to_map(tk, out_ch, scale_name):
            # ignore-readout: drop cls token
            m = tk[:, 1:].reshape(B, hp, wp, self.vit_dim)
            return nn.Conv(out_ch, (1, 1), name=scale_name)(m)

        # Reassemble: layer1=f1(256), layer2=f2(512), layer3=tap0(/16),
        # layer4=tap1 downsampled (/32)
        l1 = nn.Conv(self.features, (3, 3), padding=1, name="proj1")(f1)
        l2 = nn.Conv(self.features, (3, 3), padding=1, name="proj2")(f2)
        l3 = tokens_to_map(taps[0], self.features, "proj3")
        l4 = tokens_to_map(taps[1], self.features, "proj4_pre")
        l4 = nn.Conv(self.features, (3, 3), strides=(2, 2), padding=1,
                     name="proj4")(l4)

        h = FeatureFusion(self.features, name="fusion4")(l4)
        h = FeatureFusion(self.features, name="fusion3")(h, l3)
        h = FeatureFusion(self.features, name="fusion2")(h, l2)
        h = FeatureFusion(self.features, name="fusion1")(h, l1)
        # head: conv -> upsample -> conv -> relu -> conv -> sigmoid(3ch)
        h = nn.Conv(self.features // 2, (3, 3), padding=1, name="head1")(h)
        B2, Hh, Wh, C2 = h.shape
        h = jax.image.resize(h, (B2, H, W, C2), "bilinear")
        h = jax.nn.relu(nn.Conv(32, (3, 3), padding=1, name="head2")(h))
        return jax.nn.sigmoid(nn.Conv(3, (1, 1), name="head3")(h))
