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


class StdConv(nn.Module):
    features: int
    kernel: int
    strides: int = 1
    padding: object = 0

    @nn.compact
    def __call__(self, x):
        k = self.param("kernel", nn.initializers.lecun_normal(),
                       (self.kernel, self.kernel, x.shape[-1],
                        self.features))
        mu = jnp.mean(k, axis=(0, 1, 2), keepdims=True)
        var = jnp.var(k, axis=(0, 1, 2), keepdims=True)
        k = (k - mu) / jnp.sqrt(var + 1e-8)
        pad = self.padding
        if isinstance(pad, int):
            pad = [(pad, pad), (pad, pad)]
        return jax.lax.conv_general_dilated(
            x, k, (self.strides, self.strides), pad,
            dimension_numbers=("NHWC", "HWIO", "NHWC"))


class PreActBottleneck(nn.Module):
    """timm ResNetV2 PreActBottleneck (GroupNorm32 + StdConv), the
    vitb_rn50_384 hybrid stage block."""
    mid: int
    stride: int = 1

    @nn.compact
    def __call__(self, x):
        out_c = self.mid * 4
        xp = jax.nn.relu(nn.GroupNorm(32, name="norm1")(x))
        if x.shape[-1] != out_c or self.stride != 1:
            sc = StdConv(out_c, 1, self.stride, name="downsample_conv")(xp)
        else:
            sc = x
        h = StdConv(self.mid, 1, name="conv1")(xp)
        h = jax.nn.relu(nn.GroupNorm(32, name="norm2")(h))
        h = StdConv(self.mid, 3, self.stride, padding=1, name="conv2")(h)
        h = jax.nn.relu(nn.GroupNorm(32, name="norm3")(h))
        h = StdConv(out_c, 1, name="conv3")(h)
        return sc + h


class ResNetStages(nn.Module):
    """ResNetV2 stem + stages (3, 4, 9) of the vitb_rn50_384 hybrid:
    /4 256ch, /8 512ch, /16 1024ch (the DPT-hybrid taps the first two and
    feeds the third to the ViT)."""
    layers: tuple = (3, 4, 9)

    @nn.compact
    def __call__(self, x):
        h = StdConv(64, 7, 2, padding=3, name="stem_conv")(x)
        h = jax.nn.relu(nn.GroupNorm(32, name="stem_norm")(h))
        h = jnp.pad(h, ((0, 0), (1, 1), (1, 1), (0, 0)),
                    constant_values=-jnp.inf)
        h = jax.lax.reduce_window(h, -jnp.inf, jax.lax.max, (1, 3, 3, 1),
                                  (1, 2, 2, 1), "VALID")
        feats = []
        for si, (n, mid) in enumerate(zip(self.layers, (64, 128, 256))):
            for i in range(n):
                h = PreActBottleneck(
                    mid, 2 if (i == 0 and si > 0) else 1,
                    name=f"stage{si + 1}_{i}")(h)
            feats.append(h)
        return tuple(feats)  # (/4 256, /8 512, /16 1024)


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
    resnet_layers: tuple = (3, 4, 9)       # vitb_rn50_384 stage depths

    @nn.compact
    def __call__(self, x):
        B, H, W, _ = x.shape
        f1, f2, f3 = ResNetStages(self.resnet_layers, name="resnet")(x)
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
