"""TRACER-B7 salient-object segmentor (flax), faithful to the reference.

Rebuilds `lib/models/segmentors/tracer_b7.py:16-84` and the vendored decoder
(`lib/models/architecture/tracerb7/tracer.py`, `att_modules.py`,
`conv_modules.py`): EfficientNet-B7 encoder -> RFB blocks -> multi-level
Aggregation with the Union Attention Module -> two ObjectAttention
refinements; preprocessing resize->640 + ImageNet normalization, erosion via
-maxpool(-x), and the failure-detection rule (mask covers everything at >0.2
=> zero out everything below 0.8, tracer_b7.py:71-74).
"""
from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from .efficientnet import EfficientEncoderB7
from ...ops.image import resize_bilinear

__all__ = ["TracerDecoder", "tracer_segment"]

_IMAGENET_MEAN = (0.485, 0.456, 0.406)
_IMAGENET_STD = (0.229, 0.224, 0.225)


class ConvBNRelu(nn.Module):
    """BasicConv2d analog (conv_modules.py): conv -> BN -> ReLU."""
    out_channels: int
    kernel: tuple = (1, 1)
    dilation: int = 1
    padding: object = 0

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.out_channels, self.kernel,
                    kernel_dilation=(self.dilation, self.dilation),
                    padding=self.padding, use_bias=False, name="conv")(x)
        from .efficientnet import BN
        x = BN(name="bn")(x)
        return jax.nn.relu(x)


class DWConv(nn.Module):
    out_channels: int
    kernel: int = 3
    padding: int = 1
    dilation: int = 1

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        x = nn.Conv(self.out_channels, (self.kernel, self.kernel),
                    padding=self.padding,
                    kernel_dilation=(self.dilation, self.dilation),
                    feature_group_count=c, use_bias=False, name="conv")(x)
        from .efficientnet import BN
        x = BN(name="bn")(x)
        return jax.nn.relu(x)


class DWSConv(nn.Module):
    """Depthwise separable conv (conv_modules.py DWSConv)."""
    out_channels: int
    kernel: int = 3
    padding: int = 1

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        x = nn.Conv(c, (self.kernel, self.kernel), padding=self.padding,
                    feature_group_count=c, use_bias=False,
                    name="depthwise")(x)
        from .efficientnet import BN
        x = BN(name="bn1")(x)
        x = jax.nn.relu(x)
        x = nn.Conv(self.out_channels, (1, 1), use_bias=False,
                    name="pointwise")(x)
        x = BN(name="bn2")(x)
        return jax.nn.relu(x)


class RFBBlock(nn.Module):
    out_channels: int

    @nn.compact
    def __call__(self, x):
        oc = self.out_channels
        b0 = ConvBNRelu(oc, name="branch0_0")(x)
        b1 = ConvBNRelu(oc, name="branch1_0")(x)
        b1 = ConvBNRelu(oc, (1, 3), padding=((0, 0), (1, 1)),
                        name="branch1_1")(b1)
        b1 = ConvBNRelu(oc, (3, 1), padding=((1, 1), (0, 0)),
                        name="branch1_2")(b1)
        b1 = ConvBNRelu(oc, (3, 3), dilation=3, padding=3,
                        name="branch1_3")(b1)
        b2 = ConvBNRelu(oc, name="branch2_0")(x)
        b2 = ConvBNRelu(oc, (1, 5), padding=((0, 0), (2, 2)),
                        name="branch2_1")(b2)
        b2 = ConvBNRelu(oc, (5, 1), padding=((2, 2), (0, 0)),
                        name="branch2_2")(b2)
        b2 = ConvBNRelu(oc, (3, 3), dilation=5, padding=5,
                        name="branch2_3")(b2)
        b3 = ConvBNRelu(oc, name="branch3_0")(x)
        b3 = ConvBNRelu(oc, (1, 7), padding=((0, 0), (3, 3)),
                        name="branch3_1")(b3)
        b3 = ConvBNRelu(oc, (7, 1), padding=((3, 3), (0, 0)),
                        name="branch3_2")(b3)
        b3 = ConvBNRelu(oc, (3, 3), dilation=7, padding=7,
                        name="branch3_3")(b3)
        cat = ConvBNRelu(oc, (3, 3), padding=1, name="conv_cat")(
            jnp.concatenate([b0, b1, b2, b3], -1))
        res = ConvBNRelu(oc, name="conv_res")(x)
        return jax.nn.relu(cat + res)


class UnionAttention(nn.Module):
    """Channel + spatial self-attention over the aggregated map
    (att_modules.py UnionAttentionModule; eval mode: dropout off)."""
    confidence_ratio: float = 0.1

    @nn.compact
    def __call__(self, x):
        from .efficientnet import BN
        B, H, W, C = x.shape
        gap = jnp.mean(x, axis=(1, 2), keepdims=True)  # (B,1,1,C)
        xn = BN(name="norm_bn")(gap)
        q = nn.Conv(C, (1, 1), use_bias=False, name="channel_q")(xn)[:, 0]
        k = nn.Conv(C, (1, 1), use_bias=False, name="channel_k")(xn)[:, 0]
        v = nn.Conv(C, (1, 1), use_bias=False, name="channel_v")(xn)[:, 0]
        # scaled dot product over the channel axis treated as sequence:
        # q,k,v are (B,1,C): attention of 1 query over 1 key -> just v
        att = v  # (B, 1, C); softmax over a single key is identity
        att = nn.Conv(C, (1, 1), use_bias=False, name="fc")(att[:, None])
        att = jax.nn.sigmoid(att)  # (B,1,1,C)
        x_c = x * att + x
        x_c = BN(name="bn")(x_c)
        # confidence masking: zero channels below the q-quantile of att
        mask = att[:, 0, 0]  # (B, C)
        thr = jnp.quantile(mask, self.confidence_ratio, axis=-1,
                           keepdims=True)
        mask = jnp.where(mask <= thr, 0.0, mask)
        x_drop = x_c * mask[:, None, None, :]
        q = nn.Conv(1, (1, 1), use_bias=False, name="spatial_q")(x_drop)
        k = nn.Conv(1, (1, 1), use_bias=False, name="spatial_k")(x_drop)
        v = nn.Conv(1, (1, 1), use_bias=False, name="spatial_v")(x_drop)
        qf = q.reshape(B, H * W, 1)
        kf = k.reshape(B, H * W, 1)
        vf = v.reshape(B, H * W, 1)
        scores = jax.nn.softmax(qf @ jnp.swapaxes(kf, 1, 2), axis=-1)
        out = (scores @ vf).reshape(B, H, W, 1) + v
        return out


class Aggregation(nn.Module):
    channels: Sequence[int] = (32, 64, 128)

    @nn.compact
    def __call__(self, e4, e3, e2):
        ch = self.channels

        def up(x):
            B, H, W, C = x.shape
            return jax.image.resize(x, (B, H * 2, W * 2, C), "bilinear")

        e3_1 = ConvBNRelu(ch[1], (3, 3), padding=1,
                          name="conv_upsample1")(up(e4)) * e3
        e2_1 = (ConvBNRelu(ch[0], (3, 3), padding=1,
                           name="conv_upsample2")(up(up(e4)))
                * ConvBNRelu(ch[0], (3, 3), padding=1,
                             name="conv_upsample3")(up(e3)) * e2)
        e3_2 = jnp.concatenate(
            [e3_1, ConvBNRelu(ch[2], (3, 3), padding=1,
                              name="conv_upsample4")(up(e4))], -1)
        e3_2 = ConvBNRelu(ch[2] + ch[1], (3, 3), padding=1,
                          name="conv_concat2")(e3_2)
        e2_2 = jnp.concatenate(
            [e2_1, ConvBNRelu(ch[2] + ch[1], (3, 3), padding=1,
                              name="conv_upsample5")(up(e3_2))], -1)
        x = ConvBNRelu(sum(ch), (3, 3), padding=1, name="conv_concat3")(e2_2)
        return UnionAttention(name="UAM")(x)


class ObjectAttention(nn.Module):
    channel: int

    @nn.compact
    def __call__(self, decoder_map, encoder_map):
        c = self.channel
        mask_ob = jax.nn.sigmoid(decoder_map)
        mask_bg = 1.0 - mask_ob
        edge = jnp.where(mask_bg > 0.93, 0.0, mask_bg)
        x = mask_ob * encoder_map + edge * encoder_map
        x = DWSConv(c // 2, 3, padding=1, name="DWSConv")(x)
        skip = x
        parts = []
        for i, (kk, pad, dil) in enumerate(((1, 0, 1), (3, 1, 1), (3, 3, 3),
                                            (3, 5, 5))):
            h = DWConv(c // 2, kk, pad, dil, name=f"DWConv{i + 1}_0")(x)
            h = ConvBNRelu(c // 8, name=f"DWConv{i + 1}_1")(h)
            parts.append(h)
        x = jnp.concatenate(parts, -1) + skip
        x = jax.nn.relu(ConvBNRelu(1, name="conv1")(x))
        return x + decoder_map


class TracerDecoder(nn.Module):
    rfb_channels: Sequence[int] = (32, 64, 128)
    feature_channels: Sequence[int] = (48, 80, 224, 640)

    @nn.compact
    def __call__(self, x):
        """x: (B, H, W, 3) preprocessed. Returns (B, H, W, 1) mask."""
        feats = EfficientEncoderB7(name="encoder")(x)
        rfb = self.rfb_channels
        x3 = RFBBlock(rfb[0], name="rfb2")(feats[1])
        x4 = RFBBlock(rfb[1], name="rfb3")(feats[2])
        x5 = RFBBlock(rfb[2], name="rfb4")(feats[3])
        D0 = Aggregation(rfb, name="agg")(x5, x4, x3)

        def up(x, f):
            B, H, W, C = x.shape
            return jax.image.resize(x, (B, H * f, W * f, C), "bilinear")

        ds0 = up(D0, 8)
        D1 = ObjectAttention(self.feature_channels[1],
                             name="ObjectAttention2")(D0, feats[1])
        ds1 = up(D1, 8)
        D2 = ObjectAttention(self.feature_channels[0],
                             name="ObjectAttention1")(up(D1, 2), feats[0])
        ds2 = up(D2, 4)
        return jax.nn.sigmoid((ds0 + ds1 + ds2) / 3.0)


def tracer_segment(apply_fn, params, images, input_size=640, erosion=1):
    """Full segmentation with preprocessing + failure detection
    (tracer_b7.py:57-74). images: (N, H, W, 3) in [0, 1]."""
    n, h, w = images.shape[:3]
    x = resize_bilinear(images, (input_size, input_size), antialias=False)
    x = (x - jnp.asarray(_IMAGENET_MEAN)) / jnp.asarray(_IMAGENET_STD)
    mask = apply_fn(params, x)
    # erosion = -maxpool(-x)
    k = erosion * 2 + 1
    mask = -jax.lax.reduce_window(
        -mask[..., 0], -jnp.inf, jax.lax.max, (1, k, k), (1, 1, 1),
        [(0, 0), (erosion, erosion), (erosion, erosion)])
    mask = resize_bilinear(mask[..., None], (h, w), antialias=False)
    # failure rule: if the whole mask > 0.2, zero out everything < 0.8
    failure = jnp.all(mask.reshape(n, -1) > 0.2, axis=1)
    mask = jnp.where(failure[:, None, None, None] & (mask < 0.8), 0.0, mask)
    return jnp.clip(mask, 0.0, 1.0)


# ---------------------------------------------------------------------------
# torch checkpoint conversion (ref Carve/tracer_b7; TRACER class layout from
# lib/models/architecture/tracerb7/{tracer,att_modules,conv_modules,
# efficientnet}.py)
# ---------------------------------------------------------------------------

_BN_MAP = {"weight": "scale", "bias": "bias",
           "running_mean": "mean", "running_var": "var"}


def _put(tree, path, value):
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = value


def _conv_w(v):
    import numpy as np
    return np.asarray(v).transpose(2, 3, 1, 0)  # OIHW -> HWIO (depthwise
    # torch (C,1,kh,kw) lands as (kh,kw,1,C), flax grouped-conv layout)


def convert_tracer(sd):
    """Reference TRACER-B7 state_dict -> flax variables for TracerDecoder.

    Returns ({"params": tree}, unmatched_keys). BN statistics become plain
    params of the inference `BN` module.
    """
    import re
    import numpy as np

    params = {}
    unmatched = []
    for k, v in sd.items():
        for pre in ("module.", "model."):
            if k.startswith(pre):
                k = k[len(pre):]
        v = np.asarray(v)
        # ---- encoder (EfficientNet-B7) --------------------------------
        if k.startswith("encoder."):
            ek = k[len("encoder."):]
            if ek in ("_conv_head.weight", "_bn1.weight", "_bn1.bias",
                      "_bn1.running_mean", "_bn1.running_var",
                      "_fc.weight", "_fc.bias") and "_blocks" not in ek:
                continue  # classifier head: unused by TRACER features
            m = re.match(r"_conv_stem\.weight$", ek)
            if m:
                _put(params, ("encoder", "stem_conv", "kernel"), _conv_w(v))
                continue
            m = re.match(r"_bn0\.(\w+)$", ek)
            if m and m.group(1) in _BN_MAP:
                _put(params, ("encoder", "stem_bn", _BN_MAP[m.group(1)]), v)
                continue
            m = re.match(
                r"_blocks\.(\d+)\._(expand_conv|depthwise_conv|"
                r"project_conv)\.weight$", ek)
            if m:
                _put(params, ("encoder", f"blocks_{m.group(1)}",
                              m.group(2), "kernel"), _conv_w(v))
                continue
            m = re.match(r"_blocks\.(\d+)\._se_(reduce|expand)\."
                         r"(weight|bias)$", ek)
            if m:
                name = f"se_{m.group(2)}"
                leaf = "kernel" if m.group(3) == "weight" else "bias"
                _put(params, ("encoder", f"blocks_{m.group(1)}", name,
                              leaf), _conv_w(v) if leaf == "kernel" else v)
                continue
            m = re.match(r"_blocks\.(\d+)\._bn([012])\.(\w+)$", ek)
            if m and m.group(3) in _BN_MAP:
                _put(params, ("encoder", f"blocks_{m.group(1)}",
                              f"bn{m.group(2)}", _BN_MAP[m.group(3)]), v)
                continue
            if ek.endswith("num_batches_tracked"):
                continue
            unmatched.append(k)
            continue
        # ---- decoder ---------------------------------------------------
        if k.endswith("num_batches_tracked"):
            continue
        dk = k
        # Sequential indices fold into flax names: branch1.2 -> branch1_2,
        # DWConv1.0 -> DWConv1_0, UAM.norm.0 -> UAM.norm_bn
        dk = re.sub(r"\.norm\.0\.", ".norm_bn.", dk)
        dk = re.sub(r"(branch\d)\.(\d)\.", r"\1_\2.", dk)
        dk = re.sub(r"(DWConv\d)\.(\d)\.", r"\1_\2.", dk)
        # DWSConv internals
        dk = dk.replace(".DWSConv.DWConv.", ".DWSConv.depthwise.")
        dk = dk.replace(".DWSConv.PWConv.", ".DWSConv.pointwise.")
        dk = dk.replace(".DWSConv.bn2.", ".DWSConv.__bn2__.")
        dk = dk.replace(".DWSConv.bn.", ".DWSConv.bn1.")
        dk = dk.replace(".DWSConv.__bn2__.", ".DWSConv.bn2.")
        # inner DWConv of DWConvN_M blocks
        dk = re.sub(r"(DWConv\d_\d)\.DWConv\.", r"\1.conv.", dk)
        parts = dk.split(".")
        leaf = parts[-1]
        mod = parts[:-1]
        if leaf == "weight" and v.ndim == 4:
            _put(params, tuple(mod) + ("kernel",), _conv_w(v))
        elif leaf in _BN_MAP and (
                parts[-2].startswith("bn") or parts[-2] == "norm_bn"
                or parts[-2].endswith("bn")) and v.ndim == 1:
            _put(params, tuple(mod[:-1]) + (parts[-2], _BN_MAP[leaf]), v)
        elif leaf == "bias" and v.ndim == 1:
            _put(params, tuple(mod) + ("bias",), v)
        elif leaf == "weight" and v.ndim == 1:
            # 1-d weight on a bn-like module
            _put(params, tuple(mod) + ("scale",), v)
        else:
            unmatched.append(k)
    return {"params": params}, unmatched
