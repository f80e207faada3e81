"""DPT-hybrid monocular normal predictor (Omnidata), flax.

Rebuilds the reference's vendored Omnidata stack
(`omnidata_modules/midas/dpt_depth.py:87`, vit.py, blocks.py — the
`vitb_rn50_384` hybrid): timm ResNetV2 stem+stages(3,4,9) -> ViT-B/16 over
the /16 feature map (ResNet stage 0/1 maps tapped as skip features) ->
project-readout reassemble -> RefineNet-style fusion -> 3-channel ReLU
head, used as the surface-normal conditioner (`adapter3d.py:338-361`
load_normal_model; consumed at `mvedit_3d_pipeline.py:248 enable_normals`).

Checkpoint-key aligned with the `omnidata_dpt_normal_v2.ckpt` torch state
dict (timm `vit_base_resnet50_384` naming under `pretrained.model.`,
reassemble under `pretrained.act_postprocess{3,4}.`, fusion under
`scratch.`): `convert_dpt` below maps every tensor. Numerical-parity
details honored: StdConv weight standardization (eps 1e-6), timm 'same'
asymmetric padding on the stem/strided convs, GroupNorm(32, eps 1e-5),
project readout (concat cls -> Linear -> GELU), align_corners=True
bilinear upsampling in fusion and head, ReLU (non_negative) output head.

Inference-only.
"""
from typing import Optional, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp
from flax import linen as nn

__all__ = ["DPTNormalModel", "convert_dpt"]


def _same_pad(x, k, s):
    """timm 'same' padding (extra on bottom/right) for NHWC conv/pool."""
    pads = [(0, 0)]
    for dim in (1, 2):
        size = x.shape[dim]
        out = -(-size // s)
        total = max((out - 1) * s + k - size, 0)
        pads.append((total // 2, total - total // 2))
    pads.append((0, 0))
    return pads


def _resize_ac(x, h2, w2):
    """Bilinear resize with align_corners=True (separable gathers; exact
    counterpart of `F.interpolate(..., align_corners=True)`)."""
    B, H, W, C = x.shape

    def axis_interp(x, size, new, axis):
        if new == size:
            return x
        if size == 1:
            reps = [1] * x.ndim
            reps[axis] = new
            return jnp.tile(x, reps)
        coords = np.linspace(0.0, size - 1.0, new)
        i0 = np.floor(coords).astype(np.int32)
        i1 = np.minimum(i0 + 1, size - 1)
        w1 = (coords - i0).astype(np.float32)
        shape = [1] * x.ndim
        shape[axis] = new
        w1 = jnp.asarray(w1).reshape(shape)
        x0 = jnp.take(x, jnp.asarray(i0), axis=axis)
        x1 = jnp.take(x, jnp.asarray(i1), axis=axis)
        return x0 * (1.0 - w1) + x1 * w1

    x = axis_interp(x, H, h2, 1)
    return axis_interp(x, W, w2, 2)


class StdConvSame(nn.Module):
    """timm StdConv2dSame: weight-standardized conv (eps 1e-6), 'same'
    asymmetric padding."""
    features: int
    kernel: int
    strides: int = 1

    @nn.compact
    def __call__(self, x):
        k = self.param("kernel", nn.initializers.lecun_normal(),
                       (self.kernel, self.kernel, x.shape[-1],
                        self.features))
        mu = jnp.mean(k, axis=(0, 1, 2), keepdims=True)
        var = jnp.var(k, axis=(0, 1, 2), keepdims=True)
        k = (k - mu) * jax.lax.rsqrt(var + 1e-6)
        return jax.lax.conv_general_dilated(
            x, k, (self.strides, self.strides),
            _same_pad(x, self.kernel, self.strides)[1:3],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))


class GN(nn.Module):
    """GroupNorm(32) + optional ReLU (timm GroupNormAct, eps 1e-5)."""
    act: bool = True

    @nn.compact
    def __call__(self, x):
        x = nn.GroupNorm(32, epsilon=1e-5, name="gn")(x)
        return jax.nn.relu(x) if self.act else x


class BottleneckV2(nn.Module):
    """timm ResNetV2 (non-preact) Bottleneck: conv->norm(relu) x2 ->
    conv->norm, relu(residual + shortcut). Shortcut = conv1x1+norm on the
    RAW input when shape changes."""
    mid: int
    stride: int = 1

    @nn.compact
    def __call__(self, x):
        out_c = self.mid * 4
        if x.shape[-1] != out_c or self.stride != 1:
            sc = StdConvSame(out_c, 1, self.stride,
                             name="downsample_conv")(x)
            sc = GN(act=False, name="downsample_norm")(sc)
        else:
            sc = x
        h = GN(name="norm1")(StdConvSame(self.mid, 1, name="conv1")(x))
        h = GN(name="norm2")(
            StdConvSame(self.mid, 3, self.stride, name="conv2")(h))
        h = GN(act=False, name="norm3")(
            StdConvSame(out_c, 1, name="conv3")(h))
        return jax.nn.relu(h + sc)


class ResNetV2Stages(nn.Module):
    """timm ResNetV2 stem + stages (3, 4, 9) of vitb_rn50_384:
    /4 256ch, /8 512ch, /16 1024ch (DPT-hybrid taps the first two and
    feeds the third to the ViT)."""
    layers: tuple = (3, 4, 9)

    @nn.compact
    def __call__(self, x):
        h = StdConvSame(64, 7, 2, name="stem_conv")(x)
        h = GN(name="stem_norm")(h)
        pads = _same_pad(h, 3, 2)
        h = jnp.pad(h, pads, constant_values=-jnp.inf)
        h = jax.lax.reduce_window(h, -jnp.inf, jax.lax.max, (1, 3, 3, 1),
                                  (1, 2, 2, 1), "VALID")
        feats = []
        for si, (n, mid) in enumerate(zip(self.layers, (64, 128, 256))):
            for i in range(n):
                h = BottleneckV2(
                    mid, 2 if (i == 0 and si > 0) else 1,
                    name=f"stage{si}_{i}")(h)
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
        h = jax.nn.gelu(h, approximate=False)
        return x + nn.Dense(self.dim, name="fc2")(h)


class ResidualConvUnit(nn.Module):
    """blocks.py:231 ResidualConvUnit_custom (bn=False)."""
    ch: int

    @nn.compact
    def __call__(self, x):
        h = jax.nn.relu(x)
        h = nn.Conv(self.ch, (3, 3), padding=1, name="conv1")(h)
        h = jax.nn.relu(h)
        h = nn.Conv(self.ch, (3, 3), padding=1, name="conv2")(h)
        return x + h


class FeatureFusion(nn.Module):
    """blocks.py:291 FeatureFusionBlock_custom (deconv=False, bn=False,
    align_corners=True)."""
    ch: int

    @nn.compact
    def __call__(self, x, skip=None):
        if skip is not None:
            x = x + ResidualConvUnit(self.ch, name="rcu1")(skip)
        x = ResidualConvUnit(self.ch, name="rcu2")(x)
        B, H, W, C = x.shape
        x = _resize_ac(x, H * 2, W * 2)
        return nn.Conv(self.ch, (1, 1), name="out_conv")(x)


class DPTNormalModel(nn.Module):
    """Input (B, H, W, 3) raw [0,1] images (the reference applies no
    mean/std normalization, `mvedit_3d_pipeline.py:266-270`), H,W
    multiples of 32 (ref uses 384). Output (B, H, W, 3) opencv-space
    normals in [0, inf) — ReLU head (DPTDepthModel non_negative); callers
    clamp to [0,1] as the reference does.
    """
    vit_dim: int = 768
    vit_layers: int = 12
    features: int = 256
    readout_taps: Sequence[int] = (8, 11)  # ViT layers tapped (hybrid)
    resnet_layers: tuple = (3, 4, 9)       # vitb_rn50_384 stage depths
    pos_grid: Optional[Tuple[int, int]] = (24, 24)  # ckpt pos-embed grid

    @nn.compact
    def __call__(self, x):
        B, H, W, _ = x.shape
        f1, f2, f3 = ResNetV2Stages(self.resnet_layers, name="backbone")(x)
        hp, wp = f3.shape[1], f3.shape[2]
        tokens = nn.Conv(self.vit_dim, (1, 1), name="patch_embed")(f3)
        tokens = tokens.reshape(B, hp * wp, self.vit_dim)
        cls = self.param("cls_token", nn.initializers.zeros,
                         (1, 1, self.vit_dim))
        pg = self.pos_grid or (hp, wp)
        pos = self.param("pos_embed", nn.initializers.zeros,
                         (1, pg[0] * pg[1] + 1, self.vit_dim))
        if (hp, wp) != pg:
            # vit.py::_resize_pos_embed — bilinear over the token grid
            grid = pos[:, 1:].reshape(1, pg[0], pg[1], self.vit_dim)
            grid = jax.image.resize(grid, (1, hp, wp, self.vit_dim),
                                    "bilinear")
            pos = jnp.concatenate(
                [pos[:, :1], grid.reshape(1, hp * wp, self.vit_dim)], 1)
        t = jnp.concatenate(
            [jnp.broadcast_to(cls, (B, 1, self.vit_dim)), tokens], 1) + pos
        taps = []
        for i in range(self.vit_layers):
            t = ViTBlock(self.vit_dim, name=f"vit_{i}")(t)
            if i in self.readout_taps:
                taps.append(t)

        def project_readout(tk, name):
            # vit.py:36 ProjectReadout: concat cls, Linear(2D->D), GELU
            cls_t = jnp.broadcast_to(tk[:, :1], tk[:, 1:].shape)
            h = jnp.concatenate([tk[:, 1:], cls_t], -1)
            h = nn.Dense(self.vit_dim, name=name)(h)
            h = jax.nn.gelu(h, approximate=False)
            return h.reshape(B, hp, wp, self.vit_dim)

        # Reassemble (vit.py:423-462): layer1=f1, layer2=f2 (identity),
        # layer3 = readout+1x1 conv, layer4 = readout+1x1+3x3/2
        l3 = nn.Conv(self.vit_dim, (1, 1), name="postproc3")(
            project_readout(taps[0], "readout3"))
        l4 = nn.Conv(self.vit_dim, (1, 1), name="postproc4a")(
            project_readout(taps[1], "readout4"))
        l4 = nn.Conv(self.vit_dim, (3, 3), strides=(2, 2), padding=1,
                     name="postproc4b")(l4)

        # scratch.layerN_rn (blocks.py:49): 3x3 no-bias projections
        rn = dict(use_bias=False, padding=1)
        l1 = nn.Conv(self.features, (3, 3), name="layer1_rn", **rn)(f1)
        l2 = nn.Conv(self.features, (3, 3), name="layer2_rn", **rn)(f2)
        l3 = nn.Conv(self.features, (3, 3), name="layer3_rn", **rn)(l3)
        l4 = nn.Conv(self.features, (3, 3), name="layer4_rn", **rn)(l4)

        h = FeatureFusion(self.features, name="fusion4")(l4)
        h = FeatureFusion(self.features, name="fusion3")(h, l3)
        h = FeatureFusion(self.features, name="fusion2")(h, l2)
        h = FeatureFusion(self.features, name="fusion1")(h, l1)
        # head (dpt_depth.py:91): conv -> 2x up -> conv -> relu -> 1x1
        h = nn.Conv(self.features // 2, (3, 3), padding=1, name="head1")(h)
        h = _resize_ac(h, h.shape[1] * 2, h.shape[2] * 2)
        h = jax.nn.relu(nn.Conv(32, (3, 3), padding=1, name="head2")(h))
        return jax.nn.relu(nn.Conv(3, (1, 1), name="head3")(h))


# ---------------------------------------------------------------------------
# torch checkpoint -> flax params


def _t(v):
    return np.asarray(v, np.float32)


def convert_dpt(sd):
    """Map an `omnidata_dpt_normal_v2.ckpt`-style torch state dict onto
    DPTNormalModel's param tree. Accepts raw state dicts or ones whose keys
    carry the lightning `model.` prefix (adapter3d.py:344-349 strips it).

    Returns (params_tree, unmatched_keys)."""
    if any(k.startswith("model.pretrained") for k in sd):
        sd = {k[6:]: v for k, v in sd.items() if k.startswith("model.")}
    tree = {}
    unmatched = []

    def put(path, value):
        node = tree
        parts = path.split("/")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = value

    def conv_k(v):
        return _t(v).transpose(2, 3, 1, 0)  # OIHW -> HWIO

    def dense_k(v):
        return _t(v).T

    for k, v in sd.items():
        parts = k.split(".")
        if k.startswith("pretrained.model.patch_embed.backbone."):
            rest = parts[4:]
            if rest[0] == "stem":
                if rest[1] == "conv":
                    put("backbone/stem_conv/kernel", conv_k(v))
                else:  # norm
                    put("backbone/stem_norm/gn/"
                        + ("scale" if rest[2] == "weight" else "bias"),
                        _t(v))
            elif rest[0] == "stages":
                s, i = rest[1], rest[3]
                blk = f"backbone/stage{s}_{i}"
                leaf = rest[4]
                if leaf.startswith("conv"):
                    put(f"{blk}/{leaf}/kernel", conv_k(v))
                elif leaf.startswith("norm"):
                    put(f"{blk}/{leaf}/gn/"
                        + ("scale" if rest[5] == "weight" else "bias"),
                        _t(v))
                elif leaf == "downsample":
                    if rest[5] == "conv":
                        put(f"{blk}/downsample_conv/kernel", conv_k(v))
                    else:
                        put(f"{blk}/downsample_norm/gn/"
                            + ("scale" if rest[6] == "weight" else "bias"),
                            _t(v))
                else:
                    unmatched.append(k)
            else:
                unmatched.append(k)
        elif k == "pretrained.model.cls_token":
            put("cls_token", _t(v))
        elif k == "pretrained.model.pos_embed":
            put("pos_embed", _t(v))
        elif k.startswith("pretrained.model.patch_embed.proj."):
            put("patch_embed/"
                + ("kernel" if parts[-1] == "weight" else "bias"),
                conv_k(v) if parts[-1] == "weight" else _t(v))
        elif k.startswith("pretrained.model.blocks."):
            i = parts[3]
            leaf = parts[4]
            wb = parts[-1]
            if leaf in ("norm1", "norm2"):
                put(f"vit_{i}/{leaf}/"
                    + ("scale" if wb == "weight" else "bias"), _t(v))
            elif leaf == "attn":
                name = {"qkv": "qkv", "proj": "proj"}[parts[5]]
                put(f"vit_{i}/{name}/"
                    + ("kernel" if wb == "weight" else "bias"),
                    dense_k(v) if wb == "weight" else _t(v))
            elif leaf == "mlp":
                put(f"vit_{i}/{parts[5]}/"
                    + ("kernel" if wb == "weight" else "bias"),
                    dense_k(v) if wb == "weight" else _t(v))
            else:
                unmatched.append(k)
        elif k.startswith("pretrained.act_postprocess"):
            n = parts[1][-1]
            idx = parts[2]
            wb = parts[-1]
            if idx == "0":  # readout project Linear
                put(f"readout{n}/"
                    + ("kernel" if wb == "weight" else "bias"),
                    dense_k(v) if wb == "weight" else _t(v))
            elif (n, idx) in (("3", "3"), ("4", "3"), ("4", "4")):
                name = {("3", "3"): "postproc3", ("4", "3"): "postproc4a",
                        ("4", "4"): "postproc4b"}[(n, idx)]
                put(f"{name}/" + ("kernel" if wb == "weight" else "bias"),
                    conv_k(v) if wb == "weight" else _t(v))
            else:
                unmatched.append(k)
        elif k.startswith("scratch.layer"):
            put(f"{parts[1]}/kernel", conv_k(v))
        elif k.startswith("scratch.refinenet"):
            n = parts[1][-1]
            if parts[2] == "out_conv":
                put(f"fusion{n}/out_conv/"
                    + ("kernel" if parts[-1] == "weight" else "bias"),
                    conv_k(v) if parts[-1] == "weight" else _t(v))
            elif parts[2].startswith("resConfUnit"):
                if n == "4" and parts[2] == "resConfUnit1":
                    continue  # refinenet4 has no skip input (fwd never
                    # calls rcu1); params exist in ckpt but are unused
                rcu = "rcu" + parts[2][-1]
                put(f"fusion{n}/{rcu}/{parts[3]}/"
                    + ("kernel" if parts[-1] == "weight" else "bias"),
                    conv_k(v) if parts[-1] == "weight" else _t(v))
            else:
                unmatched.append(k)
        elif k.startswith("scratch.output_conv."):
            name = {"0": "head1", "2": "head2", "4": "head3"}.get(parts[2])
            if name is None:
                unmatched.append(k)
            else:
                put(f"{name}/"
                    + ("kernel" if parts[-1] == "weight" else "bias"),
                    conv_k(v) if parts[-1] == "weight" else _t(v))
        elif k.startswith("pretrained.model.norm."):
            continue  # final ViT norm: hooks tap pre-norm activations
        else:
            unmatched.append(k)
    return {"params": tree}, unmatched
