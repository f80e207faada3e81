"""Segment Anything (SAM) — box-prompted mask refinement, flax.

TPU-native rebuild of the reference's external `segment-anything`
dependency (ViT-H, box prompts from the TRACER bbox): loaded at
`lib/apis/adapter3d.py:363-380` and prompted per image at
`lib/pipelines/utils.py:108-131` (`predictor.predict(box=bbox,
multimask_output=True)`, keeping the LAST of the 3 masks).

Components (checkpoint-key aligned with `sam_vit_h_4b8939.pth`):

- **ImageEncoderViT**: patch16 ViT (embed 1280, depth 32, heads 16 for
  vit_h) with 14x14 windowed attention except 4 global blocks
  (global_attn_indexes), decomposed relative position bias, absolute
  pos_embed (64x64), and a conv neck to the 256-ch 64x64 image embedding.
- **PromptEncoder**: random-Fourier positional encoding of the two box
  corners + learned corner-type embeddings (point_embeddings[2]/[3]);
  dense no-mask embedding.
- **MaskDecoder**: two-way transformer (2 layers, 8 heads, mlp 2048) over
  [iou_token, 4 mask_tokens, prompt tokens] x image embedding, transposed-
  conv 4x upscaling, per-token hypernetwork MLPs -> 3 multimask outputs +
  IoU predictions.

All shapes static (1024^2 input, 64^2 tokens) so the whole predict path is
one jitted program per image; everything vmaps over a batch of boxes.
Inference-only. `convert_sam` maps the torch state dict.
"""
from dataclasses import dataclass
from functools import partial
from typing import Tuple

import numpy as np
import jax
import jax.numpy as jnp
from flax import linen as nn

__all__ = ["SAMConfig", "SAM_VIT_H", "SAM_TINY", "SamModel", "convert_sam",
           "sam_preprocess", "sam_predict_box"]

PIXEL_MEAN = np.array([123.675, 116.28, 103.53], np.float32)
PIXEL_STD = np.array([58.395, 57.12, 57.375], np.float32)


@dataclass(frozen=True)
class SAMConfig:
    img_size: int = 1024
    patch_size: int = 16
    embed_dim: int = 1280
    depth: int = 32
    num_heads: int = 16
    global_attn_indexes: Tuple[int, ...] = (7, 15, 23, 31)
    window_size: int = 14
    out_chans: int = 256          # image embedding channels
    decoder_depth: int = 2
    decoder_heads: int = 8
    decoder_mlp_dim: int = 2048
    num_multimask: int = 3

    @property
    def tokens_hw(self):
        return self.img_size // self.patch_size


SAM_VIT_H = SAMConfig()
# tiny config for tests (same topology, toy sizes)
SAM_TINY = SAMConfig(img_size=64, patch_size=8, embed_dim=32, depth=2,
                     num_heads=4, global_attn_indexes=(1,), window_size=4,
                     out_chans=32, decoder_mlp_dim=64)


def _get_rel_pos(q_size, k_size, rel_pos):
    """Relative position table slice (decomposed rel-pos; SAM
    image_encoder.get_rel_pos semantics, static sizes so no interp needed
    when the table matches 2*size-1)."""
    max_rel_dist = 2 * max(q_size, k_size) - 1
    if rel_pos.shape[0] != max_rel_dist:
        rel_pos = jax.image.resize(rel_pos, (max_rel_dist,
                                             rel_pos.shape[1]), "linear")
    q_coords = jnp.arange(q_size)[:, None] * max(k_size / q_size, 1.0)
    k_coords = jnp.arange(k_size)[None, :] * max(q_size / k_size, 1.0)
    rel = (q_coords - k_coords) + (k_size - 1) * max(q_size / k_size, 1.0)
    return rel_pos[rel.astype(jnp.int32)]


def _add_decomposed_rel_pos(attn, q, rel_h, rel_w, q_hw, k_hw):
    qh, qw = q_hw
    kh, kw = k_hw
    Rh = _get_rel_pos(qh, kh, rel_h)    # (qh, kh, dim)
    Rw = _get_rel_pos(qw, kw, rel_w)
    B = q.shape[0]
    r_q = q.reshape(B, qh, qw, -1)
    rel_h_term = jnp.einsum("bhwc,hkc->bhwk", r_q, Rh)
    rel_w_term = jnp.einsum("bhwc,wkc->bhwk", r_q, Rw)
    attn = attn.reshape(B, qh, qw, kh, kw)
    attn = attn + rel_h_term[..., :, None] + rel_w_term[..., None, :]
    return attn.reshape(B, qh * qw, kh * kw)


class _Attention(nn.Module):
    dim: int
    num_heads: int
    use_rel_pos: bool

    @nn.compact
    def __call__(self, x):
        B, H, W, _ = x.shape
        hd = self.dim // self.num_heads
        qkv = nn.Dense(self.dim * 3, name="qkv")(x)
        qkv = qkv.reshape(B, H * W, 3, self.num_heads, hd)
        qkv = qkv.transpose(2, 0, 3, 1, 4).reshape(
            3, B * self.num_heads, H * W, hd)
        q, k, v = qkv[0], qkv[1], qkv[2]
        attn = (q * (hd ** -0.5)) @ k.transpose(0, 2, 1)
        if self.use_rel_pos:
            rel_h = self.param("rel_pos_h", nn.initializers.zeros,
                               (2 * H - 1, hd))
            rel_w = self.param("rel_pos_w", nn.initializers.zeros,
                               (2 * W - 1, hd))
            attn = _add_decomposed_rel_pos(attn, q, rel_h, rel_w,
                                           (H, W), (H, W))
        attn = jax.nn.softmax(attn, axis=-1)
        x = (attn @ v).reshape(B, self.num_heads, H * W, hd)
        x = x.transpose(0, 2, 1, 3).reshape(B, H, W, self.dim)
        return nn.Dense(self.dim, name="proj")(x)


def _window_partition(x, ws):
    B, H, W, C = x.shape
    ph = (ws - H % ws) % ws
    pw = (ws - W % ws) % ws
    x = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)))
    Hp, Wp = H + ph, W + pw
    x = x.reshape(B, Hp // ws, ws, Wp // ws, ws, C)
    wins = x.transpose(0, 1, 3, 2, 4, 5).reshape(-1, ws, ws, C)
    return wins, (Hp, Wp)


def _window_unpartition(wins, ws, pad_hw, hw):
    Hp, Wp = pad_hw
    H, W = hw
    B = wins.shape[0] // (Hp * Wp // ws // ws)
    x = wins.reshape(B, Hp // ws, Wp // ws, ws, ws, -1)
    x = x.transpose(0, 1, 3, 2, 4, 5).reshape(B, Hp, Wp, -1)
    return x[:, :H, :W]


class _Block(nn.Module):
    cfg: SAMConfig
    windowed: bool

    @nn.compact
    def __call__(self, x):
        c = self.cfg
        shortcut = x
        x = nn.LayerNorm(epsilon=1e-6, name="norm1")(x)
        hw = x.shape[1:3]
        if self.windowed:
            x, pad_hw = _window_partition(x, c.window_size)
        x = _Attention(c.embed_dim, c.num_heads, True, name="attn")(x)
        if self.windowed:
            x = _window_unpartition(x, c.window_size, pad_hw, hw)
        x = shortcut + x
        y = nn.LayerNorm(epsilon=1e-6, name="norm2")(x)
        y = nn.Dense(c.embed_dim * 4, name="mlp_lin1")(y)
        y = nn.gelu(y, approximate=False)
        y = nn.Dense(c.embed_dim, name="mlp_lin2")(y)
        return x + y


class _LayerNorm2d(nn.Module):
    """channels_last LayerNorm over C only (SAM's LayerNorm2d)."""
    dim: int

    @nn.compact
    def __call__(self, x):
        w = self.param("weight", nn.initializers.ones, (self.dim,))
        b = self.param("bias", nn.initializers.zeros, (self.dim,))
        mu = jnp.mean(x, axis=-1, keepdims=True)
        var = jnp.mean((x - mu) ** 2, axis=-1, keepdims=True)
        return (x - mu) / jnp.sqrt(var + 1e-6) * w + b


class ImageEncoderViT(nn.Module):
    cfg: SAMConfig

    @nn.compact
    def __call__(self, x):
        c = self.cfg
        x = nn.Conv(c.embed_dim, (c.patch_size, c.patch_size),
                    strides=(c.patch_size, c.patch_size), padding="VALID",
                    name="patch_embed")(x)
        t = c.tokens_hw
        pos = self.param("pos_embed", nn.initializers.zeros,
                         (1, t, t, c.embed_dim))
        x = x + pos
        for i in range(c.depth):
            x = _Block(c, windowed=i not in c.global_attn_indexes,
                       name=f"block_{i}")(x)
        x = nn.Conv(c.out_chans, (1, 1), use_bias=False, name="neck_conv1")(x)
        x = _LayerNorm2d(c.out_chans, name="neck_ln1")(x)
        x = nn.Conv(c.out_chans, (3, 3), padding="SAME", use_bias=False,
                    name="neck_conv2")(x)
        x = _LayerNorm2d(c.out_chans, name="neck_ln2")(x)
        return x                                     # (B, t, t, 256)


class PromptEncoder(nn.Module):
    """Box corners -> 2 sparse tokens; dense no-mask embedding."""
    cfg: SAMConfig

    def setup(self):
        c = self.cfg
        self.pe_gaussian = self.param(
            "pe_gaussian", nn.initializers.normal(1.0), (2, c.out_chans // 2))
        # corner-type embeddings: index 2 = top-left, 3 = bottom-right
        # (SAM point_embeddings; 0/1 are neg/pos click types, unused here)
        self.point_embeddings = self.param(
            "point_embeddings", nn.initializers.normal(1.0),
            (4, c.out_chans))
        self.no_mask_embed = self.param(
            "no_mask_embed", nn.initializers.normal(1.0), (c.out_chans,))

    def _pe(self, coords):
        """coords in [0,1]^2 -> random-Fourier features (SAM
        PositionEmbeddingRandom)."""
        coords = 2.0 * coords - 1.0
        proj = (2.0 * np.pi) * (coords @ self.pe_gaussian)
        return jnp.concatenate([jnp.sin(proj), jnp.cos(proj)], axis=-1)

    def encode_box(self, box):
        """box (4,) = (x1, y1, x2, y2) in model-input pixels -> (2, C)."""
        c = self.cfg
        pts = jnp.stack([box[:2], box[2:]]).reshape(2, 2)
        pts = (pts + 0.5) / c.img_size
        emb = self._pe(pts)
        emb = emb.at[0].add(self.point_embeddings[2])
        emb = emb.at[1].add(self.point_embeddings[3])
        return emb

    def dense_pe(self):
        """Positional encoding of the 64x64 embedding grid."""
        t = self.cfg.tokens_hw
        g = (jnp.stack(jnp.meshgrid(jnp.arange(t), jnp.arange(t),
                                    indexing="ij"), -1) + 0.5) / t
        return self._pe(g[..., ::-1])   # (t, t, C); xy order like SAM

    def __call__(self, box):
        return self.encode_box(box), self.no_mask_embed, self.dense_pe()


class _DecoderAttention(nn.Module):
    dim: int
    heads: int
    downsample: int = 1

    @nn.compact
    def __call__(self, q, k, v):
        d = self.dim // self.downsample
        hd = d // self.heads
        q = nn.Dense(d, name="q_proj")(q)
        k = nn.Dense(d, name="k_proj")(k)
        v = nn.Dense(d, name="v_proj")(v)

        def split(x):
            return x.reshape(*x.shape[:-1], self.heads, hd).swapaxes(-3, -2)

        qh, kh, vh = split(q), split(k), split(v)
        a = jax.nn.softmax(qh @ kh.swapaxes(-1, -2) * hd ** -0.5, -1)
        o = (a @ vh).swapaxes(-3, -2).reshape(*q.shape[:-1], d)
        return nn.Dense(self.dim, name="out_proj")(o)


class _TwoWayBlock(nn.Module):
    cfg: SAMConfig
    skip_first_pe: bool

    @nn.compact
    def __call__(self, queries, keys, query_pe, key_pe):
        c = self.cfg
        d, h = c.out_chans, c.decoder_heads
        if self.skip_first_pe:
            # SAM's first layer REPLACES queries (no residual,
            # TwoWayAttentionBlock.forward)
            queries = _DecoderAttention(d, h, name="self_attn")(
                queries, queries, queries)
        else:
            qp = queries + query_pe
            q = _DecoderAttention(d, h, name="self_attn")(qp, qp, queries)
            queries = queries + q
        queries = nn.LayerNorm(name="norm1")(queries)
        qp, kp = queries + query_pe, keys + key_pe
        q = _DecoderAttention(d, h, 2, name="cross_attn_t2i")(qp, kp, keys)
        queries = nn.LayerNorm(name="norm2")(queries + q)
        y = nn.Dense(c.decoder_mlp_dim, name="mlp_lin1")(queries)
        y = nn.Dense(d, name="mlp_lin2")(nn.relu(y))
        queries = nn.LayerNorm(name="norm3")(queries + y)
        qp, kp = queries + query_pe, keys + key_pe
        k = _DecoderAttention(d, h, 2, name="cross_attn_i2t")(kp, qp,
                                                              queries)
        keys = nn.LayerNorm(name="norm4")(keys + k)
        return queries, keys


class MaskDecoder(nn.Module):
    cfg: SAMConfig

    @nn.compact
    def __call__(self, img_emb, img_pe, sparse_tokens, dense_emb):
        """img_emb (t,t,C), img_pe (t,t,C), sparse_tokens (S,C),
        dense_emb (C,) -> (masks (3, 4t, 4t), iou (3,))."""
        c = self.cfg
        d = c.out_chans
        t = img_emb.shape[0]
        iou_token = self.param("iou_token", nn.initializers.normal(1.0),
                               (1, d))
        mask_tokens = self.param("mask_tokens",
                                 nn.initializers.normal(1.0),
                                 (c.num_multimask + 1, d))
        tokens = jnp.concatenate([iou_token, mask_tokens, sparse_tokens], 0)

        keys = (img_emb + dense_emb).reshape(t * t, d)
        key_pe = img_pe.reshape(t * t, d)
        queries = tokens
        for i in range(c.decoder_depth):
            queries, keys = _TwoWayBlock(c, skip_first_pe=(i == 0),
                                         name=f"layer_{i}")(
                queries, keys, tokens, key_pe)
        qp, kp = queries + tokens, keys + key_pe
        q = _DecoderAttention(d, c.decoder_heads, 2,
                              name="final_attn_t2i")(qp, kp, keys)
        queries = nn.LayerNorm(name="norm_final")(queries + q)

        iou_out = queries[0]
        mask_out = queries[1:1 + c.num_multimask + 1]

        src = keys.reshape(t, t, d)
        src = nn.ConvTranspose(d // 4, (2, 2), strides=(2, 2),
                               name="upscale_conv1")(src)
        src = _LayerNorm2d(d // 4, name="upscale_ln")(src)
        src = nn.gelu(src, approximate=False)
        src = nn.ConvTranspose(d // 8, (2, 2), strides=(2, 2),
                               name="upscale_conv2")(src)
        src = nn.gelu(src, approximate=False)      # (4t, 4t, d/8)

        hyper = []
        for i in range(c.num_multimask + 1):
            h = mask_out[i]
            for j, dim in enumerate((d, d, d // 8)):
                h = nn.Dense(dim, name=f"hyper_{i}_lin{j}")(h)
                if j < 2:
                    h = nn.relu(h)
            hyper.append(h)
        hyper = jnp.stack(hyper)                    # (4, d/8)
        masks = jnp.einsum("nc,hwc->nhw", hyper, src)

        h = iou_out
        for j, dim in enumerate((d, d, c.num_multimask + 1)):
            h = nn.Dense(dim, name=f"iou_lin{j}")(h)
            if j < 2:
                h = nn.relu(h)
        # multimask outputs = tokens 1..3 (token 0 is the single-mask
        # output; predict(multimask_output=True) returns 1..3)
        return masks[1:], h[1:]


class SamModel(nn.Module):
    cfg: SAMConfig

    def setup(self):
        self.image_encoder = ImageEncoderViT(self.cfg)
        self.prompt_encoder = PromptEncoder(self.cfg)
        self.mask_decoder = MaskDecoder(self.cfg)

    def encode_image(self, x):
        return self.image_encoder(x)

    def decode_box(self, img_emb, box):
        sparse, no_mask, dense_pe = self.prompt_encoder(box)
        return self.mask_decoder(img_emb, dense_pe, sparse, no_mask)

    def __call__(self, x, box):
        emb = self.encode_image(x)
        return self.decode_box(emb[0], box)


def sam_preprocess(image, cfg: SAMConfig = SAM_VIT_H):
    """(H, W, 3) float [0,1] -> (1, S, S, 3) normalized, plus the scale
    info for unpadding (resize longest side to img_size, pad bottom/right
    — SamPredictor.set_image semantics)."""
    H, W = image.shape[:2]
    S = cfg.img_size
    scale = S / max(H, W)
    nh, nw = int(round(H * scale)), int(round(W * scale))
    x = jax.image.resize(jnp.asarray(image, jnp.float32) * 255.0,
                         (nh, nw, 3), "bilinear")
    x = (x - PIXEL_MEAN) / PIXEL_STD
    x = jnp.pad(x, ((0, S - nh), (0, S - nw), (0, 0)))
    return x[None], (nh, nw, H, W, scale)


@partial(jax.jit, static_argnames=("model",))
def _predict_jit(model, params, x, box):
    return model.apply({"params": params}, x, box)


def sam_predict_box(model, params, image, box_xyxy, cfg=None):
    """Reference predict path (`pipelines/utils.py:118-127`): box prompt,
    multimask_output=True, keep the LAST mask. image (H, W, 3) in [0,1],
    box in image pixels. Returns (H, W) float binary mask."""
    cfg = cfg or model.cfg
    x, (nh, nw, H, W, scale) = sam_preprocess(image, cfg)
    box = jnp.asarray(box_xyxy, jnp.float32) * scale
    masks, iou = _predict_jit(model, params, x, box)
    m = masks[-1]                                  # last multimask output
    t4 = m.shape[-1]
    m = jax.image.resize(m, (cfg.img_size, cfg.img_size), "bilinear") \
        if t4 != cfg.img_size else m
    m = m[:nh, :nw]
    m = jax.image.resize(m, (H, W), "bilinear")
    return (m > 0.0).astype(jnp.float32)


# --------------------------------------------------------------------------
# torch checkpoint conversion (sam_vit_h_4b8939.pth state dict)
# --------------------------------------------------------------------------

def convert_sam(sd, cfg: SAMConfig = SAM_VIT_H):
    """Map the torch SAM state dict -> (flax params, unmatched keys)."""
    import numpy as np  # noqa
    used = set()

    def t(x):
        return np.asarray(x)

    _orig = sd
    _orig_keys = list(_orig.keys()) if hasattr(_orig, "keys") else []

    class _SD:
        def __getitem__(self, k):
            used.add(k)
            return _orig[k]
    sd = _SD()  # route lookups through the usage tracker

    def lin(prefix):
        return {"kernel": t(sd[prefix + ".weight"]).T,
                "bias": t(sd[prefix + ".bias"])}

    def conv(prefix, bias=True):
        out = {"kernel": t(sd[prefix + ".weight"]).transpose(2, 3, 1, 0)}
        if bias:
            out["bias"] = t(sd[prefix + ".bias"])
        return out

    def ln(prefix):
        return {"scale": t(sd[prefix + ".weight"]),
                "bias": t(sd[prefix + ".bias"])}

    def ln2d(prefix):
        return {"weight": t(sd[prefix + ".weight"]),
                "bias": t(sd[prefix + ".bias"])}

    enc = {"patch_embed": conv("image_encoder.patch_embed.proj"),
           "pos_embed": t(sd["image_encoder.pos_embed"]),
           "neck_conv1": conv("image_encoder.neck.0", bias=False),
           "neck_ln1": ln2d("image_encoder.neck.1"),
           "neck_conv2": conv("image_encoder.neck.2", bias=False),
           "neck_ln2": ln2d("image_encoder.neck.3")}
    for i in range(cfg.depth):
        p = f"image_encoder.blocks.{i}"
        enc[f"block_{i}"] = {
            "norm1": ln(p + ".norm1"), "norm2": ln(p + ".norm2"),
            "attn": {"qkv": lin(p + ".attn.qkv"),
                     "proj": lin(p + ".attn.proj"),
                     "rel_pos_h": t(sd[p + ".attn.rel_pos_h"]),
                     "rel_pos_w": t(sd[p + ".attn.rel_pos_w"])},
            "mlp_lin1": lin(p + ".mlp.lin1"),
            "mlp_lin2": lin(p + ".mlp.lin2")}

    pe = {"pe_gaussian":
          t(sd["prompt_encoder.pe_layer.positional_encoding_gaussian_matrix"]),
          "point_embeddings": np.stack(
              [t(sd[f"prompt_encoder.point_embeddings.{i}.weight"])[0]
               for i in range(4)]),
          "no_mask_embed": t(sd["prompt_encoder.no_mask_embed.weight"])[0]}

    def dec_attn(prefix):
        return {n + "_proj": lin(f"{prefix}.{n}_proj")
                for n in ("q", "k", "v", "out")}

    dec = {"iou_token": t(sd["mask_decoder.iou_token.weight"]),
           "mask_tokens": t(sd["mask_decoder.mask_tokens.weight"]),
           "upscale_conv1": _convT(sd, "mask_decoder.output_upscaling.0"),
           "upscale_ln": ln2d("mask_decoder.output_upscaling.1"),
           "upscale_conv2": _convT(sd, "mask_decoder.output_upscaling.3"),
           "norm_final": ln("mask_decoder.transformer.norm_final_attn"),
           "final_attn_t2i": dec_attn(
               "mask_decoder.transformer.final_attn_token_to_image")}
    for i in range(cfg.decoder_depth):
        p = f"mask_decoder.transformer.layers.{i}"
        dec[f"layer_{i}"] = {
            "self_attn": dec_attn(p + ".self_attn"),
            "cross_attn_t2i": dec_attn(
                p + ".cross_attn_token_to_image"),
            "cross_attn_i2t": dec_attn(
                p + ".cross_attn_image_to_token"),
            "norm1": ln(p + ".norm1"), "norm2": ln(p + ".norm2"),
            "norm3": ln(p + ".norm3"), "norm4": ln(p + ".norm4"),
            "mlp_lin1": lin(p + ".mlp.lin1"),
            "mlp_lin2": lin(p + ".mlp.lin2")}
    for i in range(cfg.num_multimask + 1):
        for j in range(3):
            dec[f"hyper_{i}_lin{j}"] = lin(
                f"mask_decoder.output_hypernetworks_mlps.{i}.layers.{j}")
    for j in range(3):
        dec[f"iou_lin{j}"] = lin(
            f"mask_decoder.iou_prediction_head.layers.{j}")

    tree = {"image_encoder": enc, "prompt_encoder": pe,
            "mask_decoder": dec}
    unmatched = [k for k in _orig_keys if k not in used]
    return tree, unmatched


def _convT(sd, prefix):
    import numpy as np
    # torch ConvTranspose2d weight (in, out, kh, kw) -> flax (kh, kw, in, out)
    return {"kernel": np.asarray(sd[prefix + ".weight"]).transpose(2, 3, 0, 1),
            "bias": np.asarray(sd[prefix + ".bias"])}
