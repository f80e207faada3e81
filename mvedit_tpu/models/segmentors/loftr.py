"""LoFTR detector-free matcher (flax, checkpoint-key aligned).

Rebuilds the reference's vendored LoFTR (`loftr/loftr.py:12`, backbone/
transformer/matching modules) used for estimating the pose of the user's
input image against generated views
(`lib/core/utils/pose_estimation.py:13-27` loads `indoor_ds_new.ckpt`):

- ResNetFPN_8_2 backbone -> coarse (/8, 256ch) and fine (/2, 128ch) maps
  (`loftr/backbone/resnet_fpn.py:43`);
- sinusoidal 2D positional encoding (interleaved sin/cos channels,
  1-indexed positions, temp_bug_fix variant —
  `loftr/utils/position_encoding.py:6`);
- LoFTR coarse transformer: 4x interleaved self/cross *linear* attention
  (elu+1 kernel trick), cross updates SEQUENTIAL as in the reference
  (`loftr/loftr_module/transformer.py:96-99`: feat1 attends the already
  updated feat0);
- dual-softmax coarse matching (T=0.1) with mutual-max filtering and
  2-cell border removal (`loftr/utils/coarse_matching.py:175-189`);
- fine refinement: 5x5 /2-level windows around the top-K coarse matches,
  coarse-context concat, one self/cross pair at dim 128, then
  correlation -> spatial expectation sub-pixel offset
  (`loftr_module/fine_preprocess.py`, `utils/fine_matching.py`).

TPU-first: static top-K match buffers end to end (the reference's
dynamic `nonzero` selection is replaced by top-K + validity mask); the
host-side solvers in `utils/pose_estimation.py` consume the masked
buffers. `convert_loftr` maps the torch `indoor_ds_new.ckpt` state dict
(kornia/zju3dv naming, optional `matcher.` prefix) onto this tree.
"""
import numpy as np
import jax
import jax.numpy as jnp
from flax import linen as nn

from .efficientnet import BN

__all__ = ["LoFTR", "match_images", "convert_loftr"]


def _resize_ac2x(x):
    """2x bilinear upsample with align_corners=True (F.interpolate in
    resnet_fpn.py:109)."""
    B, H, W, C = x.shape

    def axis(x, size, axis):
        new = size * 2
        coords = np.linspace(0.0, size - 1.0, new)
        i0 = np.floor(coords).astype(np.int32)
        i1 = np.minimum(i0 + 1, size - 1)
        w1 = jnp.asarray((coords - i0).astype(np.float32))
        shape = [1] * x.ndim
        shape[axis] = new
        w1 = w1.reshape(shape)
        return (jnp.take(x, jnp.asarray(i0), axis=axis) * (1 - w1)
                + jnp.take(x, jnp.asarray(i1), axis=axis) * w1)

    return axis(axis(x, H, 1), W, 2)


class BasicBlock(nn.Module):
    """resnet_fpn.py:15 BasicBlock (conv-bn-relu, conv-bn, +shortcut)."""
    ch: int
    stride: int = 1

    @nn.compact
    def __call__(self, x):
        h = nn.Conv(self.ch, (3, 3), strides=(self.stride, self.stride),
                    padding=1, use_bias=False, name="conv1")(x)
        h = jax.nn.relu(BN(eps=1e-5, name="bn1")(h))
        h = nn.Conv(self.ch, (3, 3), padding=1, use_bias=False,
                    name="conv2")(h)
        h = BN(eps=1e-5, name="bn2")(h)
        if self.stride != 1:
            x = nn.Conv(self.ch, (1, 1),
                        strides=(self.stride, self.stride), use_bias=False,
                        name="downsample_conv")(x)
            x = BN(eps=1e-5, name="downsample_bn")(x)
        return jax.nn.relu(x + h)


class _OutConv2(nn.Module):
    """FPN smoothing: conv3x3 -> BN -> LeakyReLU -> conv3x3
    (resnet_fpn.py:72-77 layerN_outconv2)."""
    mid: int
    out: int

    @nn.compact
    def __call__(self, x):
        h = nn.Conv(self.mid, (3, 3), padding=1, use_bias=False,
                    name="conv1")(x)
        h = nn.leaky_relu(BN(eps=1e-5, name="bn")(h))
        return nn.Conv(self.out, (3, 3), padding=1, use_bias=False,
                       name="conv2")(h)


class ResNetFPN(nn.Module):
    """ResNetFPN_8_2: coarse /8 (256ch), fine /2 (128ch)."""

    @nn.compact
    def __call__(self, x):
        h = nn.Conv(128, (7, 7), strides=(2, 2), padding=3, use_bias=False,
                    name="conv1")(x)
        h = jax.nn.relu(BN(eps=1e-5, name="bn1")(h))
        x1 = BasicBlock(128, name="layer1_0")(h)
        x1 = BasicBlock(128, name="layer1_1")(x1)            # /2
        x2 = BasicBlock(196, 2, name="layer2_0")(x1)
        x2 = BasicBlock(196, name="layer2_1")(x2)            # /4
        x3 = BasicBlock(256, 2, name="layer3_0")(x2)
        x3 = BasicBlock(256, name="layer3_1")(x3)            # /8
        # FPN top-down (align_corners=True upsampling)
        c3 = nn.Conv(256, (1, 1), use_bias=False, name="layer3_outconv")(x3)
        c2 = nn.Conv(256, (1, 1), use_bias=False,
                     name="layer2_outconv")(x2) + _resize_ac2x(c3)
        c2 = _OutConv2(256, 196, name="layer2_outconv2")(c2)
        c1 = nn.Conv(196, (1, 1), use_bias=False,
                     name="layer1_outconv")(x1) + _resize_ac2x(c2)
        c1 = _OutConv2(196, 128, name="layer1_outconv2")(c1)
        return c3, c1   # coarse /8 256ch, fine /2 128ch


def _linear_attention(q, k, v):
    """elu+1 kernelized linear attention (LinearAttention, eps 1e-6)."""
    q = jax.nn.elu(q) + 1.0
    k = jax.nn.elu(k) + 1.0
    L = v.shape[1]
    v = v / L
    kv = jnp.einsum("bnhd,bnhv->bhdv", k, v)
    z = 1.0 / (jnp.einsum("bnhd,bhd->bnh", q, k.sum(1)) + 1e-6)
    return jnp.einsum("bnhd,bhdv,bnh->bnhv", q, kv, z) * L


class LoFTREncoderLayer(nn.Module):
    """transformer.py:8 — attention + [x, msg] MLP with post-norms."""
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
        m = nn.LayerNorm(name="norm1")(m)
        h = nn.Dense(2 * self.dim, use_bias=False, name="mlp0")(
            jnp.concatenate([x, m], -1))
        h = nn.Dense(self.dim, use_bias=False, name="mlp2")(
            jax.nn.relu(h))
        return x + nn.LayerNorm(name="norm2")(h)


def _pos_encoding(h, w, dim):
    """PositionEncodingSine (temp_bug_fix=True): interleaved channels
    c=4k..4k+3 <- sin/cos(x), sin/cos(y); positions are 1-indexed
    (`torch.ones(...).cumsum`). Built on host (static)."""
    d4 = dim // 4
    ys = np.arange(1, h + 1, dtype=np.float32)[:, None, None]
    xs = np.arange(1, w + 1, dtype=np.float32)[None, :, None]
    div = np.exp(np.arange(0, dim // 2, 2, dtype=np.float32)
                 * (-np.log(10000.0) / (dim // 2)))
    pe = np.zeros((h, w, dim), np.float32)
    pe[:, :, 0::4] = np.sin(xs * div) * np.ones((h, 1, 1), np.float32)
    pe[:, :, 1::4] = np.cos(xs * div) * np.ones((h, 1, 1), np.float32)
    pe[:, :, 2::4] = np.sin(ys * div) * np.ones((1, w, 1), np.float32)
    pe[:, :, 3::4] = np.cos(ys * div) * np.ones((1, w, 1), np.float32)
    return jnp.asarray(pe.reshape(1, h * w, dim))


def _unfold_windows(fm, ids, wsize, stride):
    """Gather wsize x wsize windows of the fine map `fm` (1, H, W, C)
    centered at coarse cells `ids` (K,) — F.unfold(kernel=W, stride=S,
    padding=W//2) + index_select, fine_preprocess.py:40-47."""
    H, W, C = fm.shape[1:]
    pad = wsize // 2
    fmp = jnp.pad(fm[0], ((pad, pad), (pad, pad), (0, 0)))
    wc = W // stride
    r = (ids // wc) * stride
    c = (ids % wc) * stride
    dr, dc = np.meshgrid(np.arange(wsize), np.arange(wsize),
                         indexing="ij")
    rows = r[:, None, None] + dr[None]            # (K, w, w)
    cols = c[:, None, None] + dc[None]
    return fmp[rows, cols]                        # (K, w, w, C)


class LoFTR(nn.Module):
    """Full matcher. Input (1, H, W, 1) grayscale in [0,1], H/W multiples
    of 8. Returns static-(topk)-shaped match buffers."""
    dim: int = 256
    layers: int = 4       # coarse (self, cross) pairs
    fine_dim: int = 128
    fine_window: int = 5
    border_rm: int = 2
    topk: int = 512
    conf_thresh: float = 0.2

    @nn.compact
    def __call__(self, img0, img1):
        feats = ResNetFPN(name="backbone")(
            jnp.concatenate([img0, img1], 0))
        f0c, f1c = feats[0][:1], feats[0][1:]
        f0f, f1f = feats[1][:1], feats[1][1:]
        B, h0, w0, C = f0c.shape
        _, h1, w1, _ = f1c.shape
        x0 = f0c.reshape(B, h0 * w0, C) + _pos_encoding(h0, w0, C)
        x1 = f1c.reshape(B, h1 * w1, C) + _pos_encoding(h1, w1, C)
        # interleaved self/cross; layers.{2i}=self, layers.{2i+1}=cross;
        # the cross pass updates feat0 first, feat1 then attends the NEW
        # feat0 (transformer.py:96-99)
        for i in range(self.layers):
            sl = LoFTREncoderLayer(self.dim, name=f"coarse_{2 * i}")
            cl = LoFTREncoderLayer(self.dim, name=f"coarse_{2 * i + 1}")
            x0 = sl(x0, x0)
            x1 = sl(x1, x1)
            x0 = cl(x0, x1)
            x1 = cl(x1, x0)

        # dual-softmax matching (coarse_matching.py:110-118)
        n0 = x0 / (C ** 0.5)
        n1 = x1 / (C ** 0.5)
        sim = jnp.einsum("bnc,bmc->bnm", n0, n1) / 0.1
        conf = (jax.nn.softmax(sim, 1) * jax.nn.softmax(sim, 2))[0]

        # threshold + border removal + mutual max
        valid = conf > self.conf_thresh
        # shrink the border margin on tiny grids so the interior stays
        # non-empty (tiny CI runs 4x4 coarse maps)
        b = min(self.border_rm, (min(h0, w0, h1, w1) - 1) // 2)
        if b > 0:
            def border_mask(h, w):
                m = np.zeros((h, w), bool)
                m[b:h - b, b:w - b] = True
                return m.reshape(-1)
            valid &= jnp.asarray(border_mask(h0, w0))[:, None]
            valid &= jnp.asarray(border_mask(h1, w1))[None, :]
        valid &= conf == conf.max(1, keepdims=True)
        valid &= conf == conf.max(0, keepdims=True)
        mconf_all = jnp.where(valid, conf, 0.0)

        # static top-K selection over rows (each row has <=1 valid col)
        row_best = mconf_all.max(1)
        row_j = mconf_all.argmax(1)
        k = min(self.topk, row_best.shape[0])
        mconf, i_ids = jax.lax.top_k(row_best, k)
        j_ids = row_j[i_ids]

        pts0_c = jnp.stack([i_ids % w0, i_ids // w0], -1) * 8.0
        pts1_c = jnp.stack([j_ids % w1, j_ids // w1], -1) * 8.0

        # fine refinement
        W5 = self.fine_window
        stride = 4  # hw_f / hw_c
        win0 = _unfold_windows(f0f, i_ids, W5, stride)   # (K, 5, 5, 128)
        win1 = _unfold_windows(f1f, j_ids, W5, stride)
        # coarse-context concat (fine_preprocess.py:50-57): shared
        # down_proj/merge_feat applied to the [f0, f1] stack
        cf = jnp.concatenate([x0[0][i_ids], x1[0][j_ids]], 0)  # (2K, 256)
        cf = nn.Dense(self.fine_dim, name="down_proj")(cf)
        wins = jnp.concatenate(
            [win0.reshape(k, W5 * W5, -1), win1.reshape(k, W5 * W5, -1)],
            0)
        wins = nn.Dense(self.fine_dim, name="merge_feat")(
            jnp.concatenate(
                [wins, jnp.broadcast_to(cf[:, None], wins.shape)], -1))
        # loftr_fine: one self/cross pair; same sequential cross order
        fs = LoFTREncoderLayer(self.fine_dim, name="fine_0")
        fc = LoFTREncoderLayer(self.fine_dim, name="fine_1")
        wins = fs(wins, wins)
        w0f, w1f = wins[:k], wins[k:]
        w0f = fc(w0f, w1f)
        w1f = fc(w1f, w0f)

        # fine matching (fine_matching.py:43-58): center feat of f0 vs
        # the f1 window -> softmax heatmap -> spatial expectation
        center = w0f[:, (W5 * W5) // 2]
        simf = jnp.einsum("kc,krc->kr", center, w1f) / (self.fine_dim
                                                        ** 0.5)
        heat = jax.nn.softmax(simf, -1).reshape(k, W5, W5)
        grid = (np.arange(W5, dtype=np.float32) / (W5 - 1)) * 2 - 1
        ex = jnp.einsum("khw,w->k", heat, jnp.asarray(grid))
        ey = jnp.einsum("khw,h->k", heat, jnp.asarray(grid))
        scale = 2.0  # hw_i / hw_f
        offset = jnp.stack([ex, ey], -1) * (W5 // 2) * scale

        return {"pts0": pts0_c, "pts1": pts1_c + offset,
                "conf": mconf, "hw0": (h0, w0), "hw1": (h1, w1)}


def match_images(apply_fn, params, img0, img1, max_matches=512,
                 conf_thresh=0.2):
    """Run LoFTR and extract matches as pixel coords.

    Returns (pts0 (M, 2), pts1 (M, 2), conf (M,)) numpy, matches below
    threshold dropped (host-side; variable M is fine here)."""
    out = apply_fn(params, img0, img1)
    conf = np.asarray(out["conf"])
    keep = conf > conf_thresh
    keep &= np.arange(len(conf)) < max_matches  # top_k output is sorted
    return (np.asarray(out["pts0"])[keep], np.asarray(out["pts1"])[keep],
            conf[keep])


# ---------------------------------------------------------------------------
# torch checkpoint -> flax params


def convert_loftr(sd):
    """Map an `indoor_ds_new.ckpt`-style torch state dict (optionally
    under a lightning `matcher.` prefix, loftr.py:80-84) onto the LoFTR
    flax tree. Returns (params_tree, unmatched_keys)."""
    sd = {(k[8:] if k.startswith("matcher.") else k): v
          for k, v in sd.items()}
    tree = {}
    unmatched = []

    def put(path, value):
        node = tree
        parts = path.split("/")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = np.asarray(value, np.float32)

    def conv_k(v):
        return np.asarray(v, np.float32).transpose(2, 3, 1, 0)

    def put_bn(prefix, tk_w, tk_b, tk_m, tk_v):
        put(prefix + "/scale", sd[tk_w])
        put(prefix + "/bias", sd[tk_b])
        put(prefix + "/mean", sd[tk_m])
        put(prefix + "/var", sd[tk_v])

    def enc_layer(torch_prefix, flax_prefix):
        put(f"{flax_prefix}/q_proj/kernel",
            np.asarray(sd[f"{torch_prefix}.q_proj.weight"], np.float32).T)
        put(f"{flax_prefix}/k_proj/kernel",
            np.asarray(sd[f"{torch_prefix}.k_proj.weight"], np.float32).T)
        put(f"{flax_prefix}/v_proj/kernel",
            np.asarray(sd[f"{torch_prefix}.v_proj.weight"], np.float32).T)
        put(f"{flax_prefix}/merge/kernel",
            np.asarray(sd[f"{torch_prefix}.merge.weight"], np.float32).T)
        put(f"{flax_prefix}/mlp0/kernel",
            np.asarray(sd[f"{torch_prefix}.mlp.0.weight"], np.float32).T)
        put(f"{flax_prefix}/mlp2/kernel",
            np.asarray(sd[f"{torch_prefix}.mlp.2.weight"], np.float32).T)
        for n in ("norm1", "norm2"):
            put(f"{flax_prefix}/{n}/scale",
                sd[f"{torch_prefix}.{n}.weight"])
            put(f"{flax_prefix}/{n}/bias", sd[f"{torch_prefix}.{n}.bias"])
        for leaf in ("q_proj.weight", "k_proj.weight", "v_proj.weight",
                     "merge.weight", "mlp.0.weight", "mlp.2.weight",
                     "norm1.weight", "norm1.bias", "norm2.weight",
                     "norm2.bias"):
            consumed.add(f"{torch_prefix}.{leaf}")

    consumed = set()

    def take_conv(tk, path):
        if tk in sd:
            put(path + "/kernel", conv_k(sd[tk]))
            consumed.add(tk)

    def take_bn(tkp, path):
        keys = (f"{tkp}.weight", f"{tkp}.bias", f"{tkp}.running_mean",
                f"{tkp}.running_var")
        if keys[0] in sd:
            put_bn(path, *keys)
            consumed.update(keys)
            consumed.add(f"{tkp}.num_batches_tracked")

    bb = "backbone"
    take_conv("backbone.conv1.weight", f"{bb}/conv1")
    take_bn("backbone.bn1", f"{bb}/bn1")
    for L, n_blocks in (("1", 2), ("2", 2), ("3", 2)):
        for i in range(n_blocks):
            tp = f"backbone.layer{L}.{i}"
            fp = f"{bb}/layer{L}_{i}"
            take_conv(f"{tp}.conv1.weight", f"{fp}/conv1")
            take_conv(f"{tp}.conv2.weight", f"{fp}/conv2")
            take_bn(f"{tp}.bn1", f"{fp}/bn1")
            take_bn(f"{tp}.bn2", f"{fp}/bn2")
            take_conv(f"{tp}.downsample.0.weight", f"{fp}/downsample_conv")
            take_bn(f"{tp}.downsample.1", f"{fp}/downsample_bn")
    for L in ("1", "2", "3"):
        take_conv(f"backbone.layer{L}_outconv.weight",
                  f"{bb}/layer{L}_outconv")
    for L in ("1", "2"):
        tp = f"backbone.layer{L}_outconv2"
        fp = f"{bb}/layer{L}_outconv2"
        take_conv(f"{tp}.0.weight", f"{fp}/conv1")
        take_bn(f"{tp}.1", f"{fp}/bn")
        take_conv(f"{tp}.3.weight", f"{fp}/conv2")

    n_coarse = sum(1 for k in sd
                   if k.startswith("loftr_coarse.layers.")
                   and k.endswith(".merge.weight"))
    for i in range(n_coarse):
        enc_layer(f"loftr_coarse.layers.{i}", f"coarse_{i}")
    for i in range(2):
        if f"loftr_fine.layers.{i}.merge.weight" in sd:
            enc_layer(f"loftr_fine.layers.{i}", f"fine_{i}")
    for tk, fp in (("fine_preprocess.down_proj", "down_proj"),
                   ("fine_preprocess.merge_feat", "merge_feat")):
        if f"{tk}.weight" in sd:
            put(f"{fp}/kernel",
                np.asarray(sd[f"{tk}.weight"], np.float32).T)
            put(f"{fp}/bias", sd[f"{tk}.bias"])
            consumed.update({f"{tk}.weight", f"{tk}.bias"})

    for k in sd:
        if k not in consumed and not k.endswith("num_batches_tracked"):
            unmatched.append(k)
    return {"params": tree}, unmatched
