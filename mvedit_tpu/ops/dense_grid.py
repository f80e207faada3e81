"""Dense multi-resolution feature volumes (TPU-first iNGP alternative).

The hash grid (`ops/hash_grid.py`) reproduces tiny-cuda-nn semantics but its
access pattern — 8 corners x 12 levels = 96 random 8-byte gathers per point
— is hostile to TPU (gather throughput bound). For the bounded per-object
scenes MVEdit reconstructs, a dense pyramid is strictly better on TPU:

- 2 levels (coarse + fine) x 8 corners = 16 gathers per point;
- each gathered row is C>=8 channels wide (32+ bytes), so the gather units
  and HBM lanes are actually utilized;
- memory at 128^3 x 8ch fp32 = 67MB — trivial for 16GB HBM (the hash table
  only exists to compress GPU memory, a constraint TPU doesn't share here).

`DenseGridConfig.out_dim` matches the MLP contract of the hash encoder, so
`INGPConfig(backend="dense")` swaps in transparently.
"""
from dataclasses import dataclass
from functools import partial
from itertools import product
from typing import Tuple

import jax
import numpy as np
import jax.numpy as jnp

__all__ = ["DenseGridConfig", "dense_grid_init", "dense_grid_encode"]


@dataclass(frozen=True)
class DenseGridConfig:
    resolutions: Tuple[int, ...] = (32, 160)
    n_features: int = 8
    interpolation: str = "smoothstep"
    # gather in bf16 (fp32 master params): measured 1.4x faster fit on v5e
    gather_dtype: str = "bfloat16"
    # corner folding: pack the +z (fold>=2), +y (fold>=4) and +x (fold=8)
    # neighbours into the channel axis before gathering, so each point
    # costs fold-fewer, fold-wider gather rows (and the backward costs
    # fold-fewer scatter-add rows — the fit-step dominator). The folded
    # table is rebuilt per call (dense shifts — bandwidth-cheap vs the
    # gather/scatter row count it removes). 1 | 2 | 4 | 8.
    fold: int = 8

    @property
    def out_dim(self):
        return len(self.resolutions) * self.n_features


def dense_grid_init(key, cfg: DenseGridConfig, scale=1e-4):
    """Returns {'level_i': (R+1, R+1, R+1, F) fp32} pytree."""
    tables = {}
    for i, r in enumerate(cfg.resolutions):
        key, k = jax.random.split(key)
        tables[f"level_{i}"] = jax.random.uniform(
            k, (r + 1, r + 1, r + 1, cfg.n_features), jnp.float32,
            -scale, scale)
    return tables


def _fold_table_concat(tab, fold):
    """Reference implementation: slice + channel-axis concat."""
    if fold >= 2:
        nz = jnp.concatenate([tab[:, :, 1:], tab[:, :, -1:]], axis=2)
        tab = jnp.concatenate([tab, nz], axis=-1)
    if fold >= 4:
        ny = jnp.concatenate([tab[:, 1:], tab[:, -1:]], axis=1)
        tab = jnp.concatenate([tab, ny], axis=-1)
    if fold >= 8:
        nx = jnp.concatenate([tab[1:], tab[-1:]], axis=0)
        tab = jnp.concatenate([tab, nx], axis=-1)
    return tab


def _fold_table(tab, fold):
    """(S, S, S, F) -> (S, S, S, fold*F) with the +z / +y / +x neighbour
    rows packed into channels (edge rows repeat — matches per-corner index
    clamping). Channel block order after full folding:
    [x0y0z0, x0y0z1, x0y1z0, x0y1z1, x1y0z0, x1y0z1, x1y1z0, x1y1z1].

    Implemented as a one-hot 2x2x2 convolution on the edge-replicated
    table: the channel-axis concats of the slice formulation write
    sub-tile lane blocks (8 of F=8 lanes into 64) and measured ~40 ms per
    fit step as data-formatting loops on the 161^3 table (mesh-step
    xplane trace, PERF.md r5); the conv form is one MXU pass, and its
    transpose (the fold backward, run every fit step) is a conv too.
    Bit-exactness vs the slice form is pinned by
    test_ops.py::test_fold_table_conv_matches_concat."""
    if fold == 1:
        return tab
    F = tab.shape[-1]
    taps = {2: (1, 1, 2), 4: (1, 2, 2), 8: (2, 2, 2)}[fold]
    pad = [(0, t - 1) for t in taps] + [(0, 0)]
    x = jnp.pad(tab, pad, mode="edge")[None]              # (1, S+, S+, S+, F)
    k = np.zeros(taps + (F, fold * F), np.float32)
    for b, (dx, dy, dz) in enumerate(product(*[range(t) for t in taps])):
        for f in range(F):
            k[dx, dy, dz, f, b * F + f] = 1.0
    out = jax.lax.conv_general_dilated(
        x, jnp.asarray(k, tab.dtype), window_strides=(1, 1, 1),
        padding="VALID",
        dimension_numbers=("NHWDC", "HWDIO", "NHWDC"),
        preferred_element_type=tab.dtype)
    return out[0]


@partial(jax.jit, static_argnames=("cfg",))
def dense_grid_encode(tables, xyz, cfg: DenseGridConfig):
    """xyz: (..., 3) in [0, 1] -> (..., out_dim)."""
    assert cfg.fold in (1, 2, 4, 8)
    batch_shape = xyz.shape[:-1]
    x = jnp.clip(xyz.reshape(-1, 3).astype(jnp.float32), 0.0, 1.0)
    P = x.shape[0]
    F = cfg.n_features
    gdt = jnp.dtype(cfg.gather_dtype)
    # corner offsets still gathered per-point, given the fold level:
    # fold 8 -> [()], fold 4 -> x loop, fold 2 -> x,y loops, fold 1 -> all
    loop_dims = {8: (), 4: ("x",), 2: ("x", "y"), 1: ("x", "y", "z")}[
        cfg.fold]
    folded_dims = [d for d in ("x", "y", "z") if d not in loop_dims]
    axis_of = {"x": 0, "y": 1, "z": 2}
    feats = []
    for i, res in enumerate(cfg.resolutions):
        tab = tables[f"level_{i}"]
        if tab.dtype != gdt:
            tab = tab.astype(gdt)
        tab = _fold_table(tab, cfg.fold).reshape(-1, cfg.fold * F)
        pos = x * res
        p0 = jnp.floor(pos)
        t = pos - p0
        if cfg.interpolation == "smoothstep":
            w = t * t * (3.0 - 2.0 * t)
        else:
            w = t
        p0i = p0.astype(jnp.int32)
        side = res + 1
        # per-point weights over the folded channel blocks: outer product
        # of (1-w, w) over folded dims, in _fold_table's block order
        # (x slowest, z fastest)
        wblk = jnp.ones((P, 1), jnp.float32)
        for d in folded_dims:
            wd = w[:, axis_of[d]]
            wblk = (wblk[:, :, None]
                    * jnp.stack([1.0 - wd, wd], -1)[:, None, :]
                    ).reshape(P, -1)
        acc = jnp.zeros((P, F), jnp.float32)
        for offs in product(*[(0, 1)] * len(loop_dims)):
            cc = []
            wcorner = jnp.ones((P,), jnp.float32)
            off = dict(zip(loop_dims, offs))
            for d in ("x", "y", "z"):
                a = axis_of[d]
                if d in off:
                    cc.append(jnp.minimum(p0i[:, a] + off[d], res))
                    wcorner = wcorner * (w[:, a] if off[d] else 1 - w[:, a])
                else:
                    cc.append(jnp.minimum(p0i[:, a], res))
            idx = (cc[0] * side + cc[1]) * side + cc[2]
            v = jnp.take(tab, idx, axis=0).reshape(P, cfg.fold, F)
            acc = acc + jnp.einsum(
                "pkf,pk->pf", v.astype(jnp.float32), wblk * wcorner[:, None])
        feats.append(acc)
    return jnp.concatenate(feats, axis=-1).reshape(*batch_shape, cfg.out_dim)
