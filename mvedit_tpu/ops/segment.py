"""Row-drop scatter-add with a gather-only VJP (mesh backward workhorse).

The mesh pipeline accumulates pixel gradients into vertex attributes
(interpolate backward: 512^2 x 3 corners rows into (V, C)) and face
normals into vertices (vertex_normals: 3F rows). Round-4 measurements at
these exact sizes (benchmarks/prof_scatter_prims.py, v5e via tunnel):

  scatter-add 786k x 6ch rows -> (262k, 6):   39 ms   (~50 ns/row)
  sort-based segment sum (argsort+cumsum+searchsorted): ~2.3x SLOWER
    end-to-end (render_views fwd+bwd no-shade 406 -> 940 ms) — TPU
    lax.sort passes dominate; the round-3 dense-grid scatter pathology
    (~80 ns/row, PERF.md) is about ROW COUNT, not about scatter vs sort.

So the implementation is the plain HLO scatter with `mode="drop"`; the
win comes from callers REDUCING ROWS (pack xyz+normal into one
interpolate call) and from the custom VJP below keeping the backward a
pure gather. No reference counterpart — CUDA atomics inside
nvdiffrast/tcnn play this role there.
"""
from functools import partial

import jax
import jax.numpy as jnp

__all__ = ["segment_add"]


@partial(jax.custom_vjp, nondiff_argnums=(2,))
def segment_add(idx, vals, size):
    """`jnp.zeros((size, C)).at[idx].add(vals)` with drop semantics.

    idx: (N,) int32 targets; rows with idx outside [0, size) are dropped —
    callers use idx == size as the mask convention.
    vals: (N, C) payload (accumulated in float32).
    Returns (size, C) float32.
    """
    return _fwd_impl(idx, vals, size)


def _fwd_impl(idx, vals, size):
    return jnp.zeros((size, vals.shape[-1]), jnp.float32).at[idx].add(
        vals.astype(jnp.float32), mode="drop")


def _fwd(idx, vals, size):
    # dtype carried as a zero-size array (numpy dtypes are not JAX types)
    return _fwd_impl(idx, vals, size), (idx, jnp.zeros((0,), vals.dtype))


def _bwd(size, res, g):
    idx, vproto = res
    safe = jnp.clip(idx, 0, size - 1)
    gv = g[safe]
    gv = jnp.where(((idx >= 0) & (idx < size))[:, None], gv, 0.0)
    return None, gv.astype(vproto.dtype)


segment_add.defvjp(_fwd, _bwd)
