"""Pallas TPU kernel for the rasterizer's pixel/candidate selection stage.

The XLA tile shader (`rasterize.py::shade_tile`) evaluates edge functions
for (tile_px^2 pixels x K candidates) and argmin-picks the nearest covering
triangle. On TPU that stage materializes the (P, K) intermediates in HBM
across `lax.map` fusion boundaries and dominates the mesh-fit step. This
module fuses it into one Pallas kernel:

- per candidate, the three edge functions and the interpolated 1/z are
  AFFINE in pixel coords: w_i(q) = alpha_i*qx + beta_i*qy + gamma_i and
  1/z(q) = zx*qx + zy*qy + zc. Coefficients (12 per candidate) are
  precomputed in XLA (`prepare_coeffs`) from the gathered candidate
  vertices; invalid/degenerate candidates get (0, 0, -1) edges so they are
  never covered.
- the kernel runs a (num_tiles, K/KB) grid with running (best_key,
  best_idx) accumulators in VMEM scratch; nothing (P, K)-sized ever leaves
  the core. Layout: PIXELS ride the lane axis and candidates the sublane
  axis, so the per-block argmin is a sublane reduction and the coefficient
  columns slice out as (KB, 1) without relayouts; coef is (T, Kp, 12) and
  outputs are (T, 1, P) to satisfy Mosaic's (8, 128)-or-full-dim block
  tiling rules. Selection is inherently non-differentiable (nvdiffrast's
  discrete coverage; the XLA path wraps it in stop_gradient), so the kernel
  needs no VJP — gradients come from the winner-recompute pass which stays
  in plain JAX on (H, W) arrays (`rasterize.py::rasterize` pallas branch).

Reference semantics: nvdiffrast rasterize/antialias as used by
`lib/models/decoders/mesh_renderer/base_mesh_renderer.py:241-298`.
"""
from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["prepare_coeffs", "select_pallas"]

_KB = 128  # candidate block (lane dim)
_BIG = 3.0e38  # python literal: jnp constants would be captured consts


def prepare_coeffs(tri_p, cand, cand_valid, cull_backface: bool):
    """Per-candidate affine coefficients for the selection kernel.

    tri_p: (F, 3, 3) pixel-space triangle verts (u, v, z_cam).
    cand: (T, K) int32 candidate tri ids; cand_valid: (T, K) bool.
    Returns (T, Kp, 12) f32 with Kp = K rounded up to a block multiple:
    cols 0-8 = (alpha, beta, gamma) for edges 0..2 (sign-normalized so
    covered <=> all three >= 0), cols 9-11 = (zx, zy, zc) of the
    screen-interpolated 1/z plane (nearest = largest).
    """
    p = tri_p[cand]                        # (T, K, 3, 3)
    a, b, c = p[..., 0, :], p[..., 1, :], p[..., 2, :]
    ax, ay, az = a[..., 0], a[..., 1], a[..., 2]
    bx, by, bz = b[..., 0], b[..., 1], b[..., 2]
    cx, cy, cz = c[..., 0], c[..., 1], c[..., 2]

    al0, be0, ga0 = -(cy - by), cx - bx, bx * cy - cx * by
    al1, be1, ga1 = -(ay - cy), ax - cx, cx * ay - ax * cy
    al2, be2, ga2 = -(by - ay), bx - ax, ax * by - bx * ay
    area = ga0 + ga1 + ga2                 # w0+w1+w2 == area for any q
    if cull_backface:
        ok = cand_valid & (area > 1e-12)
        sgn = jnp.ones_like(area)
    else:
        ok = cand_valid & (jnp.abs(area) > 1e-12)
        sgn = jnp.sign(area)
    # NOTE: the screen-interp 1/z plane divides by the SIGNED area (the
    # unsigned w's sum to `area`); only the edge tests get sign-folded
    inv_area = 1.0 / jnp.where(
        jnp.abs(area) < 1e-12,
        jnp.where(area >= 0, 1e-12, -1e-12), area)

    iza = 1.0 / az
    izb = 1.0 / bz
    izc = 1.0 / cz
    zx = (al0 * iza + al1 * izb + al2 * izc) * inv_area
    zy = (be0 * iza + be1 * izb + be2 * izc) * inv_area
    zc_ = (ga0 * iza + ga1 * izb + ga2 * izc) * inv_area

    def edge(al, be, ga):
        # fold the orientation sign; invalid candidates -> never covered
        return (jnp.where(ok, al * sgn, 0.0),
                jnp.where(ok, be * sgn, 0.0),
                jnp.where(ok, ga * sgn, -1.0))

    rows = []
    for al, be, ga in (edge(al0, be0, ga0), edge(al1, be1, ga1),
                       edge(al2, be2, ga2)):
        rows.extend([al, be, ga])
    rows.extend([zx, zy, zc_])
    coef = jnp.stack(rows, axis=-1)        # (T, K, 12)
    K = coef.shape[1]
    Kp = -(-K // _KB) * _KB
    if Kp != K:
        pad = jnp.zeros((coef.shape[0], Kp - K, 12), coef.dtype)
        pad = pad.at[:, :, 2].set(-1.0)    # gamma0 = -1: never covered
        pad = pad.at[:, :, 5].set(-1.0)
        pad = pad.at[:, :, 8].set(-1.0)
        coef = jnp.concatenate([coef, pad], axis=1)
    return coef


def _select_kernel(coef_ref, bidx_ref, bkey_ref, key_s, idx_s, *,
                   tile: int, tiles_x: int):
    t = pl.program_id(0)
    k = pl.program_id(1)
    nk = pl.num_programs(1)
    P = tile * tile

    @pl.when(k == 0)
    def _():
        key_s[:] = jnp.full((1, P), _BIG, jnp.float32)
        idx_s[:] = jnp.zeros((1, P), jnp.int32)

    tx = (t % tiles_x) * tile
    ty = (t // tiles_x) * tile
    pid = jax.lax.broadcasted_iota(jnp.int32, (1, P), 1)
    qx = (tx + pid % tile).astype(jnp.float32) + 0.5   # (1, P) on lanes
    qy = (ty + pid // tile).astype(jnp.float32) + 0.5

    co = coef_ref[0]                       # (KB, 12)

    def col(i):
        return co[:, i:i + 1]              # (KB, 1): lane slice, no relayout

    def w(i):
        return col(i) * qx + col(i + 1) * qy + col(i + 2)  # (KB, P)

    covered = (w(0) >= 0) & (w(3) >= 0) & (w(6) >= 0)
    inv_z = col(9) * qx + col(10) * qy + col(11)
    key = jnp.where(covered, -inv_z, _BIG)  # nearest = most negative

    bk = jnp.min(key, axis=0, keepdims=True)            # (1, P)
    sub = jax.lax.broadcasted_iota(jnp.int32, key.shape, 0)
    li = jnp.min(jnp.where(key == bk, sub, jnp.int32(2 ** 30)),
                 axis=0, keepdims=True) + k * key.shape[0]

    better = bk < key_s[:]
    idx_s[:] = jnp.where(better, li, idx_s[:])
    key_s[:] = jnp.minimum(bk, key_s[:])

    @pl.when(k == nk - 1)
    def _():
        bidx_ref[0] = idx_s[:]
        bkey_ref[0] = key_s[:]


@partial(jax.jit, static_argnames=("tile", "tiles_x", "interpret"))
def select_pallas(coef, tile: int, tiles_x: int, interpret: bool = False):
    """Run the selection kernel.

    coef: (T, Kp, 12) from `prepare_coeffs`. Returns (best_idx (T, P) int32
    into the candidate axis, best_key (T, P) f32 = -1/z of the winner,
    >= 3e38 when no candidate covers the pixel). Not differentiable (the
    XLA path's selection is stop_gradient too).
    """
    T, Kp, _ = coef.shape
    P = tile * tile
    coef = jax.lax.stop_gradient(coef)
    kern = partial(_select_kernel, tile=tile, tiles_x=tiles_x)
    bidx, bkey = pl.pallas_call(
        kern,
        grid=(T, Kp // _KB),
        in_specs=[pl.BlockSpec((1, _KB, 12), lambda t, k: (t, k, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=[pl.BlockSpec((1, 1, P), lambda t, k: (t, 0, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((1, 1, P), lambda t, k: (t, 0, 0),
                                memory_space=pltpu.VMEM)],
        out_shape=[jax.ShapeDtypeStruct((T, 1, P), jnp.int32),
                   jax.ShapeDtypeStruct((T, 1, P), jnp.float32)],
        scratch_shapes=[pltpu.VMEM((1, P), jnp.float32),
                        pltpu.VMEM((1, P), jnp.int32)],
        interpret=interpret,
    )(coef)
    return bidx.reshape(T, P), bkey.reshape(T, P)
