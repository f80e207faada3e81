"""Sub-stage attribution of `_bin_triangles` — the measured raster-fwd
dominator (63.8 of ~85 ms/view at the mesh-fit production shape,
PERF.md r4).

Stages timed separately at the production shape (F = face_cap 393216,
span 2, 512^2, tile 16, k 1024):

  1. pair emission (AABB -> (tile, tri) pairs, pre-sort)
  2. two-array lax.sort((keys, vals)) — the current implementation
  3. PACKED single-array sort: key = tile_id * 2^19 | tri_id fits one
     int32 (tiles_x*tiles_y+1 <= 2^11, faces < 2^19 at the production
     face cap), so ONE operand rides the compare-exchange network
     instead of two — candidate replacement
  4. searchsorted + per-tile gather
  5. full _bin_triangles (current) vs full packed variant
"""
import argparse
import time

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

from mvedit_tpu.models.mesh.dmtet import build_grid_tets, marching_tets
from mvedit_tpu.models.mesh.structured_tets import (StructuredTetGrid,
                                                    marching_tets_structured)
from mvedit_tpu.models.mesh.rasterize import (RasterConfig, project_mesh,
                                              _bin_triangles, rasterize)
from mvedit_tpu.apis.cameras import surround_rig

ap = argparse.ArgumentParser()
ap.add_argument("--res", type=int, default=128)
ap.add_argument("--size", type=int, default=512)
args = ap.parse_args()

res, size = args.res, args.size
grid = StructuredTetGrid(res)
v = np.asarray(grid.verts)
sdf = jnp.asarray((0.7 - np.linalg.norm(v, axis=-1)).astype(np.float32))
vert_cap = 1 << max(9, (16 * res * res - 1).bit_length())
mt = jax.jit(lambda s: marching_tets_structured(
    grid, grid.arrays(), s, vert_cap=vert_cap,
    face_cap=vert_cap + (vert_cap >> 1)))(sdf)
poses, intr = surround_rig(2, 2.5, 40, 0.0, 0.3, size,
                           rng=np.random.default_rng(0))
cfg = RasterConfig(height=size, width=size, span=2, k_per_tile=1024,
                   tile_chunk=64)
pts = jax.jit(project_mesh, static_argnames=())(
    mt["verts"], jnp.concatenate(
        [jnp.asarray(poses[0])[:3, :3].T,
         (-jnp.asarray(poses[0])[:3, :3].T @ jnp.asarray(poses[0])[:3, 3]
          )[:, None]], axis=1), jnp.asarray(intr[0]))
faces, fv = mt["faces"], mt["face_mask"]
F = faces.shape[0]
print(f"F={F} live={int(jnp.sum(fv))} tiles={cfg.num_tiles}", flush=True)


def tmit(f, *a, n=20):
    out = f(*a)
    float(jnp.sum(jax.tree_util.tree_leaves(out)[0].astype(jnp.float32)))
    t0 = time.perf_counter()
    for _ in range(n):
        out = f(*a)
        float(jnp.sum(jax.tree_util.tree_leaves(out)[0]
                      .astype(jnp.float32)))
    return (time.perf_counter() - t0) / n


# ---- stage 1: emission only --------------------------------------------
@jax.jit
def emit(pts, faces, fv):
    p = pts[faces]
    fmin = jnp.min(p[..., :2], axis=1)
    fmax = jnp.max(p[..., :2], axis=1)
    behind = jnp.any(p[..., 2] <= cfg.near, axis=1)
    offscreen = (fmax[:, 0] < 0) | (fmax[:, 1] < 0) \
        | (fmin[:, 0] >= cfg.width) | (fmin[:, 1] >= cfg.height)
    live = fv & (~behind) & (~offscreen)
    t0 = jnp.clip(jnp.floor(fmin / cfg.tile).astype(jnp.int32), 0,
                  jnp.asarray([cfg.tiles_x - 1, cfg.tiles_y - 1]))
    t1 = jnp.clip(jnp.floor(fmax / cfg.tile).astype(jnp.int32), 0,
                  jnp.asarray([cfg.tiles_x - 1, cfg.tiles_y - 1]))
    span = t1 - t0 + 1
    is_big = live & ((span[:, 0] > cfg.span) | (span[:, 1] > cfg.span))
    is_small = live & (~is_big)
    S = cfg.span
    dx = jnp.arange(S)
    dy = jnp.arange(S)
    gx = t0[:, 0:1] + dx[None]
    gy = t0[:, 1:2] + dy[None]
    in_x = dx[None] < span[:, 0:1]
    in_y = dy[None] < span[:, 1:2]
    tile_id = gy[:, :, None] * cfg.tiles_x + gx[:, None, :]
    pair_valid = (is_small[:, None, None] & in_y[:, :, None]
                  & in_x[:, None, :])
    keys = jnp.where(pair_valid, tile_id, jnp.int32(cfg.num_tiles)
                     ).reshape(-1)
    vals = jnp.broadcast_to(jnp.arange(F, dtype=jnp.int32)[:, None, None],
                            tile_id.shape).reshape(-1)
    return keys, vals, is_big


keys, vals, is_big = emit(pts, faces, fv)
t_emit = tmit(emit, pts, faces, fv)
print(f"emit pairs ({keys.shape[0]} elems): {t_emit*1e3:.1f} ms",
      flush=True)

# ---- stage 2: two-array sort (current) ----------------------------------
@jax.jit
def sort2(keys, vals):
    return jax.lax.sort((keys, vals), num_keys=1)


t_sort2 = tmit(sort2, keys, vals)
print(f"sort two-array: {t_sort2*1e3:.1f} ms", flush=True)

# ---- stage 3: packed single-array sort ----------------------------------
SHIFT = max(F - 1, 1).bit_length()
assert (cfg.num_tiles + 1) << SHIFT <= 2**31, "packed key overflows int32"


@jax.jit
def sort_packed(keys, vals):
    packed = (keys << SHIFT) | vals
    s = jax.lax.sort(packed)
    return s >> SHIFT, s & ((1 << SHIFT) - 1)


k2, v2 = sort_packed(keys, vals)
k1, v1 = sort2(keys, vals)
# packed sort is stable-by-construction (val embedded in key); two-array
# num_keys=1 sort is NOT guaranteed stable on vals, so compare per-tile
# membership sets
assert np.array_equal(np.asarray(k1), np.asarray(k2))
t_sort1 = tmit(sort_packed, keys, vals)
print(f"sort packed int32: {t_sort1*1e3:.1f} ms", flush=True)

# ---- stage 4: searchsorted + gather -------------------------------------
@jax.jit
def gather_lists(keys, vals):
    starts = jnp.searchsorted(keys, jnp.arange(cfg.num_tiles),
                              side="left")
    ends = jnp.searchsorted(keys, jnp.arange(cfg.num_tiles), side="right")
    idx = starts[:, None] + jnp.arange(cfg.k_per_tile)[None]
    tile_valid = idx < ends[:, None]
    idx = jnp.clip(idx, 0, keys.shape[0] - 1)
    return vals[idx], tile_valid


t_gather = tmit(gather_lists, k1, v1)
print(f"searchsorted+gather: {t_gather*1e3:.1f} ms", flush=True)

# ---- stage 5: full current vs expected-packed total ----------------------
bin_jit = jax.jit(lambda p, f, m: _bin_triangles(p, f, m, cfg))
t_full = tmit(bin_jit, pts, faces, fv)
print(f"_bin_triangles full (current): {t_full*1e3:.1f} ms", flush=True)
print(f"  modeled packed total: "
      f"{(t_emit + t_sort1 + t_gather)*1e3:.1f} ms", flush=True)

# rasterize full for context
rast_jit = jax.jit(lambda p, f, m: rasterize(p, f, m, cfg)["alpha"])
t_rast = tmit(rast_jit, pts, faces, fv, n=10)
print(f"rasterize full fwd: {t_rast*1e3:.1f} ms", flush=True)
