"""Raster config sweep at the mesh-fit production shape (r4).

The tile shader costs pixels x K_candidates edge evaluations; finer tiles
cut K (fewer tris per tile) at the price of more tiles and more
per-tile gather rows. Sweeps (tile, k_per_tile, tile_chunk) on the
DMTet-extracted sphere (tet 128 -> 226k live faces) at 512^2 and checks
coverage parity (dropped candidates show up as alpha loss).
"""
import time

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

from mvedit_tpu.models.mesh.structured_tets import (StructuredTetGrid,
                                                    marching_tets_structured)
from mvedit_tpu.models.mesh.rasterize import (RasterConfig, project_mesh,
                                              rasterize)
from mvedit_tpu.models.mesh.renderer import pose_to_w2c
from mvedit_tpu.apis.cameras import surround_rig

res, size = 128, 512
grid = StructuredTetGrid(res)
v = np.asarray(grid.verts)
sdf = jnp.asarray((0.7 - np.linalg.norm(v, axis=-1)).astype(np.float32))
cap = 1 << 18
mt = marching_tets_structured(grid, grid.arrays(), sdf,
                              deform=jnp.zeros((len(v), 3)),
                              vert_cap=cap, face_cap=cap + (cap >> 1))
mt = {k: jnp.asarray(np.asarray(x)) for k, x in mt.items()}
rng = np.random.default_rng(0)
poses, intr = surround_rig(2, 2.5, 40, 0.0, 0.3, size, rng=rng)
pose, ii = jnp.asarray(poses[0]), jnp.asarray(intr[0])


def run_cfg(tag, rc, n=5):
    @jax.jit
    def fwd(verts):
        pts = project_mesh(verts, pose_to_w2c(pose), ii, rc.near)
        r = rasterize(pts, mt["faces"], mt["face_mask"], rc)
        return r["alpha"], r["alpha_hard"]

    @jax.jit
    def bwd(verts):
        def f(vv):
            pts = project_mesh(vv, pose_to_w2c(pose), ii, rc.near)
            r = rasterize(pts, mt["faces"], mt["face_mask"], rc)
            return jnp.sum(r["alpha"]) + jnp.sum(r["z"])
        return jax.grad(f)(verts)

    a, ah = fwd(mt["verts"])
    cov = float(jnp.sum(ah))
    t0 = time.perf_counter()
    for _ in range(n):
        float(jnp.sum(fwd(mt["verts"])[0]))
    tf = (time.perf_counter() - t0) / n
    float(jnp.sum(bwd(mt["verts"])))
    t0 = time.perf_counter()
    for _ in range(n):
        float(jnp.sum(bwd(mt["verts"])))
    tb = (time.perf_counter() - t0) / n
    print(f"{tag}: fwd {tf*1e3:.1f} ms  fwd+bwd {tb*1e3:.1f} ms  "
          f"covered_px {cov:.0f}", flush=True)


run_cfg("tile16 k768 chunk64  (current)",
        RasterConfig(height=size, width=size, span=2, k_per_tile=768,
                     tile_chunk=64))
run_cfg("tile16 k768 chunk256",
        RasterConfig(height=size, width=size, span=2, k_per_tile=768,
                     tile_chunk=256))
run_cfg("tile8  k384 chunk256",
        RasterConfig(height=size, width=size, tile=8, span=2,
                     k_per_tile=384, tile_chunk=256))
run_cfg("tile8  k256 chunk256",
        RasterConfig(height=size, width=size, tile=8, span=2,
                     k_per_tile=256, tile_chunk=256))
run_cfg("tile8  k256 chunk1024",
        RasterConfig(height=size, width=size, tile=8, span=2,
                     k_per_tile=256, tile_chunk=1024))
run_cfg("tile32 k1536 chunk16",
        RasterConfig(height=size, width=size, tile=32, span=2,
                     k_per_tile=1536, tile_chunk=16))
run_cfg("tile16 k256 t0 chunk64",
        RasterConfig(height=size, width=size, span=2, bin_mode="t0",
                     k_per_tile=256, tile_chunk=64))
run_cfg("tile16 k192 t0 chunk64",
        RasterConfig(height=size, width=size, span=2, bin_mode="t0",
                     k_per_tile=192, tile_chunk=64))
run_cfg("tile8  k256 t0 chunk256",
        RasterConfig(height=size, width=size, tile=8, span=2,
                     bin_mode="t0", k_per_tile=256, tile_chunk=256))
run_cfg("tile8  k320 t0 chunk256",
        RasterConfig(height=size, width=size, tile=8, span=2,
                     bin_mode="t0", k_per_tile=320, tile_chunk=256))
run_cfg("tile16 k1024 pairs chunk64",
        RasterConfig(height=size, width=size, span=2,
                     k_per_tile=1024, tile_chunk=64))
