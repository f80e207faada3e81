"""Reproduce the e2e loop's `_render_all` cost in isolation (r4).

The fresh e2e record shows render_all at 37 s STEADY per call — 2x the
round-3 total-average and the largest phase (292 s). This probes both
modes at the exact reduced-run shapes (16 views, 512^2):

  mesh:  render_views(sequential=True, FieldShading), k 1024 vs 768
  nerf:  make_multiview_renderer at 512^2 x 16

to attribute the regression (raster k bump? shading? per-view map?).
"""
import argparse
import time

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

from mvedit_tpu.models.mesh.structured_tets import (StructuredTetGrid,
                                                    marching_tets_structured)
from mvedit_tpu.models.mesh.rasterize import RasterConfig
from mvedit_tpu.models.mesh.renderer import render_views
from mvedit_tpu.models.fields import (INGPConfig, ingp_init, FieldShading)
from mvedit_tpu.models import nerf_fit as NF
from mvedit_tpu.ops.dense_grid import DenseGridConfig
from mvedit_tpu.apis.cameras import surround_rig

ap = argparse.ArgumentParser()
ap.add_argument("--views", type=int, default=16)
ap.add_argument("--size", type=int, default=512)
ap.add_argument("--mode", default="mesh,nerf")
args = ap.parse_args()

res, size, N = 128, args.size, args.views
grid = StructuredTetGrid(res)
v = np.asarray(grid.verts)
sdf = jnp.asarray((0.7 - np.linalg.norm(v, axis=-1)).astype(np.float32))
cap = 1 << 18
mt = marching_tets_structured(grid, grid.arrays(), sdf,
                              deform=jnp.zeros((len(v), 3)),
                              vert_cap=cap, face_cap=cap + (cap >> 1))
mt = {k: jnp.asarray(np.asarray(x)) for k, x in mt.items()}
print(f"faces used: {int(jnp.sum(mt['face_mask']))}", flush=True)

rng = np.random.default_rng(0)
poses, intr = surround_rig(N, 2.5, 40, 0.0, 0.3, size, rng=rng)
poses = jnp.asarray(poses)
intr = jnp.asarray(intr)

ingp = INGPConfig(backend="dense",
                  dense=DenseGridConfig(resolutions=(32, 160)))
field = ingp_init(jax.random.PRNGKey(0), ingp)


def _sync(out):
    for x in jax.tree_util.tree_leaves(out):
        if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating):
            float(jnp.sum(x))
            return


def bench(label, fn, iters=3):
    t0 = time.perf_counter()
    out = fn()
    _sync(out)
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn()
        _sync(out)
    steady = (time.perf_counter() - t0) / iters
    print(f"{label}: compile+1st {compile_s:.2f} s, steady "
          f"{steady*1e3:.0f} ms", flush=True)


if "mesh" in args.mode:
    shading = FieldShading(ingp)
    for k in (1024, 768):
        rc = RasterConfig(height=size, width=size, span=2, k_per_tile=k,
                          tile_chunk=64 if size >= 512 else 256)
        bench(f"mesh render_views k={k} N={N} {size}^2",
              lambda rc=rc: render_views(
                  mt["verts"], mt["faces"], mt["face_mask"], poses, intr,
                  rc, shading_fun=shading, shading_params=field,
                  sequential=True))

if "nerf" in args.mode:
    from functools import partial
    from mvedit_tpu.models.fields import ingp_point_decode
    decode = partial(ingp_point_decode, cfg=ingp)
    render = NF.make_multiview_renderer(
        decode, size, size, NF.RenderConfig(), chunk=size * 128)
    bench(f"nerf multiview N={N} {size}^2",
          lambda: render(field, poses, intr, None))
