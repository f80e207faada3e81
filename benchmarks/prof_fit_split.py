"""Fine-grained split of the mesh-fit step cost at production shape
(structured tet 128, 512^2, render_bs 2) — follows prof_mesh_fit.py's
coarse ablations (full 1290 ms: shading ~404, field ~136, reg ~77).

Times, each as an independent jitted fwd+bwd program:
  1. structured extract fwd / fwd+bwd (d sum(verts) / d sdf,deform)
  2. raster+interp only (albedo+alpha L1, no normals, const color)
  3. + vertex normals in the loss (sum(n_img)) — isolates the
     vertex_normals scatter + per-pixel interp + their backward
  4. + lambertian shading & tonemap LUT on top of 3
"""
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
from mvedit_tpu.ops.tonemapping import Tonemapping
from mvedit_tpu.apis.cameras import surround_rig

res, size = 128, 512
grid = StructuredTetGrid(res)
ga = grid.arrays()
v = np.asarray(grid.verts)
sdf = jnp.asarray((0.7 - np.linalg.norm(v, axis=-1)).astype(np.float32))
deform = jnp.zeros((len(v), 3), jnp.float32)
g = res
vc = 1 << max(9, (16 * g * g - 1).bit_length())
fc = vc + (vc >> 1)
rc = RasterConfig(height=size, width=size, span=2, k_per_tile=768,
                  tile_chunk=64)
rng = np.random.default_rng(0)
poses, intr = surround_rig(2, 2.5, 40, 0.0, 0.3, size, rng=rng)
poses, intr = jnp.asarray(poses), jnp.asarray(intr)
tm = Tonemapping()


def tmit(f, *a, n=4, label=""):
    t0 = time.perf_counter()
    out = f(*a)
    float(jnp.sum(jax.tree_util.tree_leaves(out)[0]))
    print(f"{label} compile+run: {time.perf_counter()-t0:.0f} s",
          flush=True)
    t0 = time.perf_counter()
    for _ in range(n):
        out = f(*a)
        float(jnp.sum(jax.tree_util.tree_leaves(out)[0]))
    print(f"{label}: {(time.perf_counter()-t0)/n*1e3:.1f} ms", flush=True)


def extract(s, d):
    return marching_tets_structured(grid, ga, s, deform=d, vert_cap=vc,
                                    face_cap=fc)


@jax.jit
def ext_fwd(s, d):
    return extract(s, d)["verts"]


@jax.jit
def ext_bwd(s, d):
    def f(s, d):
        mt = extract(s, d)
        return jnp.sum(mt["verts"] * mt["vert_mask"][:, None])
    return jax.grad(f, argnums=(0, 1))(s, d)


def make_loss(use_normals, use_shading):
    def loss(s, d):
        mt = extract(s, d)
        out = render_views(mt["verts"], mt["faces"], mt["face_mask"],
                           poses, intr, rc)
        tot = jnp.mean(jnp.abs(out["xyz"] - 0.5)) \
            + jnp.mean(jnp.abs(out["alpha"] - 1.0))
        if use_normals and not use_shading:
            tot = tot + jnp.mean(out["normal"])
        if use_shading:
            lam = jnp.clip(jnp.sum(
                jnp.asarray([0.0, 0.0, 1.0]) * out["normal"], -1,
                keepdims=True), 0.0, None)
            shading = lam * 0.7 + 0.3
            fg = jnp.clip(out["xyz"] * 0.5 + 0.5, 1e-4, 1.0)
            rgb = tm.lut(tm.inverse_lut(fg)
                         + jnp.log2(jnp.clip(shading, 1e-6, None)))
            tot = tot + jnp.mean(rgb)
        return tot
    return jax.jit(lambda s, d: jax.grad(loss, argnums=(0, 1))(s, d))


tmit(ext_fwd, sdf, deform, label="extract fwd")
tmit(ext_bwd, sdf, deform, label="extract fwd+bwd")
tmit(make_loss(False, False), sdf, deform,
     label="ext+raster fwd+bwd (no normals)")
tmit(make_loss(True, False), sdf, deform,
     label="ext+raster+normals fwd+bwd")
tmit(make_loss(True, True), sdf, deform,
     label="ext+raster+shading+tonemap fwd+bwd")
