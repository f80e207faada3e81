"""Round-4 attribution of the mesh-fit step (tet 128, 512^2, render_bs 2).

prof_mesh_fit r4 ablations left ~870 ms unattributed after removing
shading (full step 1292 ms). This script times the remaining stages
separately on chip:

  raster fwd (rasterize only)           | per view
  raster fwd+bwd through soft alpha     | per view
  render_views fwd, no shading          | 2 views (adds vertex_normals +
                                        |   3x interpolate)
  render_views fwd+bwd, no shading      | 2 views
  render_views fwd+bwd, field shading   | 2 views (the loss_fn render)
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
from mvedit_tpu.models.mesh.renderer import render_views
from mvedit_tpu.models.fields import INGPConfig, ingp_init, ingp_point_decode
from mvedit_tpu.ops.dense_grid import DenseGridConfig
from mvedit_tpu.apis.cameras import surround_rig
from mvedit_tpu.utils import camera as cam_utils

res, size = 128, 512
grid = StructuredTetGrid(res)
v = np.asarray(grid.verts)
sdf = jnp.asarray((0.7 - np.linalg.norm(v, axis=-1)).astype(np.float32))
deform = jnp.zeros((len(v), 3), jnp.float32)
cap = 1 << 18
mt = marching_tets_structured(grid, grid.arrays(), sdf, deform=deform,
                              vert_cap=cap, face_cap=cap + (cap >> 1))
mt = {k: jnp.asarray(np.asarray(x)) for k, x in mt.items()}
print(f"faces used: {int(jnp.sum(mt['face_mask']))}", flush=True)

rc = RasterConfig(height=size, width=size, span=2, k_per_tile=768,
                  tile_chunk=64)
N = 2
rng = np.random.default_rng(0)
poses, intr = surround_rig(N, 2.5, 40, 0.0, 0.3, size, rng=rng)
poses = jnp.asarray(poses)
intr = jnp.asarray(intr)

ingp = INGPConfig(backend="dense",
                  dense=DenseGridConfig(resolutions=(32, 160)))
field = ingp_init(jax.random.PRNGKey(0), ingp)


def _sync(out):
    leaves = jax.tree_util.tree_leaves(out)
    for x in leaves:
        if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating):
            float(jnp.sum(x))
            return
    jax.block_until_ready(out)


def tmit(label, f, *a, n=5):
    out = f(*a)
    _sync(out)
    t0 = time.perf_counter()
    for _ in range(n):
        _sync(f(*a))
    print(f"{label}: {(time.perf_counter() - t0) / n * 1e3:.1f} ms",
          flush=True)


from mvedit_tpu.models.mesh.renderer import pose_to_w2c


@jax.jit
def raster_fwd(verts, faces, fmask, pose, ii):
    pts = project_mesh(verts, pose_to_w2c(pose), ii, rc.near)
    r = rasterize(pts, faces, fmask, rc)
    return r["alpha"]


@jax.jit
def raster_bwd(verts, faces, fmask, pose, ii):
    def f(vv):
        pts = project_mesh(vv, pose_to_w2c(pose), ii, rc.near)
        r = rasterize(pts, faces, fmask, rc)
        return jnp.sum(r["alpha"]) + jnp.sum(r["z"])
    return jax.grad(f)(verts)


tmit("raster fwd (1 view)", raster_fwd, mt["verts"], mt["faces"],
     mt["face_mask"], poses[0], intr[0])
tmit("raster fwd+bwd (1 view)", raster_bwd, mt["verts"], mt["faces"],
     mt["face_mask"], poses[0], intr[0])


@jax.jit
def rv_fwd(verts):
    out = render_views(verts, mt["faces"], mt["face_mask"], poses, intr,
                       rc, sequential=False)
    return out["alpha"]


@jax.jit
def rv_bwd(verts):
    def f(vv):
        out = render_views(vv, mt["faces"], mt["face_mask"], poses, intr,
                           rc, sequential=False)
        return (jnp.sum(out["alpha"]) + jnp.sum(out["normal"])
                + jnp.sum(out["depth"]))
    return jax.grad(f)(verts)


tmit("render_views fwd no-shade (2 views)", rv_fwd, mt["verts"])
tmit("render_views fwd+bwd no-shade (2 views)", rv_bwd, mt["verts"])


def shading_fun(params, xyz, normal, view_dir):
    return ingp_point_decode(params, xyz, ingp)[1]


@jax.jit
def rv_shade_bwd(verts, params):
    def f(vv, pp):
        out = render_views(vv, mt["faces"], mt["face_mask"], poses, intr,
                           rc, shading_fun=shading_fun, shading_params=pp)
        return jnp.sum(out["rgb"]) + jnp.sum(out["alpha"]) \
            + jnp.sum(out["normal"])
    g = jax.grad(f, argnums=(0, 1))(verts, params)
    return g[0]


tmit("render_views fwd+bwd shaded (2 views)", rv_shade_bwd, mt["verts"],
     field)
