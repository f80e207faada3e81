"""Honest timing of marching_tets_compact fwd and fwd+bwd at tet 128."""
import time
import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

from mvedit_tpu.models.mesh.dmtet import build_grid_tets, \
    marching_tets_compact

res = 128
grid = build_grid_tets(res)
ga = grid.arrays()
v = np.asarray(grid.verts)
sdf = jnp.asarray((0.7 - np.linalg.norm(v, axis=-1)).astype(np.float32))
deform = jnp.zeros((len(v), 3), jnp.float32)
cap = 1 << 18


def tmit(f, *a, n=5):
    def run():
        out = f(*a)
        float(jnp.sum(out if not isinstance(out, dict) else out["verts"]))
    run()
    t0 = time.perf_counter()
    for _ in range(n):
        run()
    return (time.perf_counter() - t0) / n


@jax.jit
def ext(ga, sdf, deform):
    return marching_tets_compact(ga, sdf, deform=deform, vert_cap=cap,
                                 face_cap=cap + (cap >> 1))


@jax.jit
def ext_bwd(ga, sdf, deform):
    def f(s, d):
        mt = marching_tets_compact(ga, s, deform=d, vert_cap=cap,
                                   face_cap=cap + (cap >> 1))
        return jnp.sum(jnp.where(jnp.isfinite(mt["verts"]),
                                 mt["verts"], 0.0))
    return jax.grad(f, argnums=(0, 1))(sdf, deform)[0]


print(f"extract fwd: {tmit(ext, ga, sdf, deform)*1e3:.1f} ms", flush=True)
print(f"extract fwd+bwd: {tmit(ext_bwd, ga, sdf, deform)*1e3:.1f} ms",
      flush=True)

# ---- structured extraction --------------------------------------------
from mvedit_tpu.models.mesh.structured_tets import (StructuredTetGrid,
                                                    marching_tets_structured)

sgrid = StructuredTetGrid(res)
sv = np.asarray(sgrid.verts)
ssdf = jnp.asarray((0.7 - np.linalg.norm(sv, axis=-1)).astype(np.float32))
sdeform = jnp.zeros((len(sv), 3), jnp.float32)
sga = sgrid.arrays()


def ext_s(ga2, sdf2, deform2):
    return marching_tets_structured(sgrid, ga2, sdf2, deform=deform2,
                                    vert_cap=cap,
                                    face_cap=cap + (cap >> 1))


def ext_s_bwd(ga2, sdf2, deform2):
    def f(s2, d2):
        mt = marching_tets_structured(sgrid, ga2, s2, deform=d2,
                                      vert_cap=cap,
                                      face_cap=cap + (cap >> 1))
        return jnp.sum(jnp.where(jnp.isfinite(mt["verts"]),
                                 mt["verts"], 0.0))             + 0.0 * jnp.sum(mt["faces"])
    return jax.grad(f, argnums=(0, 1))(sdf2, deform2)[0]


ext_s_bwd = jax.jit(ext_s_bwd)


def tmit_d(f, *a, n=5):
    def run():
        out = f(*a)
        leaf = out["verts"] if isinstance(out, dict) else out
        float(jnp.sum(leaf))
    run()
    t0 = time.perf_counter()
    for _ in range(n):
        run()
    return (time.perf_counter() - t0) / n


mt = ext_s(sga, ssdf, sdeform)
print(f"structured used verts={int(mt['n_verts'])} "
      f"faces={int(mt['n_faces'])}", flush=True)
print(f"structured extract fwd: {tmit_d(ext_s, sga, ssdf, sdeform)*1e3:.1f}"
      " ms", flush=True)
print("structured extract fwd+bwd: "
      f"{tmit_d(ext_s_bwd, sga, ssdf, sdeform)*1e3:.1f} ms", flush=True)
