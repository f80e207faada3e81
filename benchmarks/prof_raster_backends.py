"""Rasterizer backend A/B on the real chip: XLA tile shader vs the Pallas
selection kernel (`mesh/select_pallas.py`), at the mesh-fit production
shape (512^2, DMTet-like triangle soup, fwd + vjp)."""
import time
import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

from dataclasses import replace
from mvedit_tpu.models.mesh.rasterize import RasterConfig, rasterize, \
    project_mesh

# DMTet-like soup: icosphere-ish dense surface, ~300k faces
rng = np.random.default_rng(0)
n_th, n_ph = 390, 390
th = np.linspace(0.03, np.pi - 0.03, n_th)
ph = np.linspace(0, 2 * np.pi, n_ph, endpoint=False)
tt, pp = np.meshgrid(th, ph, indexing="ij")
r = 0.7 + 0.05 * np.sin(6 * tt) * np.cos(5 * pp)
verts = np.stack([r * np.sin(tt) * np.cos(pp), r * np.sin(tt) * np.sin(pp),
                  r * np.cos(tt)], -1).reshape(-1, 3).astype(np.float32)
idx = np.arange(n_th * n_ph).reshape(n_th, n_ph)
f0 = np.stack([idx[:-1, :], idx[1:, :], idx[:-1, np.roll(np.arange(n_ph), -1)]
               ], -1).reshape(-1, 3)
f1 = np.stack([idx[1:, :], idx[1:, np.roll(np.arange(n_ph), -1)],
               idx[:-1, np.roll(np.arange(n_ph), -1)]], -1).reshape(-1, 3)
faces = np.concatenate([f0, f1]).astype(np.int32)
print(f"V={len(verts)} F={len(faces)}", flush=True)

pose = jnp.asarray([[1, 0, 0, 0], [0, 1, 0, 0], [0, 0, 1, 2.2]], jnp.float32)
intr = jnp.asarray([600.0, 600.0, 256.0, 256.0])
verts = jnp.asarray(verts)
faces = jnp.asarray(faces)
fvalid = jnp.ones((faces.shape[0],), bool)

cfg0 = RasterConfig(height=512, width=512, span=2, k_per_tile=768,
                    tile_chunk=64)


def timeit(f, *a, n=8):
    float(jnp.sum(f(*a)["z"]) if isinstance(f(*a), dict) else 0)
    t0 = time.perf_counter()
    for _ in range(n):
        out = f(*a)
        float(jnp.sum(out["z"] if isinstance(out, dict) else out))
    return (time.perf_counter() - t0) / n


for backend in ("xla", "pallas"):
    cfg = replace(cfg0, backend=backend)

    @jax.jit
    def fwd(v):
        return rasterize(project_mesh(v, pose, intr), faces, fvalid, cfg)

    @jax.jit
    def fwd_bwd(v):
        def loss(v):
            r = rasterize(project_mesh(v, pose, intr), faces, fvalid, cfg)
            return jnp.sum(r["alpha"]) + jnp.sum(r["z"]) + jnp.sum(r["bary"])
        return jax.grad(loss)(v)

    t0 = time.perf_counter()
    rf = fwd(verts)
    jax.block_until_ready(rf)
    print(f"[{backend}] fwd compile {time.perf_counter()-t0:.0f}s; "
          f"covered px={int(jnp.sum(rf['alpha_hard']))}", flush=True)
    dt = timeit(fwd, verts)
    t0 = time.perf_counter()
    g = fwd_bwd(verts)
    jax.block_until_ready(g)
    print(f"[{backend}] bwd compile {time.perf_counter()-t0:.0f}s", flush=True)
    t0 = time.perf_counter()
    for _ in range(8):
        g = fwd_bwd(verts)
        float(jnp.sum(g))
    dtb = (time.perf_counter() - t0) / 8
    print(f"[{backend}] fwd {dt*1e3:.1f} ms, fwd+bwd {dtb*1e3:.1f} ms",
          flush=True)
