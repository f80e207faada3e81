"""Split the dense-pyramid field encode cost on the real chip.

The NeRF fit step (PERF.md: ~1.9 s at the production config) evaluates
`dense_grid_encode` on patch_size^2 x num_samples points per step, fwd and
bwd. This isolates where that time goes:

  fwd            — 16 gathers/point (2 levels x 8 corners)
  bwd wrt xyz    — same gathers again (no scatter)
  bwd wrt table  — 16 scatter-adds/point into the (R+1)^3 tables

plus the same split for the full field decode (encode + MLP) and one
production-shape fit-step equivalent.
"""
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

from mvedit_tpu.ops.dense_grid import (DenseGridConfig, dense_grid_init,
                                       dense_grid_encode)


def timeit(fn, *a, n=10):
    out = fn(*a)
    float(jnp.sum(jax.tree_util.tree_leaves(out)[0]))
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*a)
        float(jnp.sum(jax.tree_util.tree_leaves(out)[0]))
    return (time.perf_counter() - t0) / n


P = 128 * 128 * 128  # patch 128^2 x 128 samples = 2.1M points
cfg = DenseGridConfig()  # (32, 160), 8 features
tables = dense_grid_init(jax.random.PRNGKey(0), cfg)
xyz = jax.random.uniform(jax.random.PRNGKey(1), (P, 3))

fwd = jax.jit(lambda t, x: dense_grid_encode(t, x, cfg))
bwd_xyz = jax.jit(jax.grad(lambda x, t: jnp.sum(
    dense_grid_encode(t, x, cfg)), argnums=0))
bwd_tab = jax.jit(jax.grad(lambda t, x: jnp.sum(
    dense_grid_encode(t, x, cfg)), argnums=0))

for tag, fn, args in (
    ("fwd (16 gathers/pt)", fwd, (tables, xyz)),
    ("bwd wrt xyz (gathers only)", bwd_xyz, (xyz, tables)),
    ("bwd wrt tables (scatter-add)", bwd_tab, (tables, xyz)),
):
    dt = timeit(fn, *args)
    print(f"{tag}: {dt * 1e3:.1f} ms  ({P / dt / 1e6:.0f} Mpt/s)",
          flush=True)

# per-level split: coarse-only vs fine-only
for tag, c in (("coarse 32 only", DenseGridConfig(resolutions=(32,))),
               ("fine 160 only", DenseGridConfig(resolutions=(160,)))):
    tabs = dense_grid_init(jax.random.PRNGKey(0), c)
    f = jax.jit(lambda t, x, c=c: dense_grid_encode(t, x, c))
    g = jax.jit(jax.grad(lambda t, x, c=c: jnp.sum(
        dense_grid_encode(t, x, c)), argnums=0))
    print(f"{tag}: fwd {timeit(f, tabs, xyz)*1e3:.1f} ms, "
          f"bwd-tab {timeit(g, tabs, xyz)*1e3:.1f} ms", flush=True)

# gather dtype ablation on the fine level
for gd in ("bfloat16", "float32"):
    c = DenseGridConfig(resolutions=(160,), gather_dtype=gd)
    tabs = dense_grid_init(jax.random.PRNGKey(0), c)
    f = jax.jit(lambda t, x, c=c: dense_grid_encode(t, x, c))
    print(f"fine-only fwd gather_dtype={gd}: "
          f"{timeit(f, tabs, xyz)*1e3:.1f} ms", flush=True)

# corner-fold sweep: fold-fewer / fold-wider gather rows, and fold-fewer
# scatter-add rows on the table backward (round-3 optimization)
for fold in (1, 2, 4, 8):
    c = DenseGridConfig(fold=fold)
    tabs = dense_grid_init(jax.random.PRNGKey(0), c)
    f = jax.jit(lambda t, x, c=c: dense_grid_encode(t, x, c))
    g = jax.jit(jax.grad(lambda t, x, c=c: jnp.sum(
        dense_grid_encode(t, x, c)), argnums=0))
    fb = jax.jit(jax.grad(lambda t, x, c=c: jnp.sum(
        dense_grid_encode(t, x, c)), argnums=(0, 1)))
    print(f"fold={fold}: fwd {timeit(f, tabs, xyz)*1e3:.1f} ms, "
          f"bwd-tab {timeit(g, tabs, xyz)*1e3:.1f} ms, "
          f"bwd-both {timeit(fb, tabs, xyz)*1e3:.1f} ms", flush=True)
