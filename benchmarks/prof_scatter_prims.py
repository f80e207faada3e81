"""Microbench of scatter/sort/gather primitives at mesh-fit backward sizes.

Decides the implementation of the interpolate/vertex_normals backward:
  N = 786k rows (512^2 x 3 corners), V = 262k verts, C = 6 channels.
"""
import time

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

N = 512 * 512 * 3
V = 262144
F = 393216
rng = np.random.default_rng(0)
idx = jnp.asarray(rng.integers(0, V, N).astype(np.int32))
fidx = jnp.asarray(rng.integers(0, F, 512 * 512).astype(np.int32))
vals = jnp.asarray(rng.normal(size=(N, 6)).astype(np.float32))
vals18 = jnp.asarray(rng.normal(size=(512 * 512, 18)).astype(np.float32))
vals_f = jnp.asarray(rng.normal(size=(3 * F, 6)).astype(np.float32))
faces = jnp.asarray(rng.integers(0, V, (F, 3)).astype(np.int32))


def tmit(label, f, *a, n=5):
    out = f(*a)
    float(jnp.sum(jax.tree_util.tree_leaves(out)[0].astype(jnp.float32)))
    t0 = time.perf_counter()
    for _ in range(n):
        out = f(*a)
        float(jnp.sum(
            jax.tree_util.tree_leaves(out)[0].astype(jnp.float32)))
    print(f"{label}: {(time.perf_counter() - t0) / n * 1e3:.1f} ms",
          flush=True)


tmit("scatter-add (786k rows, 6ch -> 262k)",
     jax.jit(lambda i, v: jnp.zeros((V, 6)).at[i].add(v)), idx, vals)
tmit("scatter-add (262k rows, 18ch -> 393k faces)",
     jax.jit(lambda i, v: jnp.zeros((F, 18)).at[i].add(v)), fidx, vals18)
tmit("scatter-add (1.18M rows, 6ch -> 262k)",
     jax.jit(lambda i, v: jnp.zeros((V, 6)).at[i.reshape(-1)].add(v)),
     faces, vals_f)
tmit("argsort 786k int32", jax.jit(lambda i: jnp.argsort(i)), idx)
tmit("sort pairs (786k)", jax.jit(
    lambda i: jax.lax.sort((i, jnp.arange(N, dtype=jnp.int32)),
                           num_keys=1)), idx)
tmit("gather rows (786k x 6)",
     jax.jit(lambda v, o: v[o]), vals,
     jnp.asarray(rng.permutation(N).astype(np.int32)))
tmit("cumsum (786k x 6)", jax.jit(lambda v: jnp.cumsum(v, axis=0)), vals)
tmit("searchsorted (262k in 786k)",
     jax.jit(lambda i, t: jnp.searchsorted(i, t)),
     jnp.sort(idx), jnp.arange(V, dtype=jnp.int32))
# one-hot matmul aggregation per tile: (K=832 cand x P=256 px) @ (P, 6)
best = jnp.asarray(rng.integers(0, 832, (1024, 256)).astype(np.int32))
gpx = jnp.asarray(rng.normal(size=(1024, 256, 6)).astype(np.float32))


@jax.jit
def onehot_agg(best, gpx):
    oh = (best[:, :, None] == jnp.arange(832)[None, None]) \
        .astype(jnp.float32)                      # (T, P, K)
    return jnp.einsum("tpk,tpc->tkc", oh, gpx)    # (T, K, 6)


tmit("one-hot matmul agg (1024 tiles, 256px, 832cand)", onehot_agg,
     best, gpx)
