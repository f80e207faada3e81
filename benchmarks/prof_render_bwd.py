"""Micro-profile of render_views' backward suspects at mesh-fit scale:
vertex_normals (scatter-add over 393k faces into 262k verts) and
interpolate's VJP (scatter-add of 512^2 pixel grads into verts).
"""
import time
import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

from mvedit_tpu.models.mesh.renderer import vertex_normals

V, F, P = 262144, 393216, 512 * 512
rng = np.random.default_rng(0)
verts = jnp.asarray(rng.random((V, 3)), jnp.float32)
faces = jnp.asarray(rng.integers(0, V, (F, 3)), jnp.int32)
fmask = jnp.ones((F,), jnp.float32)
pix_tri = jnp.asarray(rng.integers(0, F, (P,)), jnp.int32)
bary = jnp.asarray(rng.random((P, 2)), jnp.float32)
gout = jnp.asarray(rng.random((P, 3)), jnp.float32)


def tmit(f, *a, n=5):
    # scalar readback barrier (block_until_ready lies through the tunnel)
    def run():
        out = f(*a)
        float(jnp.sum(out))
    run()
    t0 = time.perf_counter()
    for _ in range(n):
        run()
    return (time.perf_counter() - t0) / n


@jax.jit
def vn_fwd(v):
    return vertex_normals(v, faces, fmask)


@jax.jit
def vn_bwd(v):
    return jax.grad(lambda vv: jnp.sum(vn_fwd(vv) * gout[:V]))(v)


@jax.jit
def interp_fwd(v):
    fw = faces[pix_tri]
    u = bary[:, 0:1]
    w = bary[:, 1:2]
    return v[fw[:, 0]] * (1 - u - w) + v[fw[:, 1]] * u + v[fw[:, 2]] * w


@jax.jit
def interp_bwd(v):
    return jax.grad(lambda vv: jnp.sum(interp_fwd(vv) * gout))(v)


print(f"vertex_normals fwd: {tmit(vn_fwd, verts)*1e3:.1f} ms", flush=True)
print(f"vertex_normals fwd+bwd: {tmit(vn_bwd, verts)*1e3:.1f} ms",
      flush=True)
print(f"interpolate fwd (P={P}): {tmit(interp_fwd, verts)*1e3:.1f} ms",
      flush=True)
print(f"interpolate fwd+bwd: {tmit(interp_bwd, verts)*1e3:.1f} ms",
      flush=True)

# padded-channel variants: does the (N, 3) minor dim cause the cost?
verts4 = jnp.pad(verts, ((0, 0), (0, 1)))
gout4 = jnp.pad(gout, ((0, 0), (0, 1)))


@jax.jit
def vn4_bwd(v):
    def f(vv):
        v0 = vv[faces[:, 0]]
        v1 = vv[faces[:, 1]]
        v2 = vv[faces[:, 2]]
        fn = jnp.cross(v1[:, :3] - v0[:, :3], v2[:, :3] - v0[:, :3])
        fn = jnp.pad(fn, ((0, 0), (0, 1)))
        vn = jnp.zeros_like(vv)
        for i in range(3):
            vn = vn.at[faces[:, i]].add(fn)
        return jnp.sum(vn * gout4[:V])
    return jax.grad(f)(v)


print(f"vertex_normals4 fwd+bwd: {tmit(vn4_bwd, verts4)*1e3:.1f} ms",
      flush=True)

# single fused scatter (3F updates in one call) vs 3 separate
@jax.jit
def vn_fused(v):
    v0 = v[faces[:, 0]]
    v1 = v[faces[:, 1]]
    v2 = v[faces[:, 2]]
    fn = jnp.cross(v1 - v0, v2 - v0)
    idx = faces.T.reshape(-1)
    upd = jnp.tile(fn, (3, 1))
    return jax.ops.segment_sum(upd, idx, num_segments=V)


print(f"vertex_normals fused-segsum fwd: {tmit(vn_fused, verts)*1e3:.1f} ms",
      flush=True)
