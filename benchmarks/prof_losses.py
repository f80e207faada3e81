"""Loss-side attribution of the mesh-fit step (r5).

prof_mesh_fit's norender8 ablation showed the NON-render half of the
frozen step is 543 ms/step — bigger than raster+shading (383 ms). This
probes each loss-side piece fwd+bwd at the production shape
(render_bs 2, 512^2, 131072 reg faces, tet-128 buffer caps), amortized
inside one jit (K chained iterations) so the ~27 ms tunnel dispatch
does not swamp 10-ms measurements.
"""
import argparse
import time

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

from mvedit_tpu.ops.tonemapping import Tonemapping
from mvedit_tpu.models import losses as L
from mvedit_tpu.models import mesh_fit as MF

ap = argparse.ArgumentParser()
ap.add_argument("--k", type=int, default=8, help="chained reps per jit")
args = ap.parse_args()
K = args.k

B, H, W = 2, 512, 512
V, Fr = 262144, 131072  # vert buffer, sampled reg faces
tm = Tonemapping()
key = jax.random.PRNGKey(0)
ks = jax.random.split(key, 8)
rgb = jax.random.uniform(ks[0], (B, H, W, 3), minval=0.05, maxval=0.95)
alpha = jax.random.uniform(ks[1], (B, H, W, 1))
nrm = jax.random.normal(ks[2], (B, H, W, 3))
tgt_rgb = jax.random.uniform(ks[3], (B, H, W, 3))
tgt_n = jax.random.uniform(ks[4], (B, H, W, 3))
verts = jax.random.normal(ks[5], (V, 3)) * 0.5
faces = jax.random.randint(ks[6], (Fr, 3), 0, V)
fmask = jnp.ones((Fr,), bool)
vmask = jnp.ones((V,), bool)
lights = jnp.asarray([[0.0, 0.0, 1.0]] * B)
w = jnp.ones((B, 1, 1, 1))


def amortized(label, f, *xs, n=4):
    """f(*xs) -> scalar; times K chained evaluations inside one jit."""
    @jax.jit
    def chain(*xs):
        def body(i, acc):
            return acc + f(*[x * (1.0 + 1e-9 * acc) if x.dtype.kind == "f"
                             else x for x in xs])
        return jax.lax.fori_loop(0, K, body, 0.0)

    float(chain(*xs))
    t0 = time.perf_counter()
    for _ in range(n):
        float(chain(*xs))
    dt = (time.perf_counter() - t0) / n / K
    print(f"{label}: {dt*1e3:.1f} ms", flush=True)
    return dt


# 1. the shaded-composite tonemap block exactly as mesh_fit computes it
def tonemap_block(albedo, alpha, n_img):
    def f(albedo):
        lam = jnp.clip(jnp.sum(lights[:, None, None, :] * n_img, axis=-1,
                               keepdims=True), 0.0, None)
        shading = lam * 0.7 + 0.3
        fg = jnp.clip((albedo - (1 - alpha)) / jnp.clip(alpha, 1e-6, None),
                      1e-4, 1.0)
        out = tm.lut(tm.inverse_lut(fg)
                     + jnp.log2(jnp.clip(shading, 1e-6, None)))
        return jnp.sum(out * alpha + (1 - alpha))
    return jax.grad(f)(albedo).sum()


amortized("tonemap composite fwd+bwd (2x512^2)", tonemap_block,
          rgb, alpha, nrm)


# 2. l1 x2 + tv normal losses
def pix_losses(rgb_in, alpha_in, nrm_in):
    def f(rgb_in):
        t = L.l1_loss(rgb_in, tgt_rgb, weight=w) * 4.5
        t += L.l1_loss(alpha_in, alpha, weight=w)
        nx = jnp.moveaxis(nrm_in * (1 + 0 * rgb_in[..., :1]), -1, 1)
        nt = jnp.moveaxis(tgt_n, -1, 1) * 2 - 1
        t += L.tv_loss(nx, nt, power=1.5) * 4.0
        return t
    return jax.grad(f)(rgb_in).sum()


amortized("l1 x2 + normal tv fwd+bwd", pix_losses, rgb, alpha, nrm)


# 3. regularizers on the 131k face sample
def regs(verts_in):
    def f(verts_in):
        t = MF.laplacian_loss(verts_in, faces, fmask, vmask) * 0.25
        t += MF.normal_consistency_loss(verts_in, faces, fmask) * 0.25
        return t
    return jax.grad(f)(verts_in).sum()


amortized("laplacian + NC fwd+bwd (131k faces)", regs, verts)


# 4. the reg-face subsample gather itself
def reg_gather(big_faces):
    rf = jax.random.randint(jax.random.PRNGKey(1), (Fr,), 0,
                            big_faces.shape[0])
    return jnp.sum(big_faces[rf])


big_faces = jax.random.randint(ks[7], (393216, 3), 0, V)
amortized("reg-face subsample gather", lambda bf: reg_gather(bf) * 1.0,
          big_faces.astype(jnp.float32))
