"""Phase profile of the DMTet mesh-fit step at production scale (tet 128,
512^2, render_bs 2) — the single largest e2e cost (PERF.md: ~7.2 s/step).

Times, separately:
  1. marching_tets_compact extraction (fwd only)
  2. rasterize+shade render fwd of the extracted mesh
  3. one full fit step (value_and_grad + adam)
  4. an 8-step fit program (the pipeline's fit_steps_per_program),
     amortized per step
"""
import argparse
import time

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

from mvedit_tpu.models.mesh.dmtet import build_grid_tets
from mvedit_tpu.models.mesh.structured_tets import StructuredTetGrid
from mvedit_tpu.models import mesh_fit as MF
from mvedit_tpu.models.mesh.rasterize import RasterConfig
from mvedit_tpu.models.mesh.renderer import render_views
from mvedit_tpu.models.fields import INGPConfig, ingp_init, ingp_point_decode
from mvedit_tpu.ops.dense_grid import DenseGridConfig
from mvedit_tpu.apis.cameras import surround_rig
from mvedit_tpu.utils import camera as cam_utils

ap = argparse.ArgumentParser()
ap.add_argument("--res", type=int, default=128)
ap.add_argument("--size", type=int, default=512)
ap.add_argument("--steps", type=int, default=8)
ap.add_argument("--no-lpips", action="store_true")
ap.add_argument("--generic-grid", action="store_true",
                help="use the table-driven TetGrid instead of structured")
ap.add_argument("--variants", default=None,
                help="comma list of ablation variants to run (skips the "
                     "main phase timings)")
ap.add_argument("--normals", action="store_true",
                help="add normal-map targets (production: r4 all-view "
                     "normal supervision adds a tv_loss per step)")
args = ap.parse_args()

res, size = args.res, args.size
print(f"tet res {res}, render {size}^2", flush=True)

grid = build_grid_tets(res) if args.generic_grid \
    else StructuredTetGrid(res)
print(f"grid: V={len(grid.verts)} structured={not args.generic_grid}",
      flush=True)

ingp = INGPConfig(backend="dense",
                  dense=DenseGridConfig(resolutions=(32, 160)))
key = jax.random.PRNGKey(0)
field = ingp_init(key, ingp)

vert_cap = 1 << max(9, (16 * res * res - 1).bit_length())
rc = RasterConfig(height=size, width=size, span=2,
                  k_per_tile=768 if size >= 256 else 256,
                  tile_chunk=64 if size >= 512 else 256)
mcfg = MF.MeshFitConfig(raster=rc, n_steps=args.steps,
                        patch_size=min(128, size),
                        vert_cap=vert_cap,
                        face_cap=vert_cap + (vert_cap >> 1))


def color_fn(p, x):
    return ingp_point_decode(p, x, ingp)[1]


fit, opt, extract = MF.make_mesh_fit(grid, color_fn, mcfg)

# sphere-ish sdf + targets
v = np.asarray(grid.verts)
sdf0 = (0.7 - np.linalg.norm(v, axis=-1)).astype(np.float32)
state = {"field": field, "sdf": jnp.asarray(sdf0),
         "deform": jnp.zeros((len(v), 3), jnp.float32)}

N = 8
rng = np.random.default_rng(0)
poses, intr = surround_rig(N, 2.5, 40, 0.0, 0.3, size, rng=rng)
lights, _ = cam_utils.light_sampling(poses, rng=rng)
targets = {"images": jnp.full((N, size, size, 3), 0.5),
           "masks": jnp.ones((N, size, size, 1)),
           "poses": jnp.asarray(poses), "intrinsics": jnp.asarray(intr),
           "cam_weights": jnp.ones((N,)), "cam_lights": jnp.asarray(lights)}
if args.normals:
    targets["normals"] = jnp.full((N, size, size, 3), 0.5)
    targets["normal_weights"] = jnp.ones((N,))

lpips_params = None
if not args.no_lpips:
    from mvedit_tpu.models.losses import lpips_init
    lpips_params = lpips_init(jax.random.PRNGKey(1))


def _sync(out):
    # block_until_ready does NOT synchronize through the axon tunnel
    # (PERF.md): a scalar readback is the only honest barrier
    leaves = jax.tree_util.tree_leaves(out)
    for x in leaves:
        if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating):
            float(jnp.sum(x))
            return
    jax.block_until_ready(out)


def tmit(f, *a, n=4, **kw):
    out = f(*a, **kw)
    _sync(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = f(*a, **kw)
        _sync(out)
    return (time.perf_counter() - t0) / n, out


if args.variants is None:
    _skip = False
else:
    _skip = True

# 1. extract fwd
if not _skip:
    t, mt = tmit(extract, state)
    nv = int(jnp.sum(mt["vert_mask"])) if "vert_mask" in mt else -1
    nf = int(jnp.sum(mt["face_mask"]))
    print(f"extract fwd: {t*1e3:.1f} ms (V={mt['verts'].shape[0]} "
          f"used={nv}, F={mt['faces'].shape[0]} used={nf})", flush=True)


# 2. render fwd (raster + field shading), render_bs views
if not _skip:
    @jax.jit
    def render_fwd(state, mt):
        def shading_fun(xyz, normal, view_dir):
            return color_fn(state["field"], xyz)
        return render_views(mt["verts"], mt["faces"], mt["face_mask"],
                            targets["poses"][:mcfg.render_bs],
                            targets["intrinsics"][:mcfg.render_bs],
                            rc, shading_fun=shading_fun)["rgb"]

    t, _ = tmit(render_fwd, state, mt)
    print(f"render fwd ({mcfg.render_bs} views): {t*1e3:.1f} ms",
          flush=True)

# 3/4. fit programs
fit1, _, _ = MF.make_mesh_fit(grid, color_fn,
                              MF.MeshFitConfig(
                                  raster=rc, n_steps=1,
                                  patch_size=min(128, size),
                                  vert_cap=vert_cap,
                                  face_cap=vert_cap + (vert_cap >> 1)))
def time_fit(f, label, n_steps, n=3):
    # the fit donates (state, opt_state): thread outputs through the loop
    s = jax.tree_util.tree_map(jnp.copy, state)
    os_ = opt.init(s)
    t0 = time.perf_counter()
    s, os_, out = f(s, os_, targets, jax.random.PRNGKey(2),
                    lpips_params=lpips_params)
    _sync(out)
    print(f"{label} compile+run: {time.perf_counter()-t0:.0f} s",
          flush=True)
    t0 = time.perf_counter()
    for i in range(n):
        s, os_, out = f(s, os_, targets, jax.random.PRNGKey(3 + i),
                        lpips_params=lpips_params)
        _sync(out)
    dt = (time.perf_counter() - t0) / n
    print(f"{label}: {dt*1e3:.1f} ms ({dt*1e3/n_steps:.1f} ms/step)",
          flush=True)


if not _skip:
    time_fit(fit1, "fit 1-step", 1)
    time_fit(fit, f"fit {args.steps}-step", args.steps, n=2)

# ---- ablations: where does the backward go? -----------------------------
if True:
    def run_variant(label, color, mcfg_kw=None, lp=None, n_steps=1):
        kw = dict(raster=rc, n_steps=n_steps, patch_size=min(128, size),
                  vert_cap=vert_cap, face_cap=vert_cap + (vert_cap >> 1))
        kw.update(mcfg_kw or {})
        f, o, _ = MF.make_mesh_fit(grid, color, MF.MeshFitConfig(**kw))
        s = jax.tree_util.tree_map(jnp.copy, state)
        os_ = o.init(s)
        s, os_, out = f(s, os_, targets, jax.random.PRNGKey(2),
                        lpips_params=lp)
        _sync(out)
        t0 = time.perf_counter()
        for i in range(3):
            s, os_, out = f(s, os_, targets, jax.random.PRNGKey(3 + i),
                            lpips_params=lp)
            _sync(out)
        dt = (time.perf_counter() - t0) / 3
        per = f" ({dt*1e3/n_steps:.1f} ms/step)" if n_steps > 1 else ""
        print(f"ablate[{label}]: {dt*1e3:.1f} ms{per}", flush=True)

    const_color = lambda p, x: jnp.full(x.shape[:-1] + (3,), 0.5)  # noqa
    VARIANTS = {
        "lpips": lambda: run_variant("full+lpips", color_fn,
                                     lp=lpips_params),
        "full": lambda: run_variant("full", color_fn),
        "nofield": lambda: run_variant("no-field (const color)",
                                       const_color),
        "noreg": lambda: run_variant(
            "no-reg (16 faces)", color_fn,
            dict(reg_face_samples=16, normal_consistency_weight=0.0)),
        "noshade": lambda: run_variant("no-shading", color_fn,
                                       dict(shaded=False)),
        # r4: frozen topology (integer extraction once per program; only
        # the vertex lerp per step)
        "frozen": lambda: run_variant("frozen-topology", color_fn,
                                      dict(freeze_topology=True)),
        "frozen8": lambda: run_variant("frozen-topology 8-step", color_fn,
                                       dict(freeze_topology=True,
                                            n_steps=8), n_steps=8),
        "full8": lambda: run_variant("full 8-step", color_fn,
                                     dict(n_steps=8), n_steps=8),
        "adam": lambda: probe_adam(),
        # r5 attribution of the ~300 ms "losses/solver/sample" remainder:
        # norender8 monkeypatches render_views with a shape-correct fake
        # (grad paths to verts + field kept alive through scalars), so it
        # times EVERYTHING except raster+shade: sample_batch + frozen-topo
        # verts lerp + tonemap/l1/tv losses + regularizers + Adam
        "norender8": lambda: run_norender(),
        "sample": lambda: probe_sample(),
        "lerp": lambda: probe_lerp(),
    }

    def run_norender():
        real = MF.render_views

        def fake_render_views(verts, faces, face_mask, poses_c2w,
                              intrinsics, rcfg, shading_fun=None, ssaa=1,
                              bg_color=1.0, **kw):
            n = poses_c2w.shape[0]
            H, W = rcfg.height, rcfg.width
            g = jnp.tanh(jnp.mean(verts)) * 0.01
            s = 0.0
            if shading_fun is not None:
                tap = shading_fun(jnp.zeros((1, 1, 1, 3)),
                                  jnp.zeros((1, 1, 1, 3)),
                                  jnp.zeros((1, 1, 1, 3)))
                s = jnp.mean(tap) * 0.01
            base = g + s
            return {"alpha": jnp.full((n, H, W, 1), 0.5) + base,
                    "alpha_hard": jnp.full((n, H, W, 1), 1.0),
                    "rgb": jnp.full((n, H, W, 3), 0.5) + base,
                    "normal": jnp.full((n, H, W, 3), 0.577) + base,
                    "xyz": jnp.full((n, H, W, 3), 0.0) + base,
                    "depth": jnp.full((n, H, W), 2.5)}

        MF.render_views = fake_render_views
        try:
            # lp=None to match the frozen8 arm (lpips itself is +9 ms)
            run_variant("norender 8-step (frozen)", color_fn,
                        dict(freeze_topology=True, n_steps=8),
                        n_steps=8)
        finally:
            MF.render_views = real

    def probe_sample():
        # the per-step target-view gather + categorical draw, alone
        @jax.jit
        def samp(key, targets):
            p = (targets["cam_weights"] > 0).astype(jnp.float32)
            ids = jax.random.categorical(
                key, jnp.log(jnp.clip(p, 1e-9, None))[None].repeat(
                    mcfg.render_bs, 0))
            tot = 0.0
            for k in ("images", "masks", "poses", "intrinsics",
                      "cam_weights", "cam_lights"):
                tot = tot + jnp.sum(targets[k][ids])
            return tot

        t, _ = tmit(samp, jax.random.PRNGKey(0), targets, n=10)
        print(f"probe[sample_batch gather]: {t*1e3:.1f} ms", flush=True)

    def probe_lerp():
        # frozen-topology per-step geometry: marching_tets_verts fwd+bwd
        from mvedit_tpu.models.mesh.structured_tets import (
            marching_tets_topology, marching_tets_verts)
        if args.generic_grid:
            print("probe[lerp]: structured only", flush=True)
            return
        cell = 2.0 / grid.resolution
        topo = jax.jit(lambda s: marching_tets_topology(
            grid, grid.arrays(), s, vert_cap=vert_cap,
            face_cap=vert_cap + (vert_cap >> 1)))(state["sdf"])

        @jax.jit
        def lerp_vg(sdf, deform):
            def f(sdf, deform):
                d = jnp.tanh(deform) * (0.5 * cell)
                return jnp.sum(marching_tets_verts(grid, topo, sdf,
                                                   deform=d))
            l, g = jax.value_and_grad(f, argnums=(0, 1))(sdf, deform)
            return l, g

        t, _ = tmit(lerp_vg, state["sdf"], state["deform"], n=10)
        print(f"probe[verts-lerp fwd+bwd]: {t*1e3:.1f} ms", flush=True)

    def probe_adam():
        # standalone Adam cost on the production-shaped state (field
        # tables + sdf + deform): is the solver part of the ~300 ms
        # residual?
        import optax
        oo = optax.scale_by_adam(b1=0.9, b2=0.99, eps=1e-15)
        s = jax.tree_util.tree_map(jnp.copy, state)
        os_ = oo.init(s)
        gr = jax.tree_util.tree_map(lambda x: jnp.full_like(x, 1e-4), s)

        @jax.jit
        def upd(s, os_, gr):
            u, os_ = oo.update(gr, os_, s)
            u = jax.tree_util.tree_map(lambda x: x * -0.01, u)
            return optax.apply_updates(s, u), os_

        s, os_ = upd(s, os_, gr)
        _sync(s)
        t0 = time.perf_counter()
        for _ in range(5):
            s, os_ = upd(s, os_, gr)
            _sync(s)
        print(f"probe[adam update]: "
              f"{(time.perf_counter()-t0)/5*1e3:.1f} ms", flush=True)
    names = (args.variants.split(",") if args.variants
             else list(VARIANTS))
    for nme in names:
        VARIANTS[nme]()
