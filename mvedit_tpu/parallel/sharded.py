"""Device-mesh sharding for the MVEdit hot loops.

The reference's only parallelism is NCCL data-parallel DDP (SURVEY §2.7);
TPU-native replacement is single-program pjit over a `jax.sharding.Mesh`:

- **denoise step**: the view axis (N cameras x CFG) is the natural shard
  axis (`dp`). Joint cross-image attention folds views into the sequence
  axis, so XLA inserts the all-gather over ICI exactly where views meet;
  params are replicated.
- **NeRF fit step**: ray patches shard over `dp`; the mean loss makes XLA
  emit a gradient psum (DDP equivalent, but inside one compiled program).

`dryrun(n)` — used by the driver's `dryrun_multichip` — builds an n-device
mesh and runs BOTH sharded steps once on tiny shapes.
"""
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["make_mesh", "make_sharded_denoise_step",
           "make_sharded_nerf_step", "dryrun", "dryrun_pipeline"]


def make_mesh(n_devices=None, axis="dp", devices=None):
    devices = devices if devices is not None else jax.devices()[:n_devices]
    return Mesh(np.asarray(devices), (axis,))


def make_sharded_denoise_step(net, mesh, mode, guidance_scale=7.5):
    """Jitted CFG denoise forward with the batch/view axis sharded."""
    batch_sharded = NamedSharding(mesh, P("dp"))
    replicated = NamedSharding(mesh, P())

    @partial(jax.jit,
             in_shardings=(replicated, batch_sharded, batch_sharded,
                           batch_sharded),
             out_shardings=batch_sharded)
    def step(params, lat, t, ctx):
        eps = net.apply(params, lat, t, ctx, mode=mode)
        eps_u, eps_c = jnp.split(eps, 2, axis=0)
        g = eps_u + guidance_scale * (eps_c - eps_u)
        return jnp.concatenate([g, g], axis=0)

    return step


def make_sharded_nerf_step(point_decode_fn, render_cfg, mesh, lr=1e-2):
    """One sharded NeRF optimization step: rays sharded over dp, params
    replicated, gradient psum inserted by XLA."""
    from ..models.volume_renderer import render_rays

    batch_sharded = NamedSharding(mesh, P("dp"))
    replicated = NamedSharding(mesh, P())
    opt = optax.adam(lr)

    @partial(jax.jit,
             in_shardings=(replicated, replicated, batch_sharded,
                           batch_sharded, batch_sharded),
             out_shardings=(replicated, replicated, replicated),
             donate_argnums=(0, 1))
    def step(params, opt_state, rays_o, rays_d, target_rgb):
        def loss_fn(p):
            out = render_rays(partial(point_decode_fn, p), rays_o, rays_d,
                              render_cfg, bg_color=1.0)
            return jnp.mean(jnp.abs(out["rgb"] - target_rgb))

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return step, opt


def dryrun(n_devices: int) -> None:
    """Driver hook: build an n-device mesh and pjit-run the two sharded
    hot-loop steps the production pipeline uses when `models.device_mesh`
    is set — one CFG denoise forward (view axis sharded over 'dp', joint
    cross-image attention all-gathering over ICI) and one NeRF fit step
    (ray axis sharded, gradient psum).

    Deliberately cheap (two small compiles): the driver runs this COLD in
    a bounded budget. The full tiny pipeline over the mesh lives in
    `dryrun_pipeline` and is exercised by the slow-marked pytest
    (tests/test_parallel.py) instead.
    """
    # the axon sitecustomize registers its TPU backend regardless of
    # JAX_PLATFORMS; force the virtual CPU mesh BEFORE any device query
    # (jax.devices() itself initializes backends and locks the config)
    try:
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_num_cpu_devices", n_devices)
    except RuntimeError:
        pass  # backends already up; fall through to the count check
    try:  # persistent compile cache: repeat runs skip XLA entirely
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    if len(jax.devices()) < n_devices:
        raise RuntimeError(
            f"dryrun needs {n_devices} devices but only "
            f"{len(jax.devices())} exist and backends are already "
            "initialized; run dryrun_multichip in a fresh process")

    mesh = make_mesh(n_devices)
    assert len(mesh.devices.ravel()) == n_devices, \
        f"mesh has {len(mesh.devices.ravel())} devices, wanted {n_devices}"

    from ..models.diffusion import AttnMode
    from ..models.fields import ingp_init, ingp_point_decode
    from ..testing import make_tiny_models, TINY_INGP

    key = jax.random.PRNGKey(0)
    m = make_tiny_models(key, n_cn=0)

    # --- sharded CFG denoise step: 2N = n_devices images, one per chip ---
    N = n_devices // 2
    mode = AttnMode(num_views=N)
    step = make_sharded_denoise_step(m.unet, mesh, mode)
    lat = jax.random.normal(key, (2 * N, 8, 8, 4))
    t = jnp.full((2 * N,), 500, jnp.int32)
    ctx = jnp.zeros((2 * N, 8, 32))
    eps = step({"params": m.unet_params}, lat, t, ctx)
    jax.block_until_ready(eps)
    assert eps.shape == lat.shape and bool(jnp.isfinite(eps).all())

    # --- sharded NeRF fit step: rays over dp, params replicated ---
    fparams = ingp_init(key, TINY_INGP)
    from ..models.volume_renderer import RenderConfig
    rcfg = RenderConfig(num_samples=8, grid_size=8)

    def point_decode(p, xyz):
        return ingp_point_decode(p, xyz, TINY_INGP)

    nerf_step, opt = make_sharded_nerf_step(point_decode, rcfg, mesh)
    R = 8 * n_devices
    rays_o = jnp.tile(jnp.array([[0.0, 0.0, -2.0]]), (R, 1))
    rays_d = jnp.concatenate(
        [jnp.zeros((R, 2)), jnp.ones((R, 1))], axis=-1)
    target = jnp.full((R, 3), 0.5)
    opt_state = opt.init(fparams)
    fparams2, opt_state, loss = nerf_step(
        fparams, opt_state, rays_o, rays_d, target)
    jax.block_until_ready(loss)
    assert bool(jnp.isfinite(loss))

    # --- sharded DMTet mesh fit step: pixel rows + reg faces over dp ---
    # (make_mesh_fit(mesh=...): the e2e dominator phase; sharding it is
    # the 8-chip strategy's load-bearing piece, so the driver gate runs
    # one tiny sharded fit program, not just denoise + NeRF)
    from ..models import mesh_fit as MF
    from ..models.mesh.rasterize import RasterConfig
    from ..models.mesh.structured_tets import StructuredTetGrid
    from ..models.fields import ingp_point_decode as ipd
    from ..apis.cameras import surround_rig
    from ..utils import camera as cam_utils

    tgrid = StructuredTetGrid(8)
    mcfg = MF.MeshFitConfig(
        raster=RasterConfig(height=n_devices * 4, width=n_devices * 4,
                            k_per_tile=64, k_big=16),
        n_steps=1, render_bs=2, reg_face_samples=n_devices * 16,
        vert_cap=512, face_cap=1024, patch_size=n_devices * 4,
        freeze_topology=True)
    mfit, mopt, _ = MF.make_mesh_fit(
        tgrid, lambda p, x: ipd(p, x, TINY_INGP)[1], mcfg, mesh=mesh)
    gv = np.asarray(tgrid.verts)
    mstate = {"field": fparams2,
              "sdf": jnp.asarray(0.6 - np.linalg.norm(gv, axis=-1),
                                 jnp.float32),
              "deform": jnp.zeros((len(gv), 3), jnp.float32)}
    rngm = np.random.default_rng(0)
    hp = n_devices * 4
    poses_m, intr_m = surround_rig(2, 2.5, 40, 0.0, 0.3, hp, rng=rngm)
    lights_m, _ = cam_utils.light_sampling(poses_m, rng=rngm)
    mtargets = {"images": jnp.full((2, hp, hp, 3), 0.5),
                "masks": jnp.ones((2, hp, hp, 1)),
                "poses": jnp.asarray(poses_m),
                "intrinsics": jnp.asarray(intr_m),
                "cam_weights": jnp.ones((2,)),
                "cam_lights": jnp.asarray(lights_m)}
    mstate, _, mout = mfit(mstate, mopt.init(mstate), mtargets,
                           jax.random.PRNGKey(1))
    jax.block_until_ready(mout["loss"])
    assert bool(jnp.isfinite(mout["loss"]).all())


def dryrun_pipeline(mesh, num_views=None, steps=3, seed=0):
    """Run the full tiny MVEdit 3D pipeline sharded over `mesh`.

    num_views defaults to half the device count so the 2N CFG batch puts
    exactly one view-image per device.
    """
    from ..testing import make_tiny_models, make_tiny_mvedit_cfg
    from ..pipelines import MVEdit3DPipeline
    from ..apis.cameras import surround_rig
    from ..utils import camera as cam_utils

    n_dev = mesh.devices.size
    N = num_views if num_views is not None else max(n_dev // 2, 2)
    m = make_tiny_models(jax.random.PRNGKey(seed))
    m.device_mesh = mesh
    size = 32
    cfg = make_tiny_mvedit_cfg(num_views=N, render_size=size, steps=steps,
                               nerf_switch_progress=0.5)
    rng = np.random.default_rng(seed)
    poses, intr = surround_rig(N, 2.5, 40, 0.0, 0.3, size, rng=rng)
    lights, _ = cam_utils.light_sampling(poses, rng=rng)
    targets = {
        "images": jnp.ones((N, size, size, 3)) * 0.5,
        "masks": jnp.ones((N, size, size, 1)),
        "poses": jnp.asarray(poses), "intrinsics": jnp.asarray(intr),
        "cam_weights": jnp.ones((N,)),
        "cam_lights": jnp.asarray(lights),
    }
    embeds = jnp.zeros((N, 8, 32))
    pipe = MVEdit3DPipeline(m, cfg)
    return pipe(targets, jax.random.PRNGKey(seed + 1), embeds, embeds)
