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
           "make_sharded_nerf_step", "dryrun"]


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
    """Driver hook: build an n-device mesh, jit the full sharded steps
    (denoise over views + NeRF fit over rays), run one step on tiny shapes."""
    # the axon sitecustomize registers its TPU backend regardless of
    # JAX_PLATFORMS; force the virtual CPU mesh BEFORE any device query
    # (jax.devices() itself initializes backends and locks the config)
    try:
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_num_cpu_devices", n_devices)
    except RuntimeError:
        pass  # backends already up; fall through to the count check
    if len(jax.devices()) < n_devices:
        raise RuntimeError(
            f"dryrun needs {n_devices} devices but only "
            f"{len(jax.devices())} exist and backends are already "
            "initialized; run dryrun_multichip in a fresh process")

    from ..models.diffusion import UNet2DCondition, UNetConfig, AttnMode
    from ..models.fields import INGPConfig, ingp_init, ingp_point_decode
    from ..models.volume_renderer import RenderConfig
    from ..ops.hash_grid import HashGridConfig

    mesh = make_mesh(n_devices)
    assert len(mesh.devices.ravel()) == n_devices, \
        f"mesh has {len(mesh.devices.ravel())} devices, wanted {n_devices}"
    n_dev = len(mesh.devices.ravel())

    # --- sharded multiview denoise step ---
    views = n_dev  # one view per device; CFG doubles the batch
    cfg = UNetConfig(block_out_channels=(32, 64), layers_per_block=1,
                     attn_down=(True, False), cross_attention_dim=32,
                     num_heads=4, dtype=jnp.float32)
    net = UNet2DCondition(cfg)
    B = 2 * views
    x = jnp.zeros((B, 16, 16, 4))
    t = jnp.full((B,), 500, jnp.int32)
    ctx = jnp.zeros((B, 8, 32))
    params = net.init(jax.random.PRNGKey(0), x[:1], t[:1], ctx[:1])
    step = make_sharded_denoise_step(net, mesh, AttnMode(num_views=views))
    out = step(params, x, t, ctx)
    assert out.shape == (B, 16, 16, 4)
    jax.block_until_ready(out)

    # --- sharded NeRF fit step ---
    icfg = INGPConfig(hash=HashGridConfig(n_levels=2, base_resolution=4,
                                          max_resolution=8,
                                          log2_hashmap_size=10))
    rcfg = RenderConfig(num_samples=8, grid_size=8, stratified=False)
    nerf_params = ingp_init(jax.random.PRNGKey(1), icfg)
    fit_step, opt = make_sharded_nerf_step(
        lambda p, xx: ingp_point_decode(p, xx, icfg), rcfg, mesh)
    opt_state = opt.init(nerf_params)
    R = 16 * n_dev
    rays_o = jnp.tile(jnp.asarray([[0.0, 0.0, -2.0]]), (R, 1))
    rays_d = jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]]), (R, 1))
    tgt = jnp.ones((R, 3)) * 0.5
    nerf_params, opt_state, loss = fit_step(
        nerf_params, opt_state, rays_o, rays_d, tgt)
    jax.block_until_ready(loss)
    assert jnp.isfinite(loss)
