import time, jax, jax.numpy as jnp, numpy as np
from functools import partial
from mvedit_tpu.models.volume_renderer import RenderConfig, OccupancyGrid
from mvedit_tpu.models.fields import INGPConfig, ingp_init, ingp_point_decode
from mvedit_tpu.ops.dense_grid import DenseGridConfig
from mvedit_tpu.models import nerf_fit as NF
from mvedit_tpu.utils import camera

def decode(p, x, cfg=None): return ingp_point_decode(p, x, cfg)

pose = jnp.asarray(camera.get_pose_from_angles(np.array([0.4]), np.array([0.3]), 2.5)[0, :3])
intr = jnp.asarray(camera.intrinsics_from_fov(50.0, 128, 128))

def bench_fit(tag, rcfg, icfg, patch=128, steps=8, use_rbg=False):
    params = ingp_init(jax.random.PRNGKey(0), icfg)
    dfn = partial(decode, cfg=icfg)
    fcfg = NF.NerfFitConfig(render=rcfg, patch_size=patch, patch_bs=1, n_steps=steps, shaded=False)
    fit, opt = NF.make_nerf_fit(dfn, fcfg, 512)
    targets = {
      "images": jnp.zeros((6, 512, 512, 3)), "masks": jnp.ones((6, 512, 512, 1)),
      "poses": jnp.tile(pose[None], (6, 1, 1)),
      "intrinsics": jnp.tile(intr[None] * 4, (6, 1)),
      "cam_weights": jnp.ones((6,)), "cam_lights": jnp.ones((6, 3)) / 3**0.5,
    }
    grid0 = OccupancyGrid.create(rcfg.grid_size)
    os_ = opt.init(params)
    p2, o2, g2, m = fit(params, os_, grid0, targets, jax.random.PRNGKey(1))
    float(m["loss"].sum())
    t0 = time.perf_counter()
    for _ in range(3):
        p2, o2, g2, m = fit(p2, o2, g2, targets, jax.random.PRNGKey(2))
        s = float(m["loss"].sum())
    dt = (time.perf_counter()-t0)/3
    print(f"{tag}: {dt/steps*1e3:.0f} ms/opt-step", flush=True)

dense = INGPConfig(backend="dense")
bench_fit("dense s96", RenderConfig(num_samples=96, grid_size=64), dense)
bench_fit("dense s48", RenderConfig(num_samples=48, grid_size=64), dense)
bench_fit("dense s48 nostrat", RenderConfig(num_samples=48, grid_size=64, stratified=False), dense)
small = INGPConfig(backend="dense", dense=DenseGridConfig(resolutions=(16, 64), n_features=8))
bench_fit("dense(16,64) s48", RenderConfig(num_samples=48, grid_size=64), small)
bench_fit("dense s48 patch64", RenderConfig(num_samples=48, grid_size=64), dense, patch=64)

# ---- corner-fold sweep at the production fit shape (s128, patch 128) ----
for fold in (1, 8):
    icfg = INGPConfig(backend="dense", dense=DenseGridConfig(fold=fold))
    bench_fit(f"dense s128 fold={fold}",
              RenderConfig(num_samples=128, grid_size=64), icfg)

# ---- inference render path (chunked lax.map frame) fold sweep ----
# the folded table is rebuilt inside the encode; this checks XLA hoists it
# out of the per-chunk loop (LICM) instead of paying the rebuild per chunk
for fold in (1, 8):
    icfg = INGPConfig(backend="dense", dense=DenseGridConfig(fold=fold))
    params = ingp_init(jax.random.PRNGKey(0), icfg)
    dfn = partial(decode, cfg=icfg)
    render = NF.make_image_renderer(
        dfn, 512, 512, RenderConfig(num_samples=128, grid_size=64),
        chunk=65536)
    out = render(params, pose, intr * 4)
    float(out["rgb"].sum())
    t0 = time.perf_counter()
    for _ in range(3):
        out = render(params, pose, intr * 4)
        float(out["rgb"].sum())
    print(f"render 512^2 s128 fold={fold}: "
          f"{(time.perf_counter()-t0)/3*1e3:.0f} ms/frame", flush=True)
