import time, jax, jax.numpy as jnp, numpy as np
from functools import partial
from mvedit_tpu.models.volume_renderer import RenderConfig
from mvedit_tpu.models.fields import INGPConfig, ingp_init, ingp_point_decode
from mvedit_tpu.models import nerf_fit as NF
from mvedit_tpu.utils import camera

def decode(p, x, cfg=None): return ingp_point_decode(p, x, cfg)

pose = jnp.asarray(camera.get_pose_from_angles(np.array([0.4]), np.array([0.3]), 2.5)[0, :3])
intr = jnp.asarray(camera.intrinsics_from_fov(50.0, 128, 128))
rcfg = RenderConfig(num_samples=96, grid_size=64)

for backend in ("hash", "dense"):
    icfg = INGPConfig(backend=backend)
    params = ingp_init(jax.random.PRNGKey(0), icfg)
    dfn = partial(decode, cfg=icfg)
    render = NF.make_image_renderer(dfn, 128, 128, rcfg, chunk=16384, use_grid=False)
    float(render(params, pose, intr)["rgb"].sum())
    t0 = time.perf_counter()
    for _ in range(10): s = float(render(params, pose, intr)["rgb"].sum())
    print(f"{backend}: render 128^2x96 = {(time.perf_counter()-t0)/10*1e3:.1f} ms/frame", flush=True)

    # one fit scan of 8 steps (fwd+bwd at 128^2 patch x 96 samples)
    fcfg = NF.NerfFitConfig(render=rcfg, patch_size=128, patch_bs=1, n_steps=8, shaded=False)
    fit, opt = NF.make_nerf_fit(dfn, fcfg, 512)
    from mvedit_tpu.models.volume_renderer import OccupancyGrid
    targets = {
      "images": jnp.zeros((6, 512, 512, 3)), "masks": jnp.ones((6, 512, 512, 1)),
      "poses": jnp.tile(pose[None], (6, 1, 1)),
      "intrinsics": jnp.tile(intr[None] * 4, (6, 1)),
      "cam_weights": jnp.ones((6,)), "cam_lights": jnp.ones((6, 3)) / 3**0.5,
    }
    grid0 = OccupancyGrid.create(64)
    os_ = opt.init(params)
    p2, o2, g2, m = fit(params, os_, grid0, targets, jax.random.PRNGKey(1))
    float(m["loss"].sum())
    t0 = time.perf_counter()
    for _ in range(3):
        p2, o2, g2, m = fit(p2, o2, g2, targets, jax.random.PRNGKey(2))
        s = float(m["loss"].sum())
    dt = (time.perf_counter()-t0)/3
    print(f"{backend}: fit = {dt/8*1e3:.1f} ms/opt-step", flush=True)
