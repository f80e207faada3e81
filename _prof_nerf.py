import time, jax, jax.numpy as jnp, numpy as np
from mvedit_tpu.models.volume_renderer import RenderConfig
from mvedit_tpu.models.fields import INGPConfig, ingp_init, ingp_point_decode
from mvedit_tpu.models import nerf_fit as NF
from mvedit_tpu.utils import camera
from functools import partial

def decode(p, x, cfg=None): return ingp_point_decode(p, x, cfg)

rcfg = RenderConfig(num_samples=96, grid_size=64)
icfg = INGPConfig()
params = ingp_init(jax.random.PRNGKey(0), icfg)
pose = jnp.asarray(camera.get_pose_from_angles(np.array([0.4]), np.array([0.3]), 2.5)[0, :3])
intr = jnp.asarray(camera.intrinsics_from_fov(50.0, 128, 128))
dfn = partial(decode, cfg=icfg)
render = NF.make_image_renderer(dfn, 128, 128, rcfg, chunk=16384, use_grid=False)
float(render(params, pose, intr)["rgb"].sum())
t0 = time.perf_counter()
for _ in range(10): s = float(render(params, pose, intr)["rgb"].sum())
print(f"fused-gather render 128^2x96: {(time.perf_counter()-t0)/10*1e3:.1f} ms/frame", flush=True)

# also time one jitted nerf-fit step batch (the inner loop cost driver)
fcfg = NF.NerfFitConfig(render=rcfg, patch_size=128, patch_bs=1, n_steps=8, shaded=False)
fit, opt = NF.make_nerf_fit(dfn, fcfg, 512)
import optax
targets = {
  "images": jnp.zeros((6, 512, 512, 3)), "masks": jnp.ones((6, 512, 512, 1)),
  "poses": jnp.tile(pose[None], (6, 1, 1)),
  "intrinsics": jnp.tile(intr[None] * 4, (6, 1)),
  "cam_weights": jnp.ones((6,)), "cam_lights": jnp.ones((6, 3)) / 3**0.5,
}
from mvedit_tpu.models.volume_renderer import OccupancyGrid
grid = OccupancyGrid.create(64)
opt_state = opt.init(params)
p2, o2, g2, m = fit(params, opt_state, grid, targets, jax.random.PRNGKey(1))
float(m["loss"].sum())
t0 = time.perf_counter()
for _ in range(5):
    p2, o2, g2, m = fit(p2, o2, g2, targets, jax.random.PRNGKey(2))
    s = float(m["loss"].sum())
dt = (time.perf_counter()-t0)/5
print(f"nerf fit 8 steps (128^2 rays x 96): {dt*1e3:.1f} ms = {dt/8*1e3:.1f} ms/step", flush=True)
