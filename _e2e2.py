import time, os
os.environ["MVEDIT_DEBUG_MEM"] = "1"
import numpy as np, jax, jax.numpy as jnp
from mvedit_tpu.apis import Adapter3DRunner
from mvedit_tpu.models.mesh import Mesh
from mvedit_tpu.models.mesh.dmtet import build_grid_tets, marching_tets
runner = Adapter3DRunner(tiny_models=False, seed=0)
grid = build_grid_tets(24, crop_sphere=False)
sdf = 0.55 - np.linalg.norm(grid.verts, axis=-1)
mt = marching_tets(grid, jnp.asarray(sdf))
fm = np.asarray(mt["face_mask"]); f = np.asarray(mt["faces"])[fm]
v = np.asarray(mt["verts"]); used = np.unique(f)
remap = np.full(len(v), -1, np.int64); remap[used] = np.arange(len(used))
mesh = Mesh(v=v[used].astype(np.float32), f=remap[f].astype(np.int32))
mesh.auto_normal(); mesh.write_glb("/tmp/s.glb")
t0 = time.perf_counter()
out = runner.run_3d_to_3d("/tmp/s.glb", "a beach ball", seed=1,
                          steps=3, num_views=9, n_inverse_steps=4,
                          init_inverse_steps=8, out_path="/tmp/e.glb")
print(f"[TOTAL] {time.perf_counter()-t0:.1f}s mesh={out['mesh'] is not None}", flush=True)
