"""Quality A/B: freeze_mesh_topology=True vs per-step re-extraction.

The reference rebuilds DMTet topology every inner step
(`base_mesh_renderer.py:140-188` via `torch.unique`); the repo's default
freezes the crossing-edge set per <=8-step fit program and re-lerps only
vertex positions (mesh_fit.py freeze_topology). This script measures the
GEOMETRIC cost of that staleness on a production-shaped fit:

  GT = analytic bumpy-sphere SDF, meshed at the same tet res.
  Targets = 16 shaded 512^2 renders of the GT mesh (+ masks).
  Fit 80 steps (10 chained 8-step programs, the pipeline's structure)
  from a plain-sphere init, frozen vs unfrozen, same seeds.
  Report: symmetric chamfer distance (50k surface samples) and
  mean silhouette IoU over the 16 views, plus wall/step.

Run: PYTHONPATH=. python benchmarks/ab_freeze_topology.py --res 64
"""
import argparse
import time

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

from mvedit_tpu.models.mesh.structured_tets import (StructuredTetGrid,
                                                    marching_tets_structured)
from mvedit_tpu.models import mesh_fit as MF
from mvedit_tpu.models.mesh.rasterize import RasterConfig
from mvedit_tpu.models.mesh.renderer import render_views
from mvedit_tpu.models.fields import INGPConfig, ingp_init, ingp_point_decode
from mvedit_tpu.ops.dense_grid import DenseGridConfig
from mvedit_tpu.apis.cameras import surround_rig
from mvedit_tpu.utils import camera as cam_utils

ap = argparse.ArgumentParser()
ap.add_argument("--res", type=int, default=64)
ap.add_argument("--size", type=int, default=512)
ap.add_argument("--steps", type=int, default=80)
args = ap.parse_args()
res, size = args.res, args.size

grid = StructuredTetGrid(res)
v = np.asarray(grid.verts)


def gt_sdf(p):
    r = np.linalg.norm(p, axis=-1)
    theta = np.arctan2(p[..., 1], p[..., 0])
    phi = np.arccos(np.clip(p[..., 2] / np.clip(r, 1e-9, None), -1, 1))
    bump = 0.08 * np.sin(3 * theta) * np.sin(4 * phi)
    return (0.62 + bump) - r


vert_cap = 1 << max(9, (16 * res * res - 1).bit_length())
face_cap = vert_cap + (vert_cap >> 1)
gt_mt = jax.jit(lambda s: marching_tets_structured(
    grid, grid.arrays(), s, vert_cap=vert_cap, face_cap=face_cap))(
    jnp.asarray(gt_sdf(v), jnp.float32))

N = 16
rng = np.random.default_rng(0)
poses, intr = surround_rig(N, 2.5, 40, 0.0, 0.3, size, rng=rng)
lights, _ = cam_utils.light_sampling(poses, rng=rng)
rc = RasterConfig(height=size, width=size, span=2,
                  k_per_tile=1024 if size >= 256 else 256,
                  tile_chunk=64 if size >= 512 else 256)

# GT renders: shaded gray views + hard masks
@jax.jit
def render_gt(mt):
    def shade(xyz, nrm, vd):
        return jnp.full(xyz.shape[:-1] + (3,), 0.55)
    out = render_views(mt["verts"], mt["faces"], mt["face_mask"],
                       jnp.asarray(poses), jnp.asarray(intr), rc,
                       shading_fun=shade, sequential=True)
    lam = jnp.clip(jnp.sum(jnp.asarray(lights)[:, None, None, :]
                           * out["normal"], axis=-1, keepdims=True), 0, None)
    sh = lam * 0.7 + 0.3
    rgb = jnp.clip(out["rgb"] * sh, 0, 1)
    a = out["alpha"]
    return rgb * a + (1 - a), out["alpha_hard"]


gt_rgb, gt_mask = render_gt(gt_mt)
targets = {"images": gt_rgb, "masks": gt_mask,
           "poses": jnp.asarray(poses), "intrinsics": jnp.asarray(intr),
           "cam_weights": jnp.ones((N,)),
           "cam_lights": jnp.asarray(lights)}

ingp = INGPConfig(backend="dense", dense=DenseGridConfig(resolutions=(32, 160)))


def color_fn(p, x):
    return ingp_point_decode(p, x, ingp)[1]


def run_fit(freeze):
    mcfg = MF.MeshFitConfig(raster=rc, n_steps=8,
                            patch_size=min(128, size), vert_cap=vert_cap,
                            face_cap=face_cap, freeze_topology=freeze)
    fit, opt, extract = MF.make_mesh_fit(grid, color_fn, mcfg)
    sdf0 = (0.55 - np.linalg.norm(v, axis=-1)).astype(np.float32)
    state = {"field": ingp_init(jax.random.PRNGKey(0), ingp),
             "sdf": jnp.asarray(sdf0),
             "deform": jnp.zeros((len(v), 3), jnp.float32)}
    os_ = opt.init(state)
    key = jax.random.PRNGKey(7)
    t0 = time.perf_counter()
    out = None
    for i in range(args.steps // 8):
        key, kc = jax.random.split(key)
        state, os_, out = fit(state, os_, targets, kc)
    mt = out["mt"]
    jax.block_until_ready(mt["verts"])
    wall = time.perf_counter() - t0
    return mt, wall


def face_samples(mt, n=50000, seed=3):
    """Uniform-ish surface samples: random barycentric points on random
    live faces (area weighting omitted — identical protocol both arms)."""
    k1, k2 = jax.random.split(jax.random.PRNGKey(seed))
    fmask = mt["face_mask"]
    # inverse-CDF draw over live faces (categorical would materialize an
    # (n, face_cap) gumbel — 40 GB at these caps)
    cdf = jnp.cumsum(fmask.astype(jnp.float32))
    u = jax.random.uniform(k1, (n,)) * cdf[-1]
    fid = jnp.clip(jnp.searchsorted(cdf, u), 0, fmask.shape[0] - 1)
    f = mt["faces"][fid]
    uv = jax.random.uniform(k2, (n, 2))
    u = jnp.where(uv.sum(-1) > 1, 1 - uv[:, 0], uv[:, 0])
    w_ = jnp.where(uv.sum(-1) > 1, 1 - uv[:, 1], uv[:, 1])
    p = (mt["verts"][f[:, 0]] * (1 - u - w_)[:, None]
         + mt["verts"][f[:, 1]] * u[:, None]
         + mt["verts"][f[:, 2]] * w_[:, None])
    return p


@jax.jit
def chamfer(a, b):
    """Symmetric chamfer via chunked pairwise distances."""
    def one_way(x, y):
        def chunk_min(xc):
            d = jnp.sum((xc[:, None, :] - y[None, :, :]) ** 2, -1)
            return jnp.min(d, axis=1)
        n = x.shape[0]
        xc = x.reshape(n // 1000, 1000, 3)
        return jnp.mean(jnp.sqrt(jax.lax.map(chunk_min, xc)))
    return 0.5 * (one_way(a, b) + one_way(b, a))


@jax.jit
def sil_iou(mt):
    out = render_views(mt["verts"], mt["faces"], mt["face_mask"],
                       jnp.asarray(poses), jnp.asarray(intr), rc,
                       sequential=True)
    pred = out["alpha_hard"] > 0.5
    gt = gt_mask > 0.5
    inter = jnp.sum(pred & gt, axis=(1, 2, 3))
    union = jnp.sum(pred | gt, axis=(1, 2, 3))
    return jnp.mean(inter / jnp.clip(union, 1, None))


gt_pts = face_samples(gt_mt, seed=11)
for freeze in (False, True):
    mt, wall = run_fit(freeze)
    pts = face_samples(mt)
    ch = float(chamfer(pts, gt_pts))
    iou = float(sil_iou(mt))
    nf = int(jnp.sum(mt["face_mask"]))
    print(f"freeze={freeze}: chamfer={ch:.5f} sil_iou={iou:.4f} "
          f"faces={nf} wall={wall:.1f}s "
          f"({wall / args.steps * 1e3:.0f} ms/step incl compile-free "
          f"chained programs)", flush=True)
