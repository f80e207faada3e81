"""Static-shape volume renderer: fixed-step march + masked compositing.

TPU-native redesign of the reference's CUDA renderer stack
(`lib/ops/raymarching/src/raymarching.cu` kernels + the two regimes of
`lib/models/decoders/base_volume_renderer.py:179-329`). The CUDA code builds
variable-length per-ray point lists with alive-ray compaction — dynamic shapes
that XLA cannot compile. Here every ray gets the same static sample count and
occupancy/weight culling become masks:

- `ray_aabb` replaces kernel_near_far_from_aabb (raymarching.cu:92);
- `sample_rays` produces stratified samples in [near, far], optionally
  restricted by the occupancy grid via sigma-masking;
- `composite` is the standard transmittance cumprod (replacing
  kernel_composite_rays_train fwd/bwd :501,606 — jax.grad derives the
  backward), with `T_thresh` early-termination expressed as a mask;
- the occupancy grid (`OccupancyGrid`, `update_density_grid`) replaces the
  density-grid EMA + Morton/packbits machinery of update_extra_state
  (base_volume_renderer.py:105-177) with a plain (G,G,G) array.

All shapes static -> one compiled program per (num_rays, num_samples).
"""
from dataclasses import dataclass
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

__all__ = ["RenderConfig", "OccupancyGrid", "ray_aabb", "sample_rays",
           "composite", "render_rays", "update_density_grid",
           "occupancy_at"]


@dataclass(frozen=True)
class RenderConfig:
    num_samples: int = 128        # fixed samples/ray (ref max_steps analog)
    bound: float = 1.0            # AABB = [-bound, bound]^3
    grid_size: int = 128          # occupancy grid resolution
    density_thresh: float = 0.01  # occupancy threshold (ref density_thresh)
    decay: float = 0.95           # EMA decay for grid update (ref 0.95)
    t_thresh: float = 1e-4        # transmittance early-stop -> mask
    stratified: bool = True
    white_bkgd: bool = False


class OccupancyGrid(NamedTuple):
    density: jnp.ndarray  # (G, G, G) float32 EMA of sigma
    occ: jnp.ndarray      # (G, G, G) bool

    @classmethod
    def create(cls, grid_size):
        g = jnp.zeros((grid_size,) * 3, jnp.float32)
        return cls(density=g, occ=jnp.ones((grid_size,) * 3, bool))


def ray_aabb(rays_o, rays_d, bound, min_near=0.05):
    """Slab test against [-bound, bound]^3. Returns (near, far); far<near
    when the ray misses (callers mask on that)."""
    inv_d = 1.0 / jnp.where(jnp.abs(rays_d) < 1e-9,
                            jnp.where(rays_d >= 0, 1e-9, -1e-9), rays_d)
    t0 = (-bound - rays_o) * inv_d
    t1 = (bound - rays_o) * inv_d
    tmin = jnp.max(jnp.minimum(t0, t1), axis=-1)
    tmax = jnp.min(jnp.maximum(t0, t1), axis=-1)
    near = jnp.maximum(tmin, min_near)
    return near, tmax


def occupancy_at(grid: OccupancyGrid, xyz, bound):
    """Nearest-cell occupancy lookup for (..., 3) world points."""
    g = grid.occ.shape[0]
    idx = jnp.clip(((xyz + bound) / (2 * bound) * g).astype(jnp.int32), 0, g - 1)
    return grid.occ[idx[..., 0], idx[..., 1], idx[..., 2]]


def tighten_interval(rays_o, rays_d, near, far, grid: OccupancyGrid, bound,
                     probe_samples=64):
    """Shrink [near, far] to the occupied span along each ray by probing the
    occupancy grid (cheap bool lookups, no field evals). This is the static-
    shape analog of the CUDA marcher's bitfield voxel skipping
    (raymarching.cu:338-476): the fixed sample budget then concentrates on
    the ~1/3 of the ray that can contribute."""
    u = (jnp.arange(probe_samples, dtype=jnp.float32) + 0.5) / probe_samples
    ts = near[..., None] + (far - near)[..., None] * u
    xyz = rays_o[..., None, :] + rays_d[..., None, :] * ts[..., None]
    occ = occupancy_at(grid, xyz, bound)                  # (R, P)
    any_occ = jnp.any(occ, axis=-1)
    idx = jnp.arange(probe_samples)
    first = jnp.argmax(occ, axis=-1)
    last = probe_samples - 1 - jnp.argmax(occ[..., ::-1], axis=-1)
    del idx
    step = (far - near) / probe_samples
    t0 = near + jnp.maximum(first - 1, 0) * step
    t1 = near + jnp.minimum(last + 2, probe_samples) * step
    near2 = jnp.where(any_occ, t0, near)
    far2 = jnp.where(any_occ, t1, near + 1e-3)
    return near2, far2, any_occ


def sample_rays(rays_o, rays_d, cfg: RenderConfig, key=None, grid=None):
    """Stratified fixed-count samples per ray (optionally concentrated on
    the occupancy grid's support when `grid` is given).

    Returns (xyz (R, S, 3), ts (R, S), deltas (R, S), valid (R, S))."""
    near, far = ray_aabb(rays_o, rays_d, cfg.bound)
    hit = far > near
    far = jnp.where(hit, far, near + 1e-3)
    if grid is not None:
        near, far, any_occ = tighten_interval(
            rays_o, rays_d, near, far, grid, cfg.bound)
        hit = hit & any_occ
    S = cfg.num_samples
    u = (jnp.arange(S, dtype=jnp.float32) + 0.5) / S
    if cfg.stratified and key is not None:
        u = (jnp.arange(S, dtype=jnp.float32)[None]
             + jax.random.uniform(key, (rays_o.shape[0], S))) / S
    ts = near[..., None] + (far - near)[..., None] * u
    deltas = jnp.diff(ts, axis=-1, append=ts[..., -1:] + (far - near)[..., None] / S)
    xyz = rays_o[..., None, :] + rays_d[..., None, :] * ts[..., None]
    valid = jnp.broadcast_to(hit[..., None], ts.shape)
    return xyz, ts, deltas, valid


def composite(sigmas, rgbs, ts, deltas, valid, cfg: RenderConfig,
              bg_color=None):
    """Front-to-back alpha compositing with early-stop masking.

    sigmas: (R, S); rgbs: (R, S, 3). Returns dict with rgb (R,3),
    depth (R,), alpha (R,), weights (R,S)."""
    sigmas = jnp.where(valid, sigmas, 0.0)
    alpha = 1.0 - jnp.exp(-sigmas * deltas)
    # T_i = prod_{j<i} (1 - alpha_j); exclusive cumprod via log-space cumsum
    log_t = jnp.cumsum(jnp.log(jnp.clip(1.0 - alpha, 1e-10, None)), axis=-1)
    trans = jnp.exp(jnp.concatenate(
        [jnp.zeros_like(log_t[..., :1]), log_t[..., :-1]], axis=-1))
    # early termination as a mask (ref T_thresh in composite kernels)
    live = trans > cfg.t_thresh
    weights = alpha * trans * live.astype(alpha.dtype)
    rgb = jnp.sum(weights[..., None] * rgbs, axis=-2)
    depth = jnp.sum(weights * ts, axis=-1)
    # inverse-distance depth Sum(w / t), matching the reference composite
    # (raymarching.cu:552 `d += weight / ts[0]`)
    inv_depth = jnp.sum(weights / jnp.clip(ts, 1e-6, None), axis=-1)
    acc = jnp.sum(weights, axis=-1)
    if bg_color is None and cfg.white_bkgd:
        bg_color = 1.0
    if bg_color is not None:
        rgb = rgb + (1.0 - acc[..., None]) * bg_color
    return {"rgb": rgb, "depth": depth, "inv_depth": inv_depth, "alpha": acc,
            "weights": weights, "trans": trans, "deltas": deltas}


def render_rays(point_decode_fn, rays_o, rays_d, cfg: RenderConfig,
                grid: OccupancyGrid = None, key=None, bg_color=None,
                with_normals=False):
    """March + decode + composite for (R, 3) rays.

    `point_decode_fn(xyz) -> (sigma, rgb)` closes over field params (keeps
    this renderer agnostic to iNGP vs triplane decoders, like the abstract
    `point_decode` at base_volume_renderer.py:179).
    """
    xyz, ts, deltas, valid = sample_rays(rays_o, rays_d, cfg, key, grid=grid)
    if grid is not None:
        valid = valid & occupancy_at(grid, xyz, cfg.bound)
    sigmas, rgbs = point_decode_fn(xyz)
    out = composite(sigmas, rgbs, ts, deltas, valid, cfg, bg_color)
    if with_normals:
        # analytic normals: -grad(sigma)/|grad| (ref base_volume_renderer
        # :247-259 uses autograd through the decoder)
        def sigma_sum(pts):
            s, _ = point_decode_fn(pts)
            return jnp.sum(s)
        g = jax.grad(sigma_sum)(xyz)
        n = -g / jnp.clip(jnp.linalg.norm(g, axis=-1, keepdims=True), 1e-6, None)
        out["normal"] = jnp.sum(out["weights"][..., None] * n, axis=-2)
    return out


@partial(jax.jit, static_argnames=("density_fn", "cfg"))
def update_density_grid(density_fn, grid: OccupancyGrid, cfg: RenderConfig,
                        key=None):
    """EMA-update the density grid by evaluating the field at (jittered) cell
    centers, then re-threshold occupancy.

    Replaces update_extra_state (base_volume_renderer.py:105-177); full update
    every call (the ref alternates full/partial — cheap enough here since the
    whole grid is one batched field eval).
    Threshold: min(mean(density), density_thresh) as in the reference
    (`density_thresh` clamped by the grid mean, raymarching-style).
    """
    g = cfg.grid_size
    centers = (jnp.stack(jnp.meshgrid(*([jnp.arange(g)] * 3), indexing="ij"),
                         axis=-1) + 0.5) / g
    if key is not None:
        centers = centers + (jax.random.uniform(key, centers.shape) - 0.5) / g
    xyz = centers * (2 * cfg.bound) - cfg.bound
    sigmas = density_fn(xyz.reshape(-1, 3)).reshape(g, g, g)
    new_density = jnp.maximum(grid.density * cfg.decay, sigmas)
    thresh = jnp.minimum(jnp.mean(new_density), cfg.density_thresh)
    return OccupancyGrid(density=new_density, occ=new_density > thresh)
