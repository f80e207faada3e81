"""Ray generation and depth/normal utilities (jnp, jit-friendly).

Rebuilds the semantics of `lib/core/utils/geometry_utils.py:18-169`:
pixel-center ray directions from [fx, fy, cx, cy] intrinsics (OpenCV cam:
x-right, y-down, z-forward), world rays from (*, 3, 4) c2w, finite-difference
normal maps from inverse depth, and ControlNet-style depth normalization.
"""
import jax.numpy as jnp

__all__ = [
    "get_ray_directions", "get_rays", "get_cam_rays",
    "depth_to_normal", "normalize_depth",
]


def _normalize(v, axis=-1, eps=1e-12):
    return v * jnp.reciprocal(
        jnp.sqrt(jnp.clip(jnp.sum(v * v, axis=axis, keepdims=True), eps, None)))


def get_ray_directions(h, w, intrinsics, norm=False):
    """intrinsics: (*, 4) [fx, fy, cx, cy] -> (*, h, w, 3) camera-space dirs.

    Pixel centers at (i + 0.5, j + 0.5)."""
    intrinsics = jnp.asarray(intrinsics)
    batch = intrinsics.shape[:-1]
    x = jnp.linspace(0.5, w - 0.5, w)
    y = jnp.linspace(0.5, h - 0.5, h)
    dx = (x - intrinsics[..., 2:3]) / intrinsics[..., 0:1]  # (*, w)
    dy = (y - intrinsics[..., 3:4]) / intrinsics[..., 1:2]  # (*, h)
    dx = jnp.broadcast_to(dx[..., None, :], (*batch, h, w))
    dy = jnp.broadcast_to(dy[..., :, None], (*batch, h, w))
    dirs = jnp.stack([dx, dy, jnp.ones_like(dx)], axis=-1)
    if norm:
        dirs = _normalize(dirs)
    return dirs


def get_rays(directions, c2w, norm=False):
    """directions: (*, h, w, 3); c2w: (*, 3, 4) -> (rays_o, rays_d)."""
    rot = c2w[..., None, None, :3, :3]  # (*, 1, 1, 3, 3)
    rays_d = jnp.einsum("...ij,...j->...i", rot, directions)
    rays_o = jnp.broadcast_to(c2w[..., None, None, :3, 3], rays_d.shape)
    if norm:
        rays_d = _normalize(rays_d)
    return rays_o, rays_d


def get_cam_rays(c2w, intrinsics, h, w):
    dirs = get_ray_directions(h, w, intrinsics, norm=False)
    return get_rays(dirs, c2w, norm=True)


def depth_to_normal(depth, directions, format="opengl"):
    """depth: (*, h, w) inverse depth (1/z); directions unnormalized OpenCV
    camera-space ray dirs. Returns (*, h, w, 3) normals in [0, 1]."""
    xyz = directions / jnp.clip(depth[..., None], 1e-6, None)
    dx = xyz[..., :, 1:, :] - xyz[..., :, :-1, :]
    dy = xyz[..., 1:, :, :] - xyz[..., :-1, :, :]
    pad_w_end = [(0, 0)] * (xyz.ndim - 3) + [(0, 0), (0, 1), (0, 0)]
    pad_w_beg = [(0, 0)] * (xyz.ndim - 3) + [(0, 0), (1, 0), (0, 0)]
    pad_h_end = [(0, 0)] * (xyz.ndim - 3) + [(0, 1), (0, 0), (0, 0)]
    pad_h_beg = [(0, 0)] * (xyz.ndim - 3) + [(1, 0), (0, 0), (0, 0)]
    right = jnp.pad(dx, pad_w_end, mode="edge")
    left = jnp.pad(-dx, pad_w_beg, mode="edge")
    up = jnp.pad(-dy, pad_h_beg, mode="edge")
    down = jnp.pad(dy, pad_h_end, mode="edge")
    n = (_normalize(jnp.cross(right, up)) + _normalize(jnp.cross(up, left))
         + _normalize(jnp.cross(left, down)) + _normalize(jnp.cross(down, right)))
    n = _normalize(n)
    if format == "opengl":
        n = n * jnp.array([1.0, -1.0, -1.0])
    elif format != "opencv":
        raise ValueError("format should be opengl or opencv")
    return n / 2 + 0.5


def normalize_depth(depths, alphas, far_depth=0.25, alpha_clip=0.5, eps=1e-5):
    """(N, H, W) depths + (N, H, W, 1) alphas -> [0,1] depth maps for the
    depth ControlNet (ref geometry_utils.py:151-168)."""
    a = alphas[..., 0]
    depths_max = jnp.max(depths.reshape(depths.shape[0], -1), axis=1)[:, None, None]
    depths_fg = depths / jnp.clip(a, eps, None)
    masked = jnp.where(a < alpha_clip, 1.0 / eps, depths_fg)
    fg_min = jnp.min(masked.reshape(depths.shape[0], -1), axis=1)[:, None, None]
    depths_fg = (depths_fg - fg_min) / jnp.clip(depths_max - fg_min, eps, None)
    depths_fg = depths_fg * (1 - far_depth) + far_depth
    return jnp.clip(depths_fg * a, 0.0, 1.0)
