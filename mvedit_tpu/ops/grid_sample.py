"""Differentiable grid sampling (2D/3D) as gather + lerp.

TPU-native replacement for the reference's cuda_gridsample extension
(`lib/ops/cuda_gridsample/__init__.py`, used by the triplane decoder at
`lib/models/decoders/triplane_decoder.py:147-150`). The CUDA extension exists
only because stock torch grid_sample lacks double-backward; here the op is
ordinary jnp gather/lerp, so `jax.grad` composes and second-order gradients
(needed for NeRF normal supervision, where normals = d(sigma)/d(xyz) are
themselves differentiated) come for free.

Semantics match `torch.nn.functional.grid_sample` with
mode='bilinear', padding_mode in {'zeros','border'}, align_corners flag.
Grid coordinates are in [-1, 1]; grid[..., 0] indexes W (x), last channel
indexes the slowest spatial dim, as in torch.
"""
import jax.numpy as jnp

__all__ = ["grid_sample_2d", "grid_sample_3d"]


def _unnormalize(coord, size, align_corners):
    if align_corners:
        return (coord + 1.0) * 0.5 * (size - 1)
    return ((coord + 1.0) * size - 1.0) * 0.5


def _gather_nd_2d(img, ix, iy, padding_mode):
    """img: (N, C, H, W); ix/iy: (N, P) int32. Returns (N, C, P)."""
    N, C, H, W = img.shape
    if padding_mode == "border":
        ixc = jnp.clip(ix, 0, W - 1)
        iyc = jnp.clip(iy, 0, H - 1)
        valid = None
    else:  # zeros
        valid = (ix >= 0) & (ix < W) & (iy >= 0) & (iy < H)
        ixc = jnp.clip(ix, 0, W - 1)
        iyc = jnp.clip(iy, 0, H - 1)
    flat = img.reshape(N, C, H * W)
    idx = iyc * W + ixc  # (N, P)
    out = jnp.take_along_axis(flat, idx[:, None, :], axis=2)  # (N, C, P)
    if valid is not None:
        out = out * valid[:, None, :].astype(out.dtype)
    return out


def grid_sample_2d(input, grid, padding_mode="zeros", align_corners=False):
    """input: (N, C, H, W); grid: (N, Hg, Wg, 2) in [-1, 1] -> (N, C, Hg, Wg)."""
    assert padding_mode in ("zeros", "border")
    N, C, H, W = input.shape
    Hg, Wg = grid.shape[1], grid.shape[2]
    gx = _unnormalize(grid[..., 0].reshape(N, -1), W, align_corners)
    gy = _unnormalize(grid[..., 1].reshape(N, -1), H, align_corners)
    x0 = jnp.floor(gx)
    y0 = jnp.floor(gy)
    wx = gx - x0
    wy = gy - y0
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    v00 = _gather_nd_2d(input, x0i, y0i, padding_mode)
    v01 = _gather_nd_2d(input, x0i + 1, y0i, padding_mode)
    v10 = _gather_nd_2d(input, x0i, y0i + 1, padding_mode)
    v11 = _gather_nd_2d(input, x0i + 1, y0i + 1, padding_mode)
    wx = wx[:, None, :].astype(input.dtype)
    wy = wy[:, None, :].astype(input.dtype)
    out = (v00 * (1 - wx) * (1 - wy) + v01 * wx * (1 - wy)
           + v10 * (1 - wx) * wy + v11 * wx * wy)
    return out.reshape(N, C, Hg, Wg)


def _gather_nd_3d(vol, ix, iy, iz, padding_mode):
    """vol: (N, C, D, H, W); ix/iy/iz: (N, P) int32. Returns (N, C, P)."""
    N, C, D, H, W = vol.shape
    if padding_mode == "border":
        valid = None
    else:
        valid = ((ix >= 0) & (ix < W) & (iy >= 0) & (iy < H)
                 & (iz >= 0) & (iz < D))
    ixc = jnp.clip(ix, 0, W - 1)
    iyc = jnp.clip(iy, 0, H - 1)
    izc = jnp.clip(iz, 0, D - 1)
    flat = vol.reshape(N, C, D * H * W)
    idx = (izc * H + iyc) * W + ixc
    out = jnp.take_along_axis(flat, idx[:, None, :], axis=2)
    if valid is not None:
        out = out * valid[:, None, :].astype(out.dtype)
    return out


def grid_sample_3d(input, grid, padding_mode="zeros", align_corners=False):
    """input: (N, C, D, H, W); grid: (N, Dg, Hg, Wg, 3) in [-1, 1].

    grid[..., 0] indexes W, [..., 1] indexes H, [..., 2] indexes D (torch
    convention). Returns (N, C, Dg, Hg, Wg).
    """
    assert padding_mode in ("zeros", "border")
    N, C, D, H, W = input.shape
    Dg, Hg, Wg = grid.shape[1:4]
    gx = _unnormalize(grid[..., 0].reshape(N, -1), W, align_corners)
    gy = _unnormalize(grid[..., 1].reshape(N, -1), H, align_corners)
    gz = _unnormalize(grid[..., 2].reshape(N, -1), D, align_corners)
    x0 = jnp.floor(gx)
    y0 = jnp.floor(gy)
    z0 = jnp.floor(gz)
    wx = (gx - x0)[:, None, :].astype(input.dtype)
    wy = (gy - y0)[:, None, :].astype(input.dtype)
    wz = (gz - z0)[:, None, :].astype(input.dtype)
    x0i, y0i, z0i = (a.astype(jnp.int32) for a in (x0, y0, z0))

    out = 0.0
    for dz, fz in ((0, 1 - wz), (1, wz)):
        for dy, fy in ((0, 1 - wy), (1, wy)):
            for dx, fx in ((0, 1 - wx), (1, wx)):
                v = _gather_nd_3d(input, x0i + dx, y0i + dy, z0i + dz,
                                  padding_mode)
                out = out + v * fx * fy * fz
    return out.reshape(N, C, Dg, Hg, Wg)
