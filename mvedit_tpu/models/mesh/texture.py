"""Mip-mapped texture sampling + multi-view texture baking.

Rebuilds nvdiffrast's `dr.texture(..., 'linear-mipmap-linear')` and the
reference's multi-view back-projection bake
(`base_mesh_renderer.py:507-577` bake_multiview):

- `build_mipmaps` / `sample_texture`: trilinear-across-mips sampling with the
  LOD computed from screen-space UV derivatives. nvdiffrast gets those from
  rasterizer attribute derivatives (diff_attrs='all'); here they come from
  finite differences of the per-pixel UV map — identical inside triangles,
  approximate at edges (covered by edge dilation / SSAA).
- `bake_multiview`: scatter view colors into the UV atlas weighted by the
  per-view UV-space camera weights.
"""
from functools import partial

import jax
import jax.numpy as jnp

from ...ops.grid_sample import grid_sample_2d

__all__ = ["build_mipmaps", "sample_texture", "bake_multiview"]


def build_mipmaps(tex, num_levels):
    """tex: (H, W, C) -> list of levels, 2x average-pooled each step."""
    mips = [tex]
    for _ in range(num_levels - 1):
        t = mips[-1]
        h, w = t.shape[:2]
        if min(h, w) < 2:
            break
        t = t.reshape(h // 2, 2, w // 2, 2, -1).mean(axis=(1, 3))
        mips.append(t)
    return mips


def _sample_level(tex, uv):
    """Bilinear sample one mip level. uv: (..., 2) in [0,1]."""
    g = uv * 2.0 - 1.0
    batch = g.shape[:-1]
    out = grid_sample_2d(
        jnp.moveaxis(tex, -1, 0)[None],
        g.reshape(1, 1, -1, 2), padding_mode="border", align_corners=False)
    return out[0, :, 0].T.reshape(*batch, tex.shape[-1])


def sample_texture(mips, uv, uv_dx=None, uv_dy=None):
    """Trilinear mip sampling. uv (..., 2); uv_dx/uv_dy: screen-space UV
    derivatives (..., 2) (None -> level 0 only)."""
    base = mips[0]
    h, w = base.shape[:2]
    if uv_dx is None or len(mips) == 1:
        return _sample_level(base, uv)
    # LOD from the max texel footprint
    fx = jnp.linalg.norm(uv_dx * jnp.asarray([w, h]), axis=-1)
    fy = jnp.linalg.norm(uv_dy * jnp.asarray([w, h]), axis=-1)
    rho = jnp.maximum(fx, fy)
    lod = jnp.clip(jnp.log2(jnp.clip(rho, 1e-8, None)), 0.0, len(mips) - 1.0)
    l0 = jnp.floor(lod).astype(jnp.int32)
    frac = (lod - l0)[..., None]
    # static unroll over levels, select per pixel
    out0 = jnp.zeros((*uv.shape[:-1], base.shape[-1]), base.dtype)
    out1 = jnp.zeros_like(out0)
    for li, mip in enumerate(mips):
        s = _sample_level(mip, uv)
        out0 = jnp.where((l0 == li)[..., None], s, out0)
        out1 = jnp.where((jnp.minimum(l0 + 1, len(mips) - 1) == li)[..., None],
                         s, out1)
    return out0 * (1 - frac) + out1 * frac


def uv_screen_derivatives(uv_map):
    """Finite-difference d(uv)/d(pixel) for (H, W, 2) uv maps."""
    dx = jnp.diff(uv_map, axis=1, append=uv_map[:, -1:])
    dy = jnp.diff(uv_map, axis=0, append=uv_map[-1:])
    return dx, dy


@partial(jax.jit, static_argnames=("atlas_hw",))
def bake_multiview(images, uv_per_view, weight_per_view, atlas_hw):
    """Back-project N view images onto a UV atlas.

    Args:
        images: (N, H, W, 3) view colors;
        uv_per_view: (N, H, W, 2) per-pixel atlas UVs (from rendering the
            mesh's uv attribute into each view);
        weight_per_view: (N, H, W) blending weights (0 where invalid).
    Returns (atlas (Ha, Wa, 3), weight (Ha, Wa)) — un-normalized sums; caller
    divides and edge-dilates (base_mesh_renderer.py:507-577 semantics).
    """
    Ha, Wa = atlas_hw
    tx = jnp.clip((uv_per_view[..., 0] * Wa).astype(jnp.int32), 0, Wa - 1)
    ty = jnp.clip((uv_per_view[..., 1] * Ha).astype(jnp.int32), 0, Ha - 1)
    flat_idx = (ty * Wa + tx).reshape(-1)
    w = weight_per_view.reshape(-1)
    c = images.reshape(-1, 3) * w[:, None]
    atlas = jnp.zeros((Ha * Wa, 3)).at[flat_idx].add(c)
    wsum = jnp.zeros((Ha * Wa,)).at[flat_idx].add(w)
    return atlas.reshape(Ha, Wa, 3), wsum.reshape(Ha, Wa)
