"""GRM: transformer gaussian-reconstruction network skeleton (flax).

Rebuilds `lib/models/architecture/grm.py:10-228` (the reference ships only
this skeleton; the GRM pipelines/weights are unreleased, README.md:33-35):
a ViT encoder over posed input views, a pixel-shuffle `GaussianUpsampler`,
and `unproject_depth` turning per-pixel depth into gaussian means. Pairs
with the XLA splatting renderer in `mesh/gaussians.py`.
"""
from dataclasses import dataclass

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..utils.geometry import get_ray_directions, get_rays

__all__ = ["GRMConfig", "GRMEncoder", "GaussianUpsampler",
           "unproject_depth", "pixels_to_gaussians"]


@dataclass(frozen=True)
class GRMConfig:
    patch_size: int = 8
    dim: int = 512
    depth: int = 12
    heads: int = 8
    out_channels: int = 14  # depth(1) + scale(3) + quat(4) + rgb(3) + op(1)
                            # + feat(2)


class GRMEncoder(nn.Module):
    cfg: GRMConfig = GRMConfig()

    @nn.compact
    def __call__(self, images, plucker):
        """images: (V, H, W, 3); plucker: (V, H, W, 6) ray embedding.

        Returns (V, H/ps, W/ps, dim) tokens as a feature map."""
        cfg = self.cfg
        x = jnp.concatenate([images, plucker], axis=-1)
        h = nn.Conv(cfg.dim, (cfg.patch_size, cfg.patch_size),
                    strides=(cfg.patch_size, cfg.patch_size),
                    name="patch_embed")(x)
        V, hp, wp, _ = h.shape
        t = h.reshape(1, V * hp * wp, cfg.dim)
        from .segmentors.dpt import ViTBlock
        for i in range(cfg.depth):
            t = ViTBlock(cfg.dim, cfg.heads, name=f"blocks_{i}")(t)
        t = nn.LayerNorm(name="norm")(t)
        return t.reshape(V, hp, wp, cfg.dim)


class GaussianUpsampler(nn.Module):
    """Pixel-shuffle upsampler: tokens -> per-pixel gaussian params
    (grm.py GaussianUpsampler)."""
    out_channels: int = 14
    factor: int = 8
    hidden: int = 256

    @nn.compact
    def __call__(self, feat):
        V, h, w, c = feat.shape
        r = self.factor
        x = nn.Conv(self.hidden, (3, 3), padding=1, name="conv1")(feat)
        x = jax.nn.gelu(x)
        x = nn.Conv(self.out_channels * r * r, (3, 3), padding=1,
                    name="conv2")(x)
        x = x.reshape(V, h, w, r, r, self.out_channels)
        x = x.transpose(0, 1, 3, 2, 4, 5).reshape(
            V, h * r, w * r, self.out_channels)
        return x


def unproject_depth(depth, poses, intrinsics):
    """Per-pixel depth -> world points (grm.py unproject_depth).

    depth: (V, H, W); poses (V, 3, 4); intrinsics (V, 4)."""
    V, H, W = depth.shape
    dirs = get_ray_directions(H, W, intrinsics)
    rays_o, rays_d = get_rays(dirs, poses, norm=False)
    return rays_o + rays_d * depth[..., None]


def pixels_to_gaussians(params_map, poses, intrinsics, depth_range=(0.1, 4.0)):
    """Split the (V, H, W, 14) upsampler output into gaussian attributes
    with world-space means."""
    d = jax.nn.sigmoid(params_map[..., 0])
    depth = depth_range[0] + d * (depth_range[1] - depth_range[0])
    means = unproject_depth(depth, poses, intrinsics)
    scales = jnp.exp(jnp.clip(params_map[..., 1:4], -8.0, 1.0)) * 0.01
    quats = params_map[..., 4:8]
    quats = quats / jnp.clip(
        jnp.linalg.norm(quats, axis=-1, keepdims=True), 1e-8, None)
    colors = jax.nn.sigmoid(params_map[..., 8:11])
    opac = jax.nn.sigmoid(params_map[..., 11])
    flat = lambda x: x.reshape(-1, *x.shape[3:])  # noqa
    return {"means": flat(means), "scales": flat(scales),
            "quats": flat(quats), "colors": flat(colors),
            "opacities": flat(opac)}
