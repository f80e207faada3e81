"""Multiresolution hash-grid encoding (instant-NGP style), TPU-native.

Replaces the reference's external tiny-cuda-nn HashGrid dependency
(`lib/models/decoders/ingp_decoder.py:62-74`: n_levels 12-14, 2 features per
level, 2**19 table, base_resolution 16, Smoothstep interpolation, fp32 table).

Design for TPU instead of translating tcnn's CUDA:
- the whole table for all levels lives in ONE (L, T, F) fp32 array — a pytree
  leaf that optax can update like any parameter;
- the 8-corner lookup is a vectorized `take_along_axis` gather over the level
  axis, batched over points, so XLA emits one fused gather per corner; the MLP
  that consumes the features dominates FLOPs and lands on the MXU;
- levels whose dense grid fits in the table use the injective linear index
  (matching tcnn: hashing only kicks in when (res+1)^3 > table size), so
  coarse levels behave exactly like dense grids;
- Smoothstep interpolation weights (w = t*t*(3-2t)) give C1 continuity; the
  density double-derivative used by normal losses stays finite.
"""
import math
from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp

__all__ = ["HashGridConfig", "hash_grid_init", "hash_grid_encode"]

_PRIMES = (1, 2654435761, 805459861)


@dataclass(frozen=True)
class HashGridConfig:
    n_levels: int = 12
    n_features: int = 2
    log2_hashmap_size: int = 19
    base_resolution: int = 16
    max_resolution: int = 320  # at bound 1; per_level_scale derived like ref
    bound: float = 1.0
    interpolation: str = "smoothstep"  # or "linear"

    @property
    def table_size(self):
        return 1 << self.log2_hashmap_size

    @property
    def per_level_scale(self):
        # per_level_scale = exp2(log2(max_res * bound / base_res) / (L - 1)),
        # matching ingp_decoder.py:72
        return 2.0 ** (
            math.log2(self.max_resolution * self.bound / self.base_resolution)
            / max(self.n_levels - 1, 1))

    def level_resolution(self, level):
        return int(math.floor(self.base_resolution * self.per_level_scale ** level))

    @property
    def out_dim(self):
        return self.n_levels * self.n_features


def hash_grid_init(key, cfg: HashGridConfig, scale=1e-4):
    """Uniform(-scale, scale) table, matching ingp_decoder.py:91."""
    shape = (cfg.n_levels, cfg.table_size, cfg.n_features)
    return jax.random.uniform(key, shape, jnp.float32, -scale, scale)


def _level_index(corner, res, table_size):
    """corner: (..., 3) int32 grid coords in [0, res]. -> (...) int32 index."""
    n_dense = (res + 1) ** 3
    if n_dense <= table_size:
        idx = (corner[..., 2] * (res + 1) + corner[..., 1]) * (res + 1) \
            + corner[..., 0]
        return idx
    c = corner.astype(jnp.uint32)
    h = c[..., 0] * jnp.uint32(_PRIMES[0])
    h = h ^ (c[..., 1] * jnp.uint32(_PRIMES[1]))
    h = h ^ (c[..., 2] * jnp.uint32(_PRIMES[2]))
    # table_size is a power of two -> cheap masking modulo
    return (h & jnp.uint32(table_size - 1)).astype(jnp.int32)


import numpy as _np

# (8, 3) corner offsets as a host constant (a cached jnp array created
# inside a trace would leak tracers)
_CORNERS_NP = _np.asarray(
    [[dx, dy, dz] for dz in (0, 1) for dy in (0, 1) for dx in (0, 1)],
    _np.int32)


def _corner_offsets():
    return jnp.asarray(_CORNERS_NP)


@partial(jax.jit, static_argnames=("cfg",))
def hash_grid_encode(table, xyz, cfg: HashGridConfig):
    """Encode points with the multiresolution hash grid.

    Args:
        table: (L, T, F) fp32 parameter array.
        xyz: (..., 3) points in [0, 1] (caller normalizes by the AABB, as the
            reference does at `ingp_decoder.py:117`).
    Returns:
        (..., L * F) float32 features.

    Layout note: each (level, corner) is its own (P,) take — a fused
    (P, L, 8, F) gather looks tidy but the TPU tile layout pads the tiny
    trailing dims (12, 8) -> (16, 128), a 21x memory blowup that OOMs at
    render sizes. The per-take (P, F) buffers pad far less.
    """
    batch_shape = xyz.shape[:-1]
    x = jnp.clip(xyz.reshape(-1, 3).astype(jnp.float32), 0.0, 1.0)
    P = x.shape[0]
    flat = table.reshape(cfg.n_levels * cfg.table_size, cfg.n_features)
    corners = _CORNERS_NP
    feats = []
    for level in range(cfg.n_levels):
        res = cfg.level_resolution(level)
        pos = x * res
        p0 = jnp.floor(pos)
        t = pos - p0
        if cfg.interpolation == "smoothstep":
            w = t * t * (3.0 - 2.0 * t)
        else:
            w = t
        p0i = p0.astype(jnp.int32)
        acc = jnp.zeros((P, cfg.n_features), jnp.float32)
        for c in range(8):
            dx, dy, dz = corners[c]
            corner = jnp.minimum(
                p0i + jnp.asarray([dx, dy, dz], jnp.int32), res)
            idx = _level_index(corner, res, cfg.table_size) \
                + level * cfg.table_size
            v = jnp.take(flat, idx, axis=0)  # (P, F)
            wx = w[:, 0] if dx else 1.0 - w[:, 0]
            wy = w[:, 1] if dy else 1.0 - w[:, 1]
            wz = w[:, 2] if dz else 1.0 - w[:, 2]
            acc = acc + v * (wx * wy * wz)[:, None]
        feats.append(acc)
    out = jnp.concatenate(feats, axis=-1)
    return out.reshape(*batch_shape, cfg.out_dim)
