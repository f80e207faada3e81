"""Sparse-voxel linear interpolation, TPU-native.

Replaces the reference's spconv-backed `lib/ops/volume_interp.py:1-310`
(`spvolume_linear_interp`, `neighbor_spvolume_linear_interp`,
`coord_to_feat_idx_search`, `build_neighbor`), used by the sparse-volume
SSDNeRF research architectures (`lib/models/architecture/volume.py`).

TPU design notes (vs the CUDA/spconv original):
- A sparse volume is a static-capacity struct: `indices (N, 4)` int32 rows
  of [batch, d, h, w], `features (N, C)`, and an `active (N,)` mask so the
  row count is a compile-time constant while the live count is data.
- Voxel lookup is a packed-integer key search: coordinates bit-pack into a
  monotone scalar key (same encoding as the reference's `_encode_coords`),
  rows are kept sorted by key, and queries run one `jnp.searchsorted` per
  corner — the same primitive this repo's DMTet compaction uses; no hash
  tables, no dynamic shapes.
- Interpolation is a dense (P, 8) gather + weighted sum on the VPU. The
  reference builds a (P, num_feats) COO matrix and calls cusparse mm —
  a GPU-ism; the gather form is exact and fuses with the weight math.
- `prune=True` in the reference compresses rows away (dynamic shape). Here
  outputs keep static shape (P, C): invalid points produce zero rows and
  are flagged in `valid_pts_mask`. Downstream code masks instead of
  compacting.
"""
from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "SparseVolume", "sparse_volume", "encode_coords", "coord_to_feat_idx",
    "spvolume_linear_interp", "NeighborData", "build_neighbor",
    "neighbor_spvolume_linear_interp", "dense_from_sparse",
    "sparse_from_dense",
]

# 8 corner offsets of a unit cell, reference grid order
# (lib/ops/volume_interp.py:154-156); host constant so importing this
# module does not initialize a JAX backend
_CORNERS = np.array(
    [[0, 0, 0], [0, 0, 1], [0, 1, 0], [0, 1, 1],
     [1, 0, 0], [1, 0, 1], [1, 1, 0], [1, 1, 1]], np.int32)


def _shifts(spatial_shape, batch_size):
    """Static bit widths/shifts for packing [b, d, h, w] into one int."""
    bits = [max(int(s - 1).bit_length(), 1) for s in spatial_shape]
    bbits = max(int(batch_size - 1).bit_length(), 1)
    total = bbits + sum(bits)
    dtype = jnp.int32 if total < 31 else jnp.int64
    shifts = (bits[0] + bits[1] + bits[2], bits[1] + bits[2], bits[2])
    return shifts, dtype


def encode_coords(coords, spatial_shape, batch_size=16):
    """Pack (..., 4) [batch, d, h, w] coords into monotone scalar keys.

    Matches the reference `_encode_coords` (volume_interp.py:9-25) except
    the batch field is bounded (for int32 keys) instead of unbounded.
    """
    shifts, dtype = _shifts(spatial_shape, batch_size)
    c = coords.astype(dtype)
    return ((c[..., 0] << shifts[0]) | (c[..., 1] << shifts[1])
            | (c[..., 2] << shifts[2]) | c[..., 3])


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class SparseVolume:
    """Static-capacity sparse voxel tensor (spconv.SparseConvTensor stand-in).

    Rows are sorted by encoded coordinate key; inactive rows carry the
    maximal key so they sort last and never match a query.
    """
    indices: jnp.ndarray     # (N, 4) int32 [batch, d, h, w]
    features: jnp.ndarray    # (N, C)
    keys: jnp.ndarray        # (N,) sorted encoded coords
    active: jnp.ndarray      # (N,) bool
    spatial_shape: tuple     # static (D, H, W)
    batch_size: int          # static

    def tree_flatten(self):
        return ((self.indices, self.features, self.keys, self.active),
                (self.spatial_shape, self.batch_size))

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, spatial_shape=aux[0], batch_size=aux[1])

    @property
    def capacity(self):
        return self.indices.shape[0]

    @property
    def num_active(self):
        return jnp.sum(self.active.astype(jnp.int32))


def sparse_volume(indices, features, spatial_shape, batch_size,
                  active=None) -> SparseVolume:
    """Build a SparseVolume, sorting rows by encoded key (done once;
    the reference sorts lazily in `_prepare_search_vars`)."""
    indices = jnp.asarray(indices, jnp.int32)
    features = jnp.asarray(features)
    if active is None:
        active = jnp.ones((indices.shape[0],), bool)
    keys = encode_coords(indices, spatial_shape, batch_size)
    big = jnp.asarray(jnp.iinfo(keys.dtype).max, keys.dtype)
    keys = jnp.where(active, keys, big)
    order = jnp.argsort(keys)
    return SparseVolume(indices=indices[order], features=features[order],
                        keys=keys[order], active=active[order],
                        spatial_shape=tuple(spatial_shape),
                        batch_size=int(batch_size))


def coord_to_feat_idx(vol: SparseVolume, query):
    """Row index of each queried voxel [batch, d, h, w]; valid=False (and
    idx clamped) where the voxel is absent. Reference:
    `coord_to_feat_idx_search` (volume_interp.py:77-94)."""
    q = jnp.asarray(query, jnp.int32)
    shape_arr = jnp.array((vol.batch_size,) + vol.spatial_shape, jnp.int32)
    in_bounds = jnp.all((q >= 0) & (q < shape_arr), axis=-1)
    qk = encode_coords(jnp.where(in_bounds[..., None], q, 0),
                       vol.spatial_shape, vol.batch_size)
    idx = jnp.clip(jnp.searchsorted(vol.keys, qk), 0, vol.capacity - 1)
    valid = in_bounds & (vol.keys[idx] == qk) & vol.active[idx]
    return idx, valid


def _pt_cell_coords(vol, pts):
    """[-1,1] points -> continuous voxel-index coords (reference's
    half-pixel convention, align_corners=False only)."""
    s = jnp.array(vol.spatial_shape, pts.dtype)
    return pts * (s / 2) + (s / 2 - 0.5)


def _corner_weights(frac):
    """(P, 8) trilinear weights for _CORNERS given (P, 3) fractional."""
    w = (1.0 - _CORNERS.astype(frac.dtype)) - frac[:, None, :]
    return jnp.abs(jnp.prod(w, axis=2))


def _masked_valid(vol, pt_inds, batch_inds):
    """masked=True semantics: a point is valid iff its *nearest* voxel is
    active (reference volume_interp.py:180-188)."""
    pr = jnp.round(pt_inds).astype(jnp.int32)
    q = jnp.concatenate([batch_inds.astype(jnp.int32), pr], axis=-1)
    _, valid = coord_to_feat_idx(vol, q)
    return valid


def spvolume_linear_interp(vol: SparseVolume, pts, batch_inds, masked=True,
                           normalize=None, eps=1e-6):
    """Trilinear interpolation of sparse voxel features at points.

    Args:
        pts: (P, 3) in [d, h, w] order, range [-1, 1].
        batch_inds: (P, 1) int.
        masked: points whose nearest voxel is empty are invalid.
        normalize: divide by the sum of valid corner weights
            (defaults to `masked`).

    Returns:
        (out_feats (P, C), valid_pts_mask (P,)); invalid rows are zero
        (the reference prunes them away instead — dynamic shape).
    Reference: `spvolume_linear_interp` (volume_interp.py:153-227).
    """
    if normalize is None:
        normalize = masked
    pt_inds = _pt_cell_coords(vol, pts)
    floor = jnp.floor(pt_inds)
    frac = pt_inds - floor
    corners = floor.astype(jnp.int32)[:, None, :] + _CORNERS  # (P, 8, 3)
    b8 = jnp.broadcast_to(batch_inds.astype(jnp.int32)[:, None, :],
                          corners.shape[:2] + (1,))
    idx, cvalid = coord_to_feat_idx(
        vol, jnp.concatenate([b8, corners], axis=-1))      # (P, 8)
    w = _corner_weights(frac) * cvalid.astype(frac.dtype)  # (P, 8)
    feats = vol.features[idx]                              # (P, 8, C)
    out = jnp.einsum("pk,pkc->pc", w.astype(feats.dtype), feats)
    if normalize:
        out = out / (eps + jnp.sum(w, axis=1, dtype=feats.dtype))[:, None]
    if masked:
        valid = _masked_valid(vol, pt_inds, batch_inds)
    else:
        valid = jnp.any(cvalid, axis=-1)
    return out * valid[:, None].astype(out.dtype), valid


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class NeighborData:
    """Cached per-floor-cell corner row indices (static capacity).

    Reference: `NeighborData`/`build_neighbor` (volume_interp.py:113-151).
    On TPU both the cached and direct paths are searchsorted+gather; the
    cache trades 8 key searches per point for 1.
    """
    keys: jnp.ndarray          # (F,) sorted encoded floor coords (D+1 grid)
    corner_idx: jnp.ndarray    # (F, 8) feature row idx
    corner_valid: jnp.ndarray  # (F, 8) bool
    active: jnp.ndarray        # (F,) bool
    spatial_shape_p1: tuple
    batch_size: int

    def tree_flatten(self):
        return ((self.keys, self.corner_idx, self.corner_valid, self.active),
                (self.spatial_shape_p1, self.batch_size))

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, spatial_shape_p1=aux[0], batch_size=aux[1])


def build_neighbor(vol: SparseVolume, capacity=None) -> NeighborData:
    """Precompute, for every grid cell with >=1 active corner voxel, the
    8 corner feature rows. Floor cells live on the (D+1, H+1, W+1) grid
    (cell f covers voxels f-1+g, g in corners), as in the reference's
    maxpool-dilated mask (volume_interp.py:132-151)."""
    if capacity is None:
        capacity = min(8 * vol.capacity,
                       vol.batch_size * int(jnp.prod(jnp.array(
                           [s + 1 for s in vol.spatial_shape]))))
    sp1 = tuple(s + 1 for s in vol.spatial_shape)
    # a voxel v activates the 8 floor cells v + g (cell coords = v+1-corner)
    cells = (vol.indices[:, None, 1:] + _CORNERS[None])       # (N, 8, 3)
    b8 = jnp.broadcast_to(vol.indices[:, None, :1], cells.shape[:2] + (1,))
    cell_keys = encode_coords(
        jnp.concatenate([b8, cells], -1), sp1, vol.batch_size).reshape(-1)
    big = jnp.asarray(jnp.iinfo(cell_keys.dtype).max, cell_keys.dtype)
    cell_keys = jnp.where(jnp.repeat(vol.active, 8), cell_keys, big)
    sk = jnp.sort(cell_keys)
    # unique via first-occurrence compaction into the static capacity
    first = jnp.concatenate([jnp.array([True]), sk[1:] != sk[:-1]])
    first &= sk != big
    pos = jnp.cumsum(first.astype(jnp.int32))
    # slot i <- the i-th unique key (searchsorted over the prefix counts)
    slot_src = jnp.searchsorted(
        pos, jnp.arange(1, capacity + 1, dtype=pos.dtype), side="left")
    slot_src = jnp.clip(slot_src, 0, sk.shape[0] - 1)
    fkeys = sk[slot_src]
    factive = jnp.arange(capacity) < pos[-1]
    fkeys = jnp.where(factive, fkeys, big)
    # decode floor coords back out of the packed key
    shifts, _ = _shifts(sp1, vol.batch_size)
    fb = fkeys >> shifts[0]
    fd = (fkeys >> shifts[1]) & ((1 << (shifts[0] - shifts[1])) - 1)
    fh = (fkeys >> shifts[2]) & ((1 << (shifts[1] - shifts[2])) - 1)
    fw = fkeys & ((1 << shifts[2]) - 1)
    fcoords = jnp.stack([fb, fd, fh, fw], -1).astype(jnp.int32)
    # corner voxels of each floor cell: f - 1 + g
    corn = fcoords[:, None, 1:] - 1 + _CORNERS[None]
    cb = jnp.broadcast_to(fcoords[:, None, :1], corn.shape[:2] + (1,))
    cidx, cvalid = coord_to_feat_idx(
        vol, jnp.concatenate([cb, corn], -1))
    cvalid &= factive[:, None]
    return NeighborData(keys=fkeys, corner_idx=cidx, corner_valid=cvalid,
                        active=factive, spatial_shape_p1=sp1,
                        batch_size=vol.batch_size)


def neighbor_spvolume_linear_interp(vol: SparseVolume, pts, batch_inds,
                                    neighbor: NeighborData = None,
                                    masked=True, normalize=None, eps=1e-6):
    """`spvolume_linear_interp` through a prebuilt NeighborData cache.
    Reference: volume_interp.py:228-310."""
    if neighbor is None:
        neighbor = build_neighbor(vol)
    if normalize is None:
        normalize = masked
    pt_inds = _pt_cell_coords(vol, pts)
    floor = jnp.floor(pt_inds)
    frac = pt_inds - floor
    fcell = floor.astype(jnp.int32) + 1  # floor cell on the +1 grid
    q = jnp.concatenate([batch_inds.astype(jnp.int32), fcell], -1)
    sp1 = neighbor.spatial_shape_p1
    shape_arr = jnp.array((neighbor.batch_size,) + sp1, jnp.int32)
    in_bounds = jnp.all((q >= 0) & (q < shape_arr), axis=-1)
    qk = encode_coords(jnp.where(in_bounds[:, None], q, 0), sp1,
                       neighbor.batch_size)
    fi = jnp.clip(jnp.searchsorted(neighbor.keys, qk), 0,
                  neighbor.keys.shape[0] - 1)
    cell_ok = in_bounds & (neighbor.keys[fi] == qk) & neighbor.active[fi]
    cvalid = neighbor.corner_valid[fi] & cell_ok[:, None]   # (P, 8)
    idx = neighbor.corner_idx[fi]                           # (P, 8)
    w = _corner_weights(frac) * cvalid.astype(frac.dtype)
    feats = vol.features[idx]
    out = jnp.einsum("pk,pkc->pc", w.astype(feats.dtype), feats)
    if normalize:
        out = out / (eps + jnp.sum(w, axis=1, dtype=feats.dtype))[:, None]
    if masked:
        valid = _masked_valid(vol, pt_inds, batch_inds)
    else:
        valid = jnp.any(cvalid, axis=-1)
    return out * valid[:, None].astype(out.dtype), valid


def dense_from_sparse(vol: SparseVolume):
    """Scatter to dense (B, D, H, W, C) features + (B, D, H, W) bool mask
    (the masked-dense representation `models/volume_unet.py` computes in)."""
    B, (D, H, W) = vol.batch_size, vol.spatial_shape
    C = vol.features.shape[1]
    dense = jnp.zeros((B, D, H, W, C), vol.features.dtype)
    mask = jnp.zeros((B, D, H, W), bool)
    idx = jnp.where(vol.active[:, None], vol.indices, 0)
    feats = vol.features * vol.active[:, None].astype(vol.features.dtype)
    b, d, h, w = idx[:, 0], idx[:, 1], idx[:, 2], idx[:, 3]
    dense = dense.at[b, d, h, w].add(feats)
    mask = mask.at[b, d, h, w].max(vol.active)
    return dense, mask


def sparse_from_dense(dense, mask, capacity) -> SparseVolume:
    """Gather active voxels of a dense (B, D, H, W, C) + mask volume into a
    static-capacity SparseVolume (cumsum-prefix compaction)."""
    B, D, H, W, C = dense.shape
    flat_m = mask.reshape(-1)
    pos = jnp.cumsum(flat_m.astype(jnp.int32))
    slot_src = jnp.searchsorted(
        pos, jnp.arange(1, capacity + 1, dtype=pos.dtype), side="left")
    slot_src = jnp.clip(slot_src, 0, flat_m.shape[0] - 1)
    active = jnp.arange(capacity) < pos[-1]
    lin = slot_src
    w = lin % W
    h = (lin // W) % H
    d = (lin // (W * H)) % D
    b = lin // (W * H * D)
    indices = jnp.stack([b, d, h, w], -1).astype(jnp.int32)
    feats = dense.reshape(-1, C)[lin]
    return sparse_volume(indices, feats, (D, H, W), B, active=active)
