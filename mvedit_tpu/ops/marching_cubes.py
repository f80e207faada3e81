"""Marching cubes via marching tetrahedra (static-shape jnp).

Replaces the reference's PyMCubes dependency (`extract_geometry`,
`lib/core/utils/geometry_utils.py:83-117`): each lattice cube splits into 6
tets and reuses the DMTet tables — fully jit-compatible (fixed buffers +
masks), differentiable w.r.t. the field, and welds vertices through the
precomputed unique-edge topology exactly like DMTet.
"""
from functools import lru_cache

import jax.numpy as jnp
import numpy as np

from ..models.mesh.dmtet import TetGrid, build_grid_tets, marching_tets

__all__ = ["marching_cubes", "extract_geometry"]


@lru_cache(maxsize=4)
def _grid_for(resolution):
    return build_grid_tets(resolution, crop_sphere=False)


def marching_cubes(field, iso=0.0, bound=1.0):
    """field: (R+1, R+1, R+1) scalar samples on the lattice over
    [-bound, bound]^3 (R a grid resolution). Returns (verts (E,3) jnp,
    faces (2T,3), vert_mask, face_mask) — static shapes.

    Positive (field - iso) is inside.
    """
    r = field.shape[0] - 1
    grid = _grid_for(r)
    sdf = (field.reshape(-1) - iso)
    out = marching_tets(grid, sdf)
    verts = out["verts"] * bound
    return verts, out["faces"], out["vert_mask"], out["face_mask"]


def extract_geometry(density_fn, resolution=128, threshold=10.0, bound=1.0,
                     chunk=262144):
    """NeRF density -> numpy mesh (geometry_utils.py:99-117 analog):
    evaluates the field on the lattice in chunks, marches, compacts."""
    xs = np.linspace(-bound, bound, resolution + 1, dtype=np.float32)
    pts = np.stack(np.meshgrid(xs, xs, xs, indexing="ij"), -1).reshape(-1, 3)
    vals = []
    for i in range(0, len(pts), chunk):
        vals.append(np.asarray(density_fn(jnp.asarray(pts[i:i + chunk]))))
    field = np.concatenate(vals).reshape(
        resolution + 1, resolution + 1, resolution + 1)
    verts, faces, vmask, fmask = marching_cubes(
        jnp.asarray(field), iso=threshold, bound=bound)
    verts = np.asarray(verts)
    faces = np.asarray(faces)[np.asarray(fmask)]
    used = np.unique(faces)
    remap = np.full(len(verts), -1, np.int64)
    remap[used] = np.arange(len(used))
    return verts[used], remap[faces].astype(np.int32)
