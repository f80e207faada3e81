import numpy as np
import pytest

from mvedit_tpu.native import weld_vertices, decimate_qem, native_available
from mvedit_tpu.models.mesh.dmtet import build_grid_tets, marching_tets


def _sphere_mesh(res=24, r=0.6):
    import jax.numpy as jnp
    grid = build_grid_tets(res, crop_sphere=False)
    sdf = r - np.linalg.norm(grid.verts, axis=-1)
    out = marching_tets(grid, jnp.asarray(sdf))
    fm = np.asarray(out["face_mask"])
    f = np.asarray(out["faces"])[fm]
    v = np.asarray(out["verts"])
    used = np.unique(f)
    remap = np.full(len(v), -1, np.int64)
    remap[used] = np.arange(len(used))
    return v[used].astype(np.float32), remap[f].astype(np.int32)


def test_native_lib_builds():
    assert native_available(), "libmesh_native.so failed to build"


def test_weld_vertices():
    v = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0],
                  [1e-9, 0, 0], [1, 0, 0]], np.float32)
    f = np.array([[0, 1, 2], [3, 4, 2]], np.int32)
    v2, f2 = weld_vertices(v, f, eps=1e-6)
    assert len(v2) == 3
    np.testing.assert_array_equal(f2[0], f2[1])


def test_decimate_qem_sphere():
    v, f = _sphere_mesh()
    assert len(f) > 2000
    target = len(f) // 4
    v2, f2 = decimate_qem(v, f, target)
    assert len(f2) <= target * 1.2
    assert len(f2) > target * 0.3
    # decimated verts still near the sphere
    d = np.linalg.norm(v2, axis=-1)
    assert abs(np.median(d) - 0.6) < 0.05
    # valid indices
    assert f2.min() >= 0 and f2.max() < len(v2)


def test_decimate_noop_when_target_large():
    v, f = _sphere_mesh(12)
    v2, f2 = decimate_qem(v, f, len(f) + 10)
    assert len(f2) == len(f)
