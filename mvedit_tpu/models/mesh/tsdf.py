"""TSDF RGB-D fusion -> colored mesh (tsdf_rgbd_to_mesh analog).

TPU-native rebuild of the reference's Open3D ScalableTSDFVolume path
(`lib/models/decoders/mesh_renderer/mesh_utils.py:1031-1084`): fuse N
RGB-D renders into a dense truncated-signed-distance voxel grid, extract
the zero isosurface, prune small connected clusters, and quadric-decimate.

Design differences from the reference (which calls into Open3D's C++
sparse voxel-block integrator on CPU):

- **Integration is one jitted `lax.scan` over views** on a dense
  (G, G, G) grid — each view projects every voxel center, samples the
  depth/color maps at the nearest pixel, and folds the truncated SDF into
  running weighted averages. Dense-over-sparse is the right TPU trade:
  the grid is regular compute (no hash blocks), and at the default
  G = 256 the five accumulator channels are ~350 MB of HBM.
- **Extraction is narrow-band marching tetrahedra on host**: only cubes
  whose 8 corners are all observed and mix signs can emit triangles
  (O(G^2) of the G^3 cubes), so the host pass touches a few hundred
  thousand cubes instead of 16M. Reuses the DMTet triangle tables.
- Cluster pruning uses scipy connected components over the vertex graph
  (the reference uses Open3D `cluster_connected_triangles`,
  mesh_utils.py:1064-1071); decimation uses the native C++ QEM runtime
  (`native/mesh_native.cpp`) like the reference's
  `simplify_quadric_decimation` (:1075).
"""
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from .dmtet import BASE_TET_EDGES, TRIANGLE_TABLE
from .container import Mesh

__all__ = ["tsdf_integrate", "tsdf_to_mesh", "tsdf_rgbd_to_mesh"]

# cube corners in (dx, dy, dz); 6-tet decomposition around diagonal 0-7
# (same decomposition as build_grid_tets, dmtet.py:144-146)
_CORNERS = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0], [1, 1, 0],
                     [0, 0, 1], [1, 0, 1], [0, 1, 1], [1, 1, 1]], np.int64)
_TET_CORNER = np.array([
    [0, 1, 3, 7], [0, 3, 2, 7], [0, 2, 6, 7],
    [0, 6, 4, 7], [0, 4, 5, 7], [0, 5, 1, 7]], np.int64)


@partial(jax.jit, static_argnames=("resolution", "z_chunk"))
def tsdf_integrate(rgbs, depths, w2cs, intrinsics, bound=1.0,
                   resolution=256, sdf_trunc=None, depth_trunc=10.0,
                   z_chunk=32):
    """Fuse RGB-D views into a dense TSDF grid.

    Args:
      rgbs: (N, H, W, 3) float in [0, 1].
      depths: (N, H, W) float camera-space depth (0 = no reading).
      w2cs: (N, 4, 4) or (N, 3, 4) world-to-camera (OpenCV convention).
      intrinsics: (N, 4) fx fy cx cy.
      bound: grid spans [-bound, bound]^3.
      resolution: grid size G (voxel_length = 2*bound/G, matching
        mesh_utils.py:1044).
      sdf_trunc: truncation distance; default 2*bound*0.02 (:1045).
      depth_trunc: ignore depth readings beyond this (:1054).

    Returns dict with "tsdf" (G,G,G) [+outside/-inside, +1 at unobserved],
    "weight" (G,G,G), "color" (G,G,G,3).
    """
    G = resolution
    if sdf_trunc is None:
        sdf_trunc = 2.0 * bound * 0.02
    n, h, w = depths.shape
    xs = (jnp.arange(G) + 0.5) / G * (2.0 * bound) - bound
    # voxel centers, processed in z-slabs to bound the working set
    depths = jnp.asarray(depths, jnp.float32)
    rgbs = jnp.asarray(rgbs, jnp.float32)

    def integrate_view(acc, view):
        tsdf_w, col_w, wsum = acc
        depth, rgb, w2c, intr = view

        def slab(zi):
            # (G, G, Zc, 3) voxel centers for this z-slab
            z = jax.lax.dynamic_slice(xs, (zi,), (z_chunk,))
            gx, gy, gz = jnp.meshgrid(xs, xs, z, indexing="ij")
            p = jnp.stack([gx, gy, gz], -1).reshape(-1, 3)
            cam = p @ w2c[:3, :3].T + w2c[:3, 3]
            zc = cam[:, 2]
            u = intr[0] * cam[:, 0] / jnp.maximum(zc, 1e-6) + intr[2]
            v = intr[1] * cam[:, 1] / jnp.maximum(zc, 1e-6) + intr[3]
            ui = jnp.round(u).astype(jnp.int32)
            vi = jnp.round(v).astype(jnp.int32)
            inb = (zc > 1e-6) & (ui >= 0) & (ui < w) & (vi >= 0) & (vi < h)
            uc = jnp.clip(ui, 0, w - 1)
            vc = jnp.clip(vi, 0, h - 1)
            d = depth[vc, uc]
            c = rgb[vc, uc]
            sdf = d - zc
            obs = inb & (d > 1e-6) & (d < depth_trunc) & (sdf > -sdf_trunc)
            tsdf_obs = jnp.minimum(sdf / sdf_trunc, 1.0)
            wt = obs.astype(jnp.float32)
            return (tsdf_obs * wt).reshape(G, G, z_chunk), \
                (c * wt[:, None]).reshape(G, G, z_chunk, 3), \
                wt.reshape(G, G, z_chunk)

        t_new, c_new, w_new = jax.lax.map(
            slab, jnp.arange(0, G, z_chunk))
        # (G/Zc, G, G, Zc) -> (G, G, G)
        def detile(x):
            extra = x.shape[4:]
            return jnp.moveaxis(x, 0, 2).reshape(G, G, G, *extra)
        return (tsdf_w + detile(t_new), col_w + detile(c_new),
                wsum + detile(w_new)), None

    init = (jnp.zeros((G, G, G)), jnp.zeros((G, G, G, 3)),
            jnp.zeros((G, G, G)))
    (tsdf_w, col_w, wsum), _ = jax.lax.scan(
        integrate_view, init,
        (depths, rgbs, jnp.asarray(w2cs, jnp.float32)[:, :3],
         jnp.asarray(intrinsics, jnp.float32)))
    wc = jnp.maximum(wsum, 1e-8)
    return {"tsdf": jnp.where(wsum > 0, tsdf_w / wc, 1.0),
            "weight": wsum, "color": col_w / wc[..., None]}


def tsdf_to_mesh(tsdf, weight, color, bound=1.0, prune_thr=800,
                 mesh_reduction=0.2):
    """Extract + prune + decimate the fused grid into a colored Mesh.

    Host-side numpy narrow-band marching tetrahedra; `prune_thr` /
    `mesh_reduction` follow mesh_utils.py:1031-1076.
    """
    tsdf = np.asarray(tsdf)
    weight = np.asarray(weight)
    color = np.asarray(color)
    G = tsdf.shape[0]
    occ = tsdf > 0

    # narrow band: cubes with all-observed corners and mixed corner signs
    def corner(a, dx, dy, dz):
        return a[dx:G - 1 + dx, dy:G - 1 + dy, dz:G - 1 + dz]

    obs_all = np.ones((G - 1,) * 3, bool)
    pos_any = np.zeros((G - 1,) * 3, bool)
    neg_any = np.zeros((G - 1,) * 3, bool)
    for dx, dy, dz in _CORNERS:
        obs_all &= corner(weight, dx, dy, dz) > 0
        o = corner(occ, dx, dy, dz)
        pos_any |= o
        neg_any |= ~o
    sel = np.argwhere(obs_all & pos_any & neg_any)      # (S, 3)
    if len(sel) == 0:
        return Mesh(v=np.zeros((0, 3), np.float32),
                    f=np.zeros((0, 3), np.int32))

    # global corner vertex ids + values for selected cubes
    cid = (sel[:, None, 0] + _CORNERS[None, :, 0]) * G * G \
        + (sel[:, None, 1] + _CORNERS[None, :, 1]) * G \
        + (sel[:, None, 2] + _CORNERS[None, :, 2])       # (S, 8)
    sval = tsdf.reshape(-1)[cid]                         # (S, 8)

    # marching tets over the 6-tet decomposition
    t_cid = cid[:, _TET_CORNER].reshape(-1, 4)           # (S*6, 4)
    t_val = sval[:, _TET_CORNER].reshape(-1, 4)
    t_occ = (t_val > 0).astype(np.int64)
    case = t_occ @ np.array([1, 2, 4, 8])
    tris = TRIANGLE_TABLE[case]                          # (S*6, 6) edge ids
    # edges as sorted global corner-id pairs
    e_a = t_cid[:, BASE_TET_EDGES[:, 0]]                 # (S*6, 6)
    e_b = t_cid[:, BASE_TET_EDGES[:, 1]]
    ekey = (np.minimum(e_a, e_b).astype(np.int64) * (G ** 3)
            + np.maximum(e_a, e_b))
    # faces: gather the (up to 2) triangles per tet
    fmask = tris >= 0
    tri_edge = np.where(fmask, tris, 0)
    fkeys = np.take_along_axis(ekey, tri_edge, axis=1)   # (S*6, 6)
    fkeys = fkeys.reshape(-1, 3)[fmask.reshape(-1, 3).all(axis=1)]
    if len(fkeys) == 0:
        return Mesh(v=np.zeros((0, 3), np.float32),
                    f=np.zeros((0, 3), np.int32))
    uniq, faces = np.unique(fkeys.reshape(-1), return_inverse=True)
    # the DMTet tables orient faces outward for a positive-OUTSIDE field,
    # which is exactly the TSDF sign convention — winding kept as-is
    faces = faces.reshape(-1, 3).astype(np.int32)

    # interpolate unique edge vertices
    ua = (uniq // (G ** 3)).astype(np.int64)
    ub = (uniq % (G ** 3)).astype(np.int64)
    sa = tsdf.reshape(-1)[ua]
    sb = tsdf.reshape(-1)[ub]
    denom = sa - sb
    denom = np.where(np.abs(denom) < 1e-10, 1e-10, denom)
    wa = np.clip(sa / denom, 0.0, 1.0)                   # weight of b

    def grid_pos(i):
        xyz = np.stack([i // (G * G), (i // G) % G, i % G], -1)
        return ((xyz + 0.5) / G * (2.0 * bound) - bound).astype(np.float32)

    pa, pb = grid_pos(ua), grid_pos(ub)
    verts = pa * (1 - wa[:, None]) + pb * wa[:, None]
    cgrid = color.reshape(-1, 3)
    vc = (cgrid[ua] * (1 - wa[:, None]) + cgrid[ub] * wa[:, None]
          ).astype(np.float32)

    # drop degenerate faces (repeated vertex ids)
    good = ((faces[:, 0] != faces[:, 1]) & (faces[:, 1] != faces[:, 2])
            & (faces[:, 0] != faces[:, 2]))
    faces = faces[good]

    # cluster pruning: connected components over the vertex graph,
    # remove faces whose cluster has < prune_thr triangles
    if prune_thr > 0 and len(faces):
        import scipy.sparse as sp
        from scipy.sparse.csgraph import connected_components
        V = len(verts)
        e = np.concatenate([faces[:, [0, 1]], faces[:, [1, 2]],
                            faces[:, [2, 0]]])
        adj = sp.coo_matrix(
            (np.ones(len(e)), (e[:, 0], e[:, 1])), shape=(V, V))
        _, comp = connected_components(adj, directed=False)
        fcomp = comp[faces[:, 0]]
        counts = np.bincount(fcomp, minlength=comp.max() + 1)
        faces = faces[counts[fcomp] >= prune_thr]

    # compact unused vertices
    used = np.unique(faces)
    remap = np.full(len(verts), -1, np.int64)
    remap[used] = np.arange(len(used))
    verts, vc = verts[used], vc[used]
    faces = remap[faces].astype(np.int32)

    # quadric decimation via the native runtime (reference :1075)
    if 0 < mesh_reduction < 1 and len(faces) > 16:
        try:
            from ...native import decimate_qem, native_available
            if native_available():
                verts2, faces2 = decimate_qem(
                    verts, faces, int(round(len(faces) * mesh_reduction)))
                # carry colors by nearest original vertex
                from scipy.spatial import cKDTree
                vc = vc[cKDTree(verts).query(verts2)[1]]
                verts, faces = verts2.astype(np.float32), \
                    faces2.astype(np.int32)
        except Exception:
            pass  # keep the full-res mesh if the native lib is absent

    mesh = Mesh(v=verts.astype(np.float32), f=faces,
                vc=np.clip(vc, 0.0, 1.0))
    if len(faces):
        mesh.auto_normal()
    return mesh


def tsdf_rgbd_to_mesh(rgbs, depths, poses, intrinsics, bound=1.0,
                      voxel_resolution=256, prune_thr=800,
                      mesh_reduction=0.2, depth_trunc=10.0):
    """End-to-end fusion (mesh_utils.py:1031 signature parity).

    `poses` are (N, 4, 4) camera-to-world; inverted here like the
    reference (:1048)."""
    poses = np.asarray(poses, np.float32)
    w2cs = np.linalg.inv(poses)
    out = tsdf_integrate(jnp.asarray(rgbs), jnp.asarray(depths),
                         jnp.asarray(w2cs), jnp.asarray(intrinsics),
                         bound=bound, resolution=voxel_resolution,
                         depth_trunc=depth_trunc)
    return tsdf_to_mesh(out["tsdf"], out["weight"], out["color"],
                        bound=bound, prune_thr=prune_thr,
                        mesh_reduction=mesh_reduction)
