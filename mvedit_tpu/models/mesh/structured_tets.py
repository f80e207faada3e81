"""Structured marching tetrahedra: closed-form topology, no tables.

TPU-native redesign of the DMTet extraction (round 3). The generic
`marching_tets_compact` (dmtet.py) carries the grid topology as explicit
index tables (tets (T,4), unique_edges (E,2), tet->edge (T,6)) and pays
~100M random HBM gathers per extraction — measured 1.78 s/step at tet
res 128, the dominant cost of the mesh-fit inner loop (~4.7 s/step,
benchmarks/prof_mesh_fit.py + prof_extract_bwd.py).

But the grid IS structured: every cube of the lattice splits into the
same 6 tets around the main diagonal, so all topology is index
arithmetic:

- cube-corner occupancies come from 8 SLICES of the (g+1)^3 occupancy
  volume — zero gathers;
- the edge set decomposes into 7 classes (3 axis, 3 face-diagonal, 1
  body-diagonal), each a dense lattice: crossing masks are slice XORs,
  and an edge id <-> (class, anchor) is div/mod arithmetic;
- per-tet triangle emission uses the standard 16-entry marching-tets
  tables (tiny, VMEM-resident), addressed by elementwise tet indices.

Random gathers only happen at CAP scale (crossing edges, emitted faces):
~3M sites instead of ~100M. Gradients flow through the same sdf-lerp as
the generic path (identical math), w.r.t. sdf and per-vertex deform on
the full (g+1)^3 lattice.

Replaces the role of the reference's per-step `torch.unique` edge build
(`lib/models/decoders/mesh_renderer/base_mesh_renderer.py:140-188`) and
our own table-driven port; the sphere crop of the reference's quartet
grids becomes a static cell mask (no index compaction needed).
"""
from dataclasses import dataclass, field
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from .dmtet import TRIANGLE_TABLE, NUM_TRIANGLES_TABLE, BASE_TET_EDGES

__all__ = ["StructuredTetGrid", "marching_tets_structured",
           "marching_tets_topology", "marching_tets_verts"]

# 6-tet decomposition of the unit cube around diagonal 0-7 (same pattern
# as dmtet.build_grid_tets; corner n has coords (n&1, n>>1&1, n>>2&1))
TET_CORNERS = np.array([
    [0, 1, 3, 7], [0, 3, 2, 7], [0, 2, 6, 7],
    [0, 6, 4, 7], [0, 4, 5, 7], [0, 5, 1, 7]], np.int32)

# edge classes: direction vectors (order fixed — defines edge-id layout)
EDGE_DIRS = np.array([
    [1, 0, 0], [0, 1, 0], [0, 0, 1],
    [1, 1, 0], [1, 0, 1], [0, 1, 1], [1, 1, 1]], np.int32)


def _corner_bits(n):
    return np.array([n & 1, (n >> 1) & 1, (n >> 2) & 1], np.int32)


def _build_edge_tables():
    """(6, 6) class ids + (6, 6, 3) anchor offsets for (pattern, local
    edge) -> global edge, derived from TET_CORNERS x BASE_TET_EDGES."""
    cls = np.zeros((6, 6), np.int32)
    off = np.zeros((6, 6, 3), np.int32)
    dir_lut = {tuple(d): i for i, d in enumerate(EDGE_DIRS)}
    for p in range(6):
        for l in range(6):
            a, b = TET_CORNERS[p][BASE_TET_EDGES[l]]
            ba, bb = _corner_bits(a), _corner_bits(b)
            anchor = np.minimum(ba, bb)
            d = np.abs(bb - ba)
            cls[p, l] = dir_lut[tuple(d)]
            off[p, l] = anchor
    return cls, off

EDGE_CLASS, EDGE_OFFSET = _build_edge_tables()


@dataclass(frozen=True, eq=False)  # identity hash: jit-static friendly
class StructuredTetGrid:
    """Implicit 6-tets-per-cube grid on the [-1, 1]^3 lattice.

    sdf/deform live on ALL (g+1)^3 lattice vertices; `crop_sphere` keeps
    the reference grids' sphere support as a static per-cell mask instead
    of index compaction."""
    resolution: int
    radius: float = 1.0
    crop_sphere: bool = True

    @property
    def g(self):
        return self.resolution

    @property
    def num_verts(self):
        return (self.g + 1) ** 3

    @property
    def verts(self):
        """(V, 3) float32 lattice rest positions (numpy, lazy)."""
        if not hasattr(self, "_verts"):
            g = self.g
            xs = np.linspace(-1.0, 1.0, g + 1, dtype=np.float32)
            vv = np.stack(np.meshgrid(xs, xs, xs, indexing="ij"), axis=-1)
            object.__setattr__(self, "_verts", vv.reshape(-1, 3))
        return self._verts

    def _np_cell_mask(self):
        g = self.g
        xs = np.linspace(-1.0, 1.0, g + 1, dtype=np.float32)
        c = (xs[:-1] + xs[1:]) * 0.5
        cc = np.stack(np.meshgrid(c, c, c, indexing="ij"), axis=-1)
        return np.linalg.norm(cc, axis=-1) <= self.radius

    def arrays(self):
        """Traced-arg pytree (the static cell mask; tiny vs the generic
        grid's hundreds of MB of tables).

        Built with numpy, NOT jnp: jnp array creation inside a caller's
        jit trace would memoize a tracer on the instance and leak it into
        every later call (UnexpectedTracerError far from the cause).
        numpy arrays are valid jit args and convert on dispatch."""
        if not hasattr(self, "_arrays"):
            mask = (self._np_cell_mask() if self.crop_sphere
                    else np.ones((self.g,) * 3, bool))
            object.__setattr__(self, "_arrays", {"cell_mask": mask})
        return self._arrays

    # --- edge-class geometry (host constants) --------------------------
    def class_dims(self):
        g = self.g
        return [(g + 1 - d[0], g + 1 - d[1], g + 1 - d[2])
                for d in EDGE_DIRS]

    def class_bases(self):
        sizes = [d[0] * d[1] * d[2] for d in self.class_dims()]
        bases = np.concatenate([[0], np.cumsum(sizes)])
        return bases  # (8,), bases[7] == E


def _occ_corner_slices(occ3d, g):
    """Corner occupancies as 8 (g, g, g) slices of the (g+1)^3 volume."""
    out = []
    for n in range(8):
        b = _corner_bits(n)
        out.append(occ3d[b[0]:b[0] + g, b[1]:b[1] + g, b[2]:b[2] + g])
    return out


@partial(jax.jit, static_argnames=("grid", "vert_cap", "face_cap"))
def marching_tets_topology(grid: StructuredTetGrid, ga, sdf,
                           vert_cap=65536, face_cap=131072):
    """Integer-only half of the extraction, from the SIGN of `sdf`:
    crossing-edge endpoint ids and the face tables. Non-differentiable by
    construction — pair with `marching_tets_verts` (the sdf/deform-
    differentiable lerp) to split topology from geometry. A fit program
    can then freeze the topology across its inner steps and pay the
    14.8M-edge cumsum / searchsorted / triangle-table machinery once per
    program instead of per step (the reference re-runs its `torch.unique`
    edge build every step, `base_mesh_renderer.py:140-188`, where it is
    cheap; on TPU the full extract fwd measures 219 ms of the ~1290 ms
    fit step, of which ~130 ms is this topology half — grad-only path 88
    ms once the face tables are DCE'd: PERF.md r4 table, row "extract
    fwd", from benchmarks/prof_mesh_fit.py / prof_extract_bwd.py).

    Returns {id_a, id_b (vert_cap,) lattice-vertex ids, vert_mask,
    faces (face_cap, 3), face_mask, n_verts, n_faces}.
    """
    g = grid.resolution
    V1 = g + 1
    occ3d = (sdf > 0).reshape(V1, V1, V1)
    dims = grid.class_dims()
    bases = grid.class_bases()
    E = int(bases[-1])

    # ---- crossing edges: slice XOR per class, flat concat --------------
    # an edge only yields a vertex if it borders an ACTIVE cell — without
    # this, cropped-region crossings produce valid verts referenced by no
    # face, whose zero accumulated normal NaNs the normal-loss gradient
    cell_mask = ga["cell_mask"]

    def edge_active(d):
        m = cell_mask
        for ax in range(3):
            if d[ax] == 0:   # edge shared by the two cells along ax
                pad = [(0, 0)] * 3
                pad[ax] = (1, 1)
                mp = jnp.pad(m, pad)
                sl0 = [slice(None)] * 3
                sl1 = [slice(None)] * 3
                sl0[ax] = slice(0, m.shape[ax] + 1)
                sl1[ax] = slice(1, m.shape[ax] + 2)
                m = mp[tuple(sl0)] | mp[tuple(sl1)]
        return m

    cross = []
    for ci, d in enumerate(EDGE_DIRS):
        dx, dy, dz = [int(x) for x in d]
        o0 = occ3d[:V1 - dx, :V1 - dy, :V1 - dz]
        o1 = occ3d[dx:, dy:, dz:]
        cross.append(((o0 ^ o1) & edge_active(d)).reshape(-1))
    crossing = jnp.concatenate(cross)                     # (E,)
    csum = jnp.cumsum(crossing.astype(jnp.int32))
    n_verts = csum[-1]
    vslot = csum - 1
    in_cap = crossing & (vslot < vert_cap)
    emap = jnp.where(in_cap, vslot, vert_cap).astype(jnp.int32)  # (E,)

    slot_edge = jnp.clip(
        jnp.searchsorted(csum, jnp.arange(1, vert_cap + 1, dtype=csum.dtype),
                         side="left"), 0, E - 1)          # (vert_cap,)
    slot_valid = jnp.arange(vert_cap) < jnp.minimum(n_verts, vert_cap)

    # edge id -> (class, anchor coords) via div/mod arithmetic
    bases_j = jnp.asarray(bases[1:8], jnp.int32)          # class end offsets
    cls = jnp.searchsorted(bases_j, slot_edge, side="right")
    base_of = jnp.asarray(bases[:7], jnp.int32)[cls]
    local = slot_edge - base_of
    dims_np = np.asarray(dims, np.int32)                  # (7, 3)
    sy = jnp.asarray(dims_np[:, 1] * dims_np[:, 2])[cls]
    sz = jnp.asarray(dims_np[:, 2])[cls]
    ax = local // sy
    rem = local % sy
    ay = rem // sz
    az = rem % sz
    dvec = jnp.asarray(EDGE_DIRS)[cls]                    # (cap, 3)
    bx, by, bz = (ax + dvec[:, 0], ay + dvec[:, 1], az + dvec[:, 2])

    def vflat(x, y, z):
        return (x * V1 + y) * V1 + z

    id_a = vflat(ax, ay, az)
    id_b = vflat(bx, by, bz)

    # ---- faces: per-pattern tet indices from corner slices -------------
    oc = _occ_corner_slices(occ3d.astype(jnp.int32), g)   # 8 x (g,g,g)
    tri_flat_tab = jnp.asarray(TRIANGLE_TABLE.reshape(-1))   # (96,)
    ntr_tab = jnp.asarray(NUM_TRIANGLES_TABLE)
    tetind_list, ntri_list = [], []
    for p in range(6):
        c0, c1, c2, c3 = [oc[n] for n in TET_CORNERS[p]]
        ti = c0 + 2 * c1 + 4 * c2 + 8 * c3                # (g,g,g)
        nt = jnp.where(cell_mask, ntr_tab[ti], 0)
        tetind_list.append(ti.reshape(-1))
        ntri_list.append(nt.reshape(-1))
    tetind_flat = jnp.concatenate(tetind_list)            # (6g^3,)
    ntri_flat = jnp.concatenate(ntri_list)
    fcsum = jnp.cumsum(ntri_flat)
    n_faces = fcsum[-1]

    # face slot -> (tet, which-triangle) via searchsorted on the cumsum
    f_ids = jnp.arange(face_cap, dtype=fcsum.dtype)
    t_of_f = jnp.clip(
        jnp.searchsorted(fcsum, f_ids + 1, side="left"),
        0, ntri_flat.shape[0] - 1)                        # (face_cap,)
    first_slot = fcsum[t_of_f] - ntri_flat[t_of_f]
    r_of_f = (f_ids - first_slot).astype(jnp.int32)       # 0 or 1
    face_valid = f_ids < n_faces

    g3 = g * g * g
    pattern_f = (t_of_f // g3).astype(jnp.int32)
    cell_f = (t_of_f % g3).astype(jnp.int32)
    cx = cell_f // (g * g)
    cy = (cell_f // g) % g
    cz = cell_f % g
    tetind_f = tetind_flat[t_of_f]                        # (face_cap,)

    # local edge ids of this triangle's 3 corners (tiny-table lookups)
    ecls_tab = jnp.asarray(EDGE_CLASS)                    # (6, 6)
    eoff_tab = jnp.asarray(EDGE_OFFSET)                   # (6, 6, 3)
    base_tab = jnp.asarray(bases[:7], jnp.int32)
    sy_tab = jnp.asarray(dims_np[:, 1] * dims_np[:, 2])
    sz_tab = jnp.asarray(dims_np[:, 2])

    vids = []
    for j in range(3):
        l = tri_flat_tab[tetind_f * 6 + 3 * r_of_f + j]   # local edge 0..5
        l = jnp.clip(l, 0, 5)
        c = ecls_tab[pattern_f, l]                        # class
        o = eoff_tab[pattern_f, l]                        # (face_cap, 3)
        eax = cx + o[:, 0]
        eay = cy + o[:, 1]
        eaz = cz + o[:, 2]
        eid = base_tab[c] + eax * sy_tab[c] + eay * sz_tab[c] + eaz
        vids.append(emap[eid])                            # (face_cap,)
    v0, v1, v2 = vids
    face_ok = face_valid & (v0 < vert_cap) & (v1 < vert_cap) \
        & (v2 < vert_cap)
    faces_ct = jnp.stack([jnp.where(face_ok, v0, 0),
                          jnp.where(face_ok, v1, 0),
                          jnp.where(face_ok, v2, 0)])     # (3, face_cap)

    return {"id_a": id_a.astype(jnp.int32),
            "id_b": id_b.astype(jnp.int32),
            "vert_mask": slot_valid,
            "faces": faces_ct.T,
            "face_mask": face_ok,
            "n_verts": n_verts, "n_faces": n_faces}


@partial(jax.jit, static_argnames=("grid",))
def marching_tets_verts(grid: StructuredTetGrid, topo, sdf, deform=None):
    """Differentiable half of the extraction: crossing-vertex positions by
    sdf-lerp along the (frozen) edges in `topo`. Gathers only at cap
    scale; gradients flow to sdf (via the lerp weight) and deform exactly
    as in the fused path. Clipping keeps verts on their edge if a sign
    flips after the topology snapshot."""
    g = grid.resolution
    V1 = g + 1
    id_a, id_b = topo["id_a"], topo["id_b"]
    s_a = sdf[id_a]
    s_b = sdf[id_b]
    denom = s_a - s_b
    denom = jnp.where(jnp.abs(denom) < 1e-10,
                      jnp.where(denom >= 0, 1e-10, -1e-10), denom)
    w_a = jnp.clip(-s_b / denom, 0.0, 1.0)                # (cap,)
    scale = 2.0 / g

    def unflat(i):
        # id = (x*V1 + y)*V1 + z — invert to lattice coords
        return jnp.stack([i // (V1 * V1), (i // V1) % V1, i % V1])

    # channel-first (3, cap): trailing-3 temporaries tile-pad 42x on TPU
    pos_a = unflat(id_a).astype(sdf.dtype) * scale - 1.0
    pos_b = unflat(id_b).astype(sdf.dtype) * scale - 1.0
    if deform is not None:
        dt = deform.T                                     # (3, V)
        pos_a = pos_a + dt[:, id_a]
        pos_b = pos_b + dt[:, id_b]
    verts_ct = pos_a * w_a[None] + pos_b * (1.0 - w_a)[None]
    verts_ct = jnp.where(topo["vert_mask"][None], verts_ct, 0.0)
    return verts_ct.T


@partial(jax.jit, static_argnames=("grid", "vert_cap", "face_cap"))
def marching_tets_structured(grid: StructuredTetGrid, ga, sdf, deform=None,
                             vert_cap=65536, face_cap=131072):
    """Isosurface of `sdf` (positive inside) on the structured grid into
    static-capacity buffers. Same output contract as
    `marching_tets_compact`: verts (vert_cap, 3), vert_mask, faces
    (face_cap, 3), face_mask, n_verts, n_faces.

    sdf: ((g+1)^3,) at lattice verts; deform: optional ((g+1)^3, 3).
    Composition of `marching_tets_topology` + `marching_tets_verts`
    (inlined into one program under jit; the split exists so fit programs
    can refresh topology less often than geometry).
    """
    topo = marching_tets_topology(grid, ga, sdf, vert_cap=vert_cap,
                                  face_cap=face_cap)
    verts = marching_tets_verts(grid, topo, sdf, deform=deform)
    return {"verts": verts,
            "vert_mask": topo["vert_mask"],
            "faces": topo["faces"],
            "face_mask": topo["face_mask"],
            "n_verts": topo["n_verts"], "n_faces": topo["n_faces"]}
