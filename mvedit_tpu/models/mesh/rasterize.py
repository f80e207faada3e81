"""Differentiable tile-based triangle rasterizer (pure XLA, static shapes).

TPU-native replacement for nvdiffrast (used throughout the reference's
`lib/models/decoders/mesh_renderer/base_mesh_renderer.py:241-298,407-577`:
rasterize, interpolate, texture, antialias). Instead of a CUDA/OpenGL
pipeline with dynamic per-pixel triangle lists, the design is:

1. **Project** to pixel space straight from OpenCV intrinsics (no OpenGL
   projection matrix / y-flip dance; the reference builds one at
   base_mesh_renderer.py:225-232 only because nvdiffrast needs GL clip
   space).
2. **Bin** triangles to fixed-size screen tiles with a sort: each triangle
   emits up to SPAN^2 (tile, tri) pairs from its AABB (static cap);
   triangles spanning more tiles go to a global "big" list checked by every
   tile. One `lax.sort` + `searchsorted` turns the pairs into per-tile
   fixed-capacity candidate lists — all shapes static.
3. **Shade tiles**: vmap over tiles; each computes edge functions for
   (tile_px^2 pixels x K candidates), z-tests, and picks the nearest
   covering triangle. The winner's barycentrics are recomputed
   differentiably (selection is stop-gradient, like nvdiffrast's discrete
   coverage).
4. **Soft silhouette**: alpha = clamp(0.5 + signed pixel distance to the
   winning triangle's nearest edge) gives silhouette gradients w.r.t.
   vertices (the role of nvdiffrast's antialias pass in mask losses).

Gradients flow to vertex positions through the barycentric/edge math and to
attributes through interpolation — `jax.grad` composes; no custom VJPs
needed for v1.
"""
from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp

__all__ = ["RasterConfig", "project_mesh", "rasterize", "interpolate",
           "render_mesh_attrs"]


@dataclass(frozen=True)
class RasterConfig:
    height: int = 512
    width: int = 512
    tile: int = 16          # tile size in pixels
    span: int = 4           # max tile span per axis before -> big list
    k_per_tile: int = 256   # candidate capacity per tile
    k_big: int = 64         # global big-triangle list capacity
    tile_chunk: int = 256   # tiles processed per lax.map step
    near: float = 0.01
    cull_backface: bool = False  # MVEdit meshes are open-surface; keep both
    # selection backend: "auto" = Pallas kernel on TPU / XLA elsewhere;
    # "pallas" / "pallas_interpret" / "xla" force one. The Pallas kernel
    # fuses the (pixels x K-candidates) coverage/z-test into VMEM (the XLA
    # lax.map shader round-trips those intermediates through HBM and
    # dominated the DMTet mesh-fit step).
    backend: str = "xla"
    # binning: "pairs" emits one (tile, tri) pair per covered tile (exact
    # per-tile lists, k_per_tile = overlapping-candidate capacity);
    # "t0" bins each triangle once under its AABB-min tile and tiles
    # gather their span^2 north-west lists (k_per_tile = per-t0 capacity,
    # effective candidates span^2 * k + k_big). "t0" cuts the bin sort
    # span^2-fold — the measured raster-fwd dominator on DMTet soups
    # (PERF.md r4) — at the price of span^2 x bigger shader lists, so it
    # fits tight-span many-small-triangle configs (the mesh-fit path).
    bin_mode: str = "pairs"

    def resolved_backend(self):
        if self.backend == "auto":
            return "pallas" if jax.default_backend() == "tpu" else "xla"
        return self.backend

    @property
    def tiles_x(self):
        return (self.width + self.tile - 1) // self.tile

    @property
    def tiles_y(self):
        return (self.height + self.tile - 1) // self.tile

    @property
    def num_tiles(self):
        return self.tiles_x * self.tiles_y


def project_mesh(verts, pose_w2c, intrinsics, near=0.01):
    """World verts (V, 3) -> pixel-space (V, 3): (u_pix, v_pix, z_cam).

    pose_w2c: (3, 4) world-to-camera (OpenCV). intrinsics: (4,) fx fy cx cy.
    """
    vc = jnp.einsum("ij,nj->ni", pose_w2c[:, :3], verts) + pose_w2c[:, 3]
    z = jnp.maximum(vc[:, 2], near)
    u = intrinsics[0] * vc[:, 0] / z + intrinsics[2]
    v = intrinsics[1] * vc[:, 1] / z + intrinsics[3]
    return jnp.stack([u, v, vc[:, 2]], axis=-1)


def _edge(p, q, r):
    """2D cross of (q-p, r-p); positive if r left of p->q."""
    return ((q[..., 0] - p[..., 0]) * (r[..., 1] - p[..., 1])
            - (q[..., 1] - p[..., 1]) * (r[..., 0] - p[..., 0]))


@partial(jax.jit, static_argnames=("cfg",))
def _bin_triangles(pts, faces, face_valid, cfg: RasterConfig):
    """Build per-tile candidate lists (see RasterConfig.bin_mode).

    "pairs": one sorted (tile, tri) pair per covered tile (up to span^2
    per triangle) -> exact per-tile overlap lists.
    "t0": each small triangle binned once under its AABB-min tile — the
    span^2-fold smaller sort; `_gather_neighbourhood` unions the lists.

    Returns (tile_tris (num_tiles, k_per_tile) int32, tile_valid,
    big_tris (k_big,), big_valid)."""
    F = faces.shape[0]
    p = pts[faces]                      # (F, 3, 3)
    fmin = jnp.min(p[..., :2], axis=1)  # (F, 2)
    fmax = jnp.max(p[..., :2], axis=1)
    behind = jnp.any(p[..., 2] <= cfg.near, axis=1)
    offscreen = (fmax[:, 0] < 0) | (fmax[:, 1] < 0) \
        | (fmin[:, 0] >= cfg.width) | (fmin[:, 1] >= cfg.height)
    live = face_valid & (~behind) & (~offscreen)

    t0 = jnp.clip(jnp.floor(fmin / cfg.tile).astype(jnp.int32), 0,
                  jnp.asarray([cfg.tiles_x - 1, cfg.tiles_y - 1]))
    t1 = jnp.clip(jnp.floor(fmax / cfg.tile).astype(jnp.int32), 0,
                  jnp.asarray([cfg.tiles_x - 1, cfg.tiles_y - 1]))
    span = t1 - t0 + 1                  # (F, 2)
    is_big = live & ((span[:, 0] > cfg.span) | (span[:, 1] > cfg.span))
    is_small = live & (~is_big)
    INVALID = jnp.int32(cfg.num_tiles)

    # packed single-array sort when (tile, tri) fits one int32: key =
    # tile_id << bits(F) | tri_id. One operand rides the compare-exchange
    # network instead of two — measured ~2.3x faster than the two-array
    # lax.sort at the mesh-fit production shape (prof_bin.py), and stable
    # by construction. Falls back to the two-array sort when the packed
    # key would overflow int32 (e.g. 2048^2 atlas bakes: 16k tiles).
    shift = max(F - 1, 1).bit_length()
    packable = (cfg.num_tiles + 1) << shift <= 2 ** 31

    def _sort_pairs(keys, vals):
        if packable:
            packed = jax.lax.sort((keys << shift) | vals)
            return packed >> shift, packed & ((1 << shift) - 1)
        return jax.lax.sort((keys, vals), num_keys=1)

    if cfg.bin_mode == "t0":
        # bin sort over F elements instead of F * span^2. NOTE the r4
        # numbers that motivated this mode were dispatch-contaminated
        # (~27 ms tunnel overhead per standalone measurement); the r5
        # xplane trace puts the in-program pair sort at ~13 ms/view
        # (PERF.md r5) — t0 remains a config option, not the default
        tile_id1 = t0[:, 1] * cfg.tiles_x + t0[:, 0]      # (F,)
        keys = jnp.where(is_small, tile_id1, INVALID)
        keys, vals = _sort_pairs(keys, jnp.arange(F, dtype=jnp.int32))
    else:
        # emit pairs
        S = cfg.span
        dx = jnp.arange(S)
        dy = jnp.arange(S)
        gx = t0[:, 0:1] + dx[None]          # (F, S)
        gy = t0[:, 1:2] + dy[None]
        in_x = dx[None] < span[:, 0:1]
        in_y = dy[None] < span[:, 1:2]
        tile_id = (gy[:, :, None] * cfg.tiles_x
                   + gx[:, None, :])        # (F, S, S)
        pair_valid = (is_small[:, None, None] & in_y[:, :, None]
                      & in_x[:, None, :])
        keys = jnp.where(pair_valid, tile_id, INVALID).reshape(-1)
        vals = jnp.broadcast_to(
            jnp.arange(F, dtype=jnp.int32)[:, None, None],
            tile_id.shape).reshape(-1)
        keys, vals = _sort_pairs(keys, vals)

    starts = jnp.searchsorted(keys, jnp.arange(cfg.num_tiles), side="left")
    ends = jnp.searchsorted(keys, jnp.arange(cfg.num_tiles), side="right")
    idx = starts[:, None] + jnp.arange(cfg.k_per_tile)[None]
    tile_valid = idx < ends[:, None]
    idx = jnp.clip(idx, 0, keys.shape[0] - 1)
    tile_tris = vals[idx]

    # big list: indices of the first k_big big triangles without a full
    # argsort (nonzero lowers to cumsum + searchsorted)
    big_tris = jnp.nonzero(is_big, size=cfg.k_big, fill_value=0)[0] \
        .astype(jnp.int32)
    big_valid = is_big[big_tris] & (jnp.arange(cfg.k_big) < F)
    return tile_tris, tile_valid, big_tris, big_valid


def _gather_neighbourhood(tile_tris, tile_valid, cfg: RasterConfig):
    """Per-tile candidates = union of the span x span north-west t0
    lists (see _bin_triangles). Returns (num_tiles, span^2 * k) ids +
    validity."""
    S = cfg.span
    ty = jnp.arange(cfg.num_tiles) // cfg.tiles_x
    tx = jnp.arange(cfg.num_tiles) % cfg.tiles_x
    cands, valids = [], []
    for dy in range(S):
        for dx in range(S):
            ny = ty - dy
            nx = tx - dx
            ok = (ny >= 0) & (nx >= 0)
            n_id = jnp.where(ok, ny * cfg.tiles_x + nx, 0)
            cands.append(tile_tris[n_id])
            valids.append(tile_valid[n_id] & ok[:, None])
    return jnp.concatenate(cands, 1), jnp.concatenate(valids, 1)


def _winner_outputs(wt, hit, qp, pts, faces, cull_backface):
    """Differentiable outputs for selected (winner) triangles.

    wt: (N,) tri ids; hit: (N,) bool; qp: (N, 2) pixel centers;
    pts: (V, 3) projected verts; faces: (F, 3). The selection itself is
    discrete (stop-gradient); gradients to vertices flow through this
    recompute, matching nvdiffrast's coverage semantics.

    Gathers winner corners DIRECTLY from `pts` (not from a precomputed
    tri_p=(F,3,3)): the backward then scatters per-pixel cotangents
    straight into d_pts instead of accumulating a d_tri_p buffer and
    converting it with a 3F-row scatter — that conversion alone was the
    fit step's largest single op (81 ms/step, r5 xplane trace).
    Returns (tri_out, uv, z, hard, soft, winner_faces) — winner_faces
    is the (N, 3) vertex-index triple of the winner, returned so
    `interpolate` reuses it instead of re-gathering faces[tri] per
    pixel."""
    fw = faces[wt]                                    # (N, 3) int
    pw = pts[fw]                                      # (N, 3, 3)
    aw, bw, cw = pw[:, 0], pw[:, 1], pw[:, 2]
    area_w = _edge(aw[:, :2], bw[:, :2], cw[:, :2])
    sgn_w = jnp.where(cull_backface, 1.0, jnp.sign(area_w))
    area_w = area_w * sgn_w
    w0w = _edge(bw[:, :2], cw[:, :2], qp) * sgn_w
    w1w = _edge(cw[:, :2], aw[:, :2], qp) * sgn_w
    w2w = _edge(aw[:, :2], bw[:, :2], qp) * sgn_w
    inv_area_w = 1.0 / jnp.where(jnp.abs(area_w) < 1e-12, 1e-12, area_w)
    b0w, b1w, b2w = (w0w * inv_area_w, w1w * inv_area_w,
                     w2w * inv_area_w)
    # perspective-correct attribute barycentrics. denom -> 0 for a
    # degenerate winner (zero-area dummy triangle when NOTHING covers the
    # pixel): guard it, and mask with where() below — `x * hit` would keep
    # the NaN (0 * nan = nan) and poison every shaded-loss gradient.
    # Clamp depths away from 0 BEFORE inverting: a dummy winner with a
    # vertex at camera z=0 yields iz=inf, denom=0*inf=NaN, and NaN passes
    # a plain |denom|<eps guard straight into the vertex-gradient VJP.
    def _inv_z(z):
        return 1.0 / jnp.where(jnp.abs(z) < 1e-6, 1e-6, z)
    iz0, iz1, iz2 = _inv_z(aw[:, 2]), _inv_z(bw[:, 2]), _inv_z(cw[:, 2])
    denom = b0w * iz0 + b1w * iz1 + b2w * iz2
    denom = jnp.where(jnp.isfinite(denom) & (jnp.abs(denom) >= 1e-12),
                      denom, 1e-12)
    u = b1w * iz1 / denom
    v = b2w * iz2 / denom
    zpix = 1.0 / denom

    # soft silhouette: signed pixel distance to nearest edge of winner
    def edge_dist(pa, pb):
        e = pb[:, :2] - pa[:, :2]
        n = jnp.stack([-e[:, 1], e[:, 0]], -1) * sgn_w[:, None]
        # rsqrt(sumsq + eps), NOT n/clip(norm): norm's VJP at n=0 is 0/0
        # and a degenerate (dummy) winner triangle would NaN the whole
        # vertex gradient through the masked (0-cotangent) soft alpha
        inv_nn = jax.lax.rsqrt(jnp.sum(n * n, -1) + 1e-12)
        d = jnp.sum((qp - pa[:, :2]) * n, -1) * inv_nn
        return d
    d_edge = jnp.minimum(
        jnp.minimum(edge_dist(aw, bw), edge_dist(bw, cw)),
        edge_dist(cw, aw))
    alpha_soft = jnp.clip(0.5 + d_edge, 0.0, 1.0) * hit

    tri_out = jnp.where(hit, wt, -1)
    uv = jnp.where(hit[:, None], jnp.stack([u, v], -1), 0.0)
    zpix = jnp.where(hit, zpix, 0.0)
    return (tri_out, uv, zpix, hit.astype(jnp.float32), alpha_soft,
            jax.lax.stop_gradient(fw))


@partial(jax.jit, static_argnames=("cfg",))
def rasterize(pts, faces, face_valid, cfg: RasterConfig):
    """Rasterize. pts: (V, 3) pixel-space verts (u, v, z); faces: (F, 3).

    Returns dict (all (H, W)): tri_id (int32, -1 miss), bary u/v
    (perspective-correct, differentiable), z (camera depth), alpha_hard,
    alpha (soft silhouette, differentiable).
    """
    tile_tris, tile_valid, big_tris, big_valid = _bin_triangles(
        pts, faces, face_valid, cfg)
    if cfg.bin_mode == "t0":
        # candidates: span^2 neighbouring t0 lists (+ big list below)
        tile_tris, tile_valid = _gather_neighbourhood(
            tile_tris, tile_valid, cfg)
    cand = jnp.concatenate(
        [tile_tris, jnp.broadcast_to(big_tris, (cfg.num_tiles, cfg.k_big))],
        axis=1)
    cand_valid = jnp.concatenate(
        [tile_valid,
         jnp.broadcast_to(big_valid, (cfg.num_tiles, cfg.k_big))],
        axis=1)

    tri_p = pts[faces]  # (F, 3, 3)
    ts = cfg.tile

    def detile(x):
        # (num_tiles, ts, ts, ...) -> (H, W, ...)
        extra = x.shape[3:]
        x = x.reshape(cfg.tiles_y, cfg.tiles_x, ts, ts, *extra)
        x = jnp.swapaxes(x, 1, 2)
        return x.reshape(cfg.tiles_y * ts, cfg.tiles_x * ts, *extra)[
            : cfg.height, : cfg.width]

    backend = cfg.resolved_backend()
    if backend != "xla":
        from .select_pallas import prepare_coeffs, select_pallas
        coef = prepare_coeffs(tri_p, cand, cand_valid, cfg.cull_backface)
        best, bkey = select_pallas(coef, ts, cfg.tiles_x,
                                   interpret=(backend == "pallas_interpret"))
        hit = detile(bkey.reshape(-1, ts, ts)) < 1e38
        best = detile(best.reshape(-1, ts, ts))
        # winner tri id: candidate list lookup per pixel
        tile_of_px = (jnp.arange(cfg.height)[:, None] // ts) * cfg.tiles_x \
            + jnp.arange(cfg.width)[None, :] // ts
        wt = cand[tile_of_px, jnp.clip(best, 0, cand.shape[1] - 1)]
        qp = jnp.stack(jnp.meshgrid(
            jnp.arange(cfg.width, dtype=pts.dtype) + 0.5,
            jnp.arange(cfg.height, dtype=pts.dtype) + 0.5,
            indexing="xy"), -1)
        flat = _winner_outputs(wt.reshape(-1), hit.reshape(-1),
                               qp.reshape(-1, 2), pts, faces,
                               cfg.cull_backface)
        tri_id, uv, z, hard, soft, fw = (
            x.reshape((cfg.height, cfg.width) + x.shape[1:])
            for x in (flat[0], flat[1], flat[2], flat[3], flat[4],
                      flat[5]))
        return {"tri_id": tri_id, "bary": uv, "z": z, "alpha_hard": hard,
                "alpha": soft, "winner_faces": fw}

    def shade_tile(args):
        tri_ids, valid, tile_idx = args   # (K,), (K,), scalar
        K = tri_ids.shape[0]
        ty = tile_idx // cfg.tiles_x
        tx = tile_idx % cfg.tiles_x
        px = tx * ts + jnp.arange(ts) + 0.5   # pixel centers x: (ts,)
        py = ty * ts + jnp.arange(ts) + 0.5
        q = jnp.stack(jnp.meshgrid(px, py, indexing="xy"), -1)  # (ts, ts, 2)
        q = q.reshape(-1, 1, 2)                                  # (P, 1, 2)

        p = tri_p[tri_ids]                     # (K, 3, 3)
        a, b, c = p[:, 0], p[:, 1], p[:, 2]    # (K, 3)
        area = _edge(a[None, :, :2], b[None, :, :2], c[None, :, :2])  # (1, K)
        w0 = _edge(b[None, :, :2], c[None, :, :2], q)  # (P, K)
        w1 = _edge(c[None, :, :2], a[None, :, :2], q)
        w2 = _edge(a[None, :, :2], b[None, :, :2], q)
        sgn = jnp.sign(area)
        if cfg.cull_backface:
            face_ok = area > 1e-12
        else:
            face_ok = jnp.abs(area) > 1e-12
            w0, w1, w2 = w0 * sgn, w1 * sgn, w2 * sgn
            area = jnp.abs(area)
        covered = (w0 >= 0) & (w1 >= 0) & (w2 >= 0) & face_ok & valid[None]
        inv_area = 1.0 / jnp.where(jnp.abs(area) < 1e-12, 1e-12, area)
        b0 = w0 * inv_area
        b1 = w1 * inv_area
        b2 = w2 * inv_area
        # screen-space depth interp of 1/z (perspective-correct z test)
        inv_z = (b0 / a[None, :, 2] + b1 / b[None, :, 2]
                 + b2 / c[None, :, 2])
        depth_key = jnp.where(covered, -inv_z, jnp.inf)  # nearest = max 1/z
        best = jnp.argmin(depth_key, axis=1)             # (P,)
        hit = jnp.take_along_axis(covered, best[:, None], axis=1)[:, 0]
        best = jax.lax.stop_gradient(best)

        # recompute winner barycentrics differentiably
        wt = tri_ids[best]                                # (P,)
        tri_out, uv, zpix, hard, alpha_soft, fw = _winner_outputs(
            wt, hit, q[:, 0], pts, faces, cfg.cull_backface)
        return (tri_out.reshape(ts, ts), uv.reshape(ts, ts, 2),
                zpix.reshape(ts, ts), hard.reshape(ts, ts),
                fw.reshape(ts, ts, 3),
                alpha_soft.reshape(ts, ts))

    n_chunks = max(cfg.num_tiles // cfg.tile_chunk, 1)
    tri_id, bary, z, hard, fw, soft = jax.lax.map(
        shade_tile,
        (cand.reshape(cfg.num_tiles, -1),
         cand_valid.reshape(cfg.num_tiles, -1),
         jnp.arange(cfg.num_tiles, dtype=jnp.int32)),
        batch_size=min(cfg.tile_chunk, cfg.num_tiles))
    del n_chunks

    return {"tri_id": detile(tri_id), "bary": detile(bary),
            "z": detile(z), "alpha_hard": detile(hard),
            "alpha": detile(soft), "winner_faces": detile(fw)}


def interpolate(attr, rast, faces):
    """Per-vertex attributes (V, C) -> per-pixel (H, W, C) using the
    perspective-correct barycentrics (nvdiffrast.interpolate analog).

    Perf note (r4, measured on chip): the autodiff backward — a scatter
    of one row per pixel-corner into (V, C) — runs at ~50 ns/row and is
    NOT worth replacing: a sort-based segment-sum VJP lost 2.3x (TPU
    lax.sort passes dominate) and a hand-written scatter VJP lost ~10%
    (its re-gathers of a0/a1/a2 cost more than autodiff's shared
    residuals). Callers cut rows instead by packing attributes into one
    call (render_views packs xyz+normal)."""
    if "winner_faces" in rast:
        # rasterize already gathered the winner's vertex triple per
        # pixel — reuse it instead of re-gathering faces[tri] (one
        # H*W-row int gather per interpolate call; for missed pixels
        # both forms index an arbitrary valid face, masked out below)
        f = rast["winner_faces"]
    else:
        tri = jnp.maximum(rast["tri_id"], 0)
        f = faces[tri]                  # (H, W, 3)
    u = rast["bary"][..., 0:1]
    v = rast["bary"][..., 1:2]
    a0 = attr[f[..., 0]]
    a1 = attr[f[..., 1]]
    a2 = attr[f[..., 2]]
    out = a0 * (1 - u - v) + a1 * u + a2 * v
    return out * (rast["tri_id"] >= 0)[..., None]


def render_mesh_attrs(verts, faces, face_valid, pose_w2c, intrinsics,
                      cfg: RasterConfig, attrs=None):
    """Convenience: project + rasterize + interpolate a dict of attrs."""
    pts = project_mesh(verts, pose_w2c, intrinsics, cfg.near)
    rast = rasterize(pts, faces, face_valid, cfg)
    out = dict(rast)
    if attrs:
        for name, a in attrs.items():
            out[name] = interpolate(a, rast, faces)
    return out
