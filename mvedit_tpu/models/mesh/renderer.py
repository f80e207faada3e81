"""Mesh renderer: rasterize + shade + bake (MeshRenderer analog).

Rebuilds `lib/models/decoders/mesh_renderer/base_mesh_renderer.py:207-577`
on top of the XLA tile rasterizer:

- `render_views`: multi-view render of a (possibly DMTet-extracted) triangle
  soup with per-pixel world xyz / normal / depth / soft alpha and an optional
  `shading_fun(xyz, normal, view_dir) -> rgb` evaluated on all pixels
  (the reference evaluates FG-only via nvdiffrast masks, :276-285; here XLA
  fuses the masked compute);
- `vertex_normals`: differentiable area-weighted normals (scatter-add);
- SSAA by rendering at ssaa x resolution and average-pooling (:207 ssaa);
- `bake_texture`: UV-space rasterization of the mesh (UV coords as screen
  positions) evaluating a field at interpolated world positions — the
  `bake_xyz_shading_fun` equivalent (:397-423);
- `camera_weights_uv`: per-view visibility x cos-angle weights in UV space
  (:425-505) used for multi-view texture blending and superres.
"""
from functools import partial

import jax
import jax.numpy as jnp

from .rasterize import RasterConfig, project_mesh, rasterize, interpolate

__all__ = ["vertex_normals", "render_views", "bake_texture",
           "camera_weights_uv"]


def vertex_normals(verts, faces, face_mask=None):
    """Differentiable area-weighted vertex normals (auto_normal analog).

    One fused 3F-row segment_add (ops/segment.py: scatter with drop
    semantics + gather-only VJP) instead of three F-row scatters."""
    from ...ops.segment import segment_add
    v0 = verts[faces[:, 0]]
    v1 = verts[faces[:, 1]]
    v2 = verts[faces[:, 2]]
    fn = jnp.cross(v1 - v0, v2 - v0)
    if face_mask is not None:
        fn = fn * face_mask[:, None]
    vn = segment_add(faces.reshape(-1), jnp.repeat(fn, 3, axis=0),
                     verts.shape[0]).astype(verts.dtype)
    # rsqrt(sumsq + eps), NOT x/clip(norm): d||x||/dx at x=0 is NaN and a
    # clip on the norm does not stop it propagating — zero-normal verts
    # (valid crossing referenced by no face) would NaN the whole gradient
    return vn * jax.lax.rsqrt(
        jnp.sum(vn * vn, axis=-1, keepdims=True) + 1e-20)


def pose_to_w2c(pose_c2w):
    """(3, 4) c2w -> (3, 4) w2c (R^T, -R^T t)."""
    r = pose_c2w[:3, :3]
    t = pose_c2w[:3, 3]
    return jnp.concatenate([r.T, (-r.T @ t)[:, None]], axis=1)


@partial(jax.jit, static_argnames=("cfg", "shading_fun", "ssaa",
                                   "sequential"))
def render_views(verts, faces, face_mask, poses_c2w, intrinsics,
                 cfg: RasterConfig, shading_fun=None, ssaa=1,
                 bg_color=1.0, vert_attrs=None, shading_params=None,
                 sequential=False):
    """Render N views of one triangle soup.

    Args:
        verts: (V, 3) world vertices; faces: (F, 3); face_mask: (F,) bool.
        poses_c2w: (N, 3, 4); intrinsics: (N, 4) at target resolution.
        shading_fun: optional rgb callback. Preferred form takes
            (shading_params, xyz, normal, view_dir) with `shading_params`
            passed as the TRACED kwarg below; the legacy closure form
            (xyz, normal, view_dir) is kept for in-jit callers. NEVER pass
            a top-level closure over device arrays with a value-blind
            hash: jit would bake the arrays in as constants (HBM copies)
            and silently reuse STALE values on cache hits.
        vert_attrs: optional dict of (V, C) attributes to interpolate.
        sequential: lax.map over the view axis instead of vmap — the
            raster working set stays at ONE view (vmapping all N views
            multiplies it N-fold and OOMs at 512^2) while the whole
            multi-view render remains a single compiled program / single
            host dispatch (the tunneled device pays ~27 ms per dispatch,
            PERF.md).
    Returns dict of (N, H, W, ...): rgb (if shading_fun), xyz, normal,
        depth, alpha, alpha_hard + interpolated vert_attrs.
    """
    if ssaa > 1:
        cfg_r = RasterConfig(**{**cfg.__dict__,
                                "height": cfg.height * ssaa,
                                "width": cfg.width * ssaa})
        intr_r = intrinsics * ssaa
    else:
        cfg_r, intr_r = cfg, intrinsics
    vn = vertex_normals(verts, faces, face_mask.astype(verts.dtype))

    def one_view(pose, intr):
        w2c = pose_to_w2c(pose)
        pts = project_mesh(verts, w2c, intr, cfg_r.near)
        rast = rasterize(pts, faces, face_mask, cfg_r)
        # one packed interpolate for xyz+normal: halves the backward's
        # segment-add rows vs two calls
        packed = interpolate(jnp.concatenate([verts, vn], axis=1),
                             rast, faces)
        xyz, nrm = packed[..., :3], packed[..., 3:]
        nrm = nrm * jax.lax.rsqrt(
            jnp.sum(nrm * nrm, axis=-1, keepdims=True) + 1e-20)
        out = {"xyz": xyz, "normal": nrm, "depth": rast["z"],
               "alpha": rast["alpha"][..., None],
               "alpha_hard": rast["alpha_hard"][..., None]}
        if vert_attrs:
            for k, a in vert_attrs.items():
                out[k] = interpolate(a, rast, faces)
        if shading_fun is not None:
            cam_pos = pose[:3, 3]
            view_dir = xyz - cam_pos
            view_dir = view_dir / jnp.clip(
                jnp.linalg.norm(view_dir, axis=-1, keepdims=True), 1e-12, None)
            rgb = shading_fun(shading_params, xyz, nrm, view_dir) \
                if shading_params is not None \
                else shading_fun(xyz, nrm, view_dir)
            a = rast["alpha"][..., None]
            # degenerate extractions (empty tet surface) leave NaN verts ->
            # NaN xyz -> NaN shading; NaN * 0 alpha still poisons the
            # composite, so select instead of multiplying
            rgb = jnp.where(a > 0, rgb, 0.0)
            out["rgb"] = rgb * a + bg_color * (1 - a)
        return out

    intr_in = intrinsics if ssaa == 1 else intr_r
    if sequential:
        out = jax.lax.map(lambda a: one_view(*a), (poses_c2w, intr_in))
    else:
        out = jax.vmap(one_view)(poses_c2w, intr_in)
    if ssaa > 1:
        def pool(x):
            n, h, w = x.shape[:3]
            c = x.shape[3] if x.ndim == 4 else 1
            y = x.reshape(n, h // ssaa, ssaa, w // ssaa, ssaa, c)
            return y.mean(axis=(2, 4)).reshape(
                n, h // ssaa, w // ssaa, *x.shape[3:])
        out = {k: pool(v) if v.ndim >= 3 else v for k, v in out.items()}
    return out


@partial(jax.jit, static_argnames=("cfg", "field_fn"))
def bake_texture(verts, faces, face_mask, uvs, uv_faces, field_fn,
                 cfg: RasterConfig, field_params=None):
    """Bake `field_fn(xyz) -> rgb` into a UV atlas (preferred:
    `field_fn(field_params, xyz)` with field_params as the traced kwarg —
    see render_views' shading_params note on stale-constant closures).

    Rasterizes the mesh in UV space: screen positions = (u, v) * atlas size,
    z = 1; per-texel world xyz comes from interpolating `verts` with the UV
    triangle's barycentrics (bake_xyz_shading_fun analog,
    base_mesh_renderer.py:397-423).

    uvs: (Vt, 2) in [0, 1]; uv_faces: (F, 3) indices into uvs (same face
    order as `faces`). Returns (atlas_rgb (H, W, 3), atlas_mask (H, W)).
    """
    H, W = cfg.height, cfg.width
    pts = jnp.stack([uvs[:, 0] * W, uvs[:, 1] * H,
                     jnp.ones_like(uvs[:, 0])], axis=-1)
    rast = rasterize(pts, uv_faces, face_mask, cfg)
    # interpolate world positions through the UV-face barycentrics: gather
    # per-face world verts, then blend with bary
    tri = jnp.maximum(rast["tri_id"], 0)
    f_world = faces[tri]
    u = rast["bary"][..., 0:1]
    v = rast["bary"][..., 1:2]
    xyz = (verts[f_world[..., 0]] * (1 - u - v)
           + verts[f_world[..., 1]] * u + verts[f_world[..., 2]] * v)
    rgb = field_fn(field_params, xyz) if field_params is not None \
        else field_fn(xyz)
    mask = (rast["tri_id"] >= 0).astype(jnp.float32)
    rgb = jnp.where(mask[..., None] > 0, rgb, 0.0)  # NaN * 0 guard
    return rgb, mask


@partial(jax.jit, static_argnames=("cfg", "atlas_cfg"))
def camera_weights_uv(verts, faces, face_mask, uvs, uv_faces, poses_c2w,
                      intrinsics, cfg: RasterConfig,
                      atlas_cfg: RasterConfig, cos_weight_pow=1.0):
    """Per-view weight map in UV space: visibility (depth test against the
    view render) x max(cos(normal, view), 0)^p (get_cam_weights_uv analog,
    base_mesh_renderer.py:425-505).

    Returns (N, Ha, Wa) weights over the atlas.
    """
    vn = vertex_normals(verts, faces, face_mask.astype(verts.dtype))
    # atlas-space geometry
    H, W = atlas_cfg.height, atlas_cfg.width
    pts_uv = jnp.stack([uvs[:, 0] * W, uvs[:, 1] * H,
                        jnp.ones_like(uvs[:, 0])], axis=-1)
    rast_uv = rasterize(pts_uv, uv_faces, face_mask, atlas_cfg)
    tri = jnp.maximum(rast_uv["tri_id"], 0)
    f_world = faces[tri]
    u = rast_uv["bary"][..., 0:1]
    v = rast_uv["bary"][..., 1:2]
    xyz = (verts[f_world[..., 0]] * (1 - u - v)
           + verts[f_world[..., 1]] * u + verts[f_world[..., 2]] * v)
    nrm = (vn[f_world[..., 0]] * (1 - u - v)
           + vn[f_world[..., 1]] * u + vn[f_world[..., 2]] * v)
    nrm = nrm / jnp.clip(jnp.linalg.norm(nrm, axis=-1, keepdims=True),
                         1e-12, None)
    valid = rast_uv["tri_id"] >= 0

    def one_view(pose, intr):
        w2c = pose_to_w2c(pose)
        # view-space depth of atlas texels
        pc = jnp.einsum("ij,hwj->hwi", w2c[:, :3], xyz) + w2c[:, 3]
        z = pc[..., 2]
        upix = intr[0] * pc[..., 0] / jnp.clip(z, cfg.near, None) + intr[2]
        vpix = intr[1] * pc[..., 1] / jnp.clip(z, cfg.near, None) + intr[3]
        # render the view's depth buffer
        pts = project_mesh(verts, w2c, intr, cfg.near)
        rast = rasterize(pts, faces, face_mask, cfg)
        zbuf = rast["z"] + 1e9 * (rast["tri_id"] < 0)
        gx = jnp.clip(upix, 0, cfg.width - 1)
        gy = jnp.clip(vpix, 0, cfg.height - 1)
        zb = zbuf[gy.astype(jnp.int32), gx.astype(jnp.int32)]
        visible = (z <= zb * 1.02 + 1e-3) & (upix >= 0) \
            & (upix < cfg.width) & (vpix >= 0) & (vpix < cfg.height) \
            & (z > cfg.near)
        cam_pos = pose[:3, 3]
        vd = cam_pos - xyz
        vd = vd / jnp.clip(jnp.linalg.norm(vd, axis=-1, keepdims=True),
                           1e-12, None)
        cosw = jnp.clip(jnp.sum(vd * nrm, axis=-1), 0.0, None)
        return jnp.where(visible & valid, cosw ** cos_weight_pow, 0.0)

    return jax.vmap(one_view)(poses_c2w, intrinsics)
