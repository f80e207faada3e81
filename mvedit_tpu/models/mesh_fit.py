"""Jitted DMTet mesh optimization inner loop (mesh_optim analog).

TPU-native rebuild of `MVEdit3DPipeline.mesh_optim`
(`lib/pipelines/mvedit_3d_pipeline.py:658-872`): after progress 0.6 the 3D
state switches from (hash-grid density) to (DMTet sdf + per-vertex deform +
hash-grid albedo field). Each step:

  marching_tets (static topology) -> render `render_bs` sampled views with
  lambertian shading in tonemapped log space -> pixel L1 + alpha + normal-TV
  + laplacian smoothing -> Adam on (field params, sdf, deform).

The laplacian regularizer is the reference's sparse uniform Laplacian
(`base_mesh_renderer.py:94-101`) computed with static-shape scatter-adds over
the (masked) face buffer. `init_sdf_from_density` replaces
`pipelines/utils.py:156-184` init_tet.
"""
from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import optax

from ..ops.tonemapping import Tonemapping
from .mesh.dmtet import TetGrid, marching_tets, marching_tets_compact
from .mesh.rasterize import RasterConfig
from .mesh.renderer import render_views
from . import losses as L

__all__ = ["MeshFitConfig", "init_sdf_from_density", "laplacian_loss",
           "normal_consistency_loss", "make_mesh_fit",
           "make_texture_refine", "default_mesh_schedule_weights"]


@dataclass(frozen=True)
class MeshFitConfig:
    raster: RasterConfig
    lr: float = 0.01
    sdf_lr_scale: float = 0.04  # sdf/deform lr = lr * this
                                # (mvedit_3d_pipeline.py:688-689)
    n_steps: int = 80
    render_bs: int = 2
    reg_face_samples: int = 131072   # faces sampled per step for the
                                     # laplacian/NC regularizers (0 = all)
    deform_scale: float = 0.5   # deform = tanh(raw) * deform_scale * cell
    pixel_rgb_weight: float = 4.5
    alpha_weight: float = 1.0
    normal_reg_weight: float = 4.0
    patch_rgb_weight: float = 0.0      # LPIPS (scheduled, traced)
    patch_normal_weight: float = 0.0
    patch_size: int = 128              # LPIPS crop size
    laplacian_weight: float = 0.25
    normal_consistency_weight: float = 0.25
    ambient_light: float = 0.3
    bg_color: float = 1.0
    shaded: bool = True
    ssaa: int = 1
    # static-capacity surface compaction (marching_tets_compact): caps on
    # extracted verts/faces. 0 = full unique-edge buffers (fine to ~res
    # 64; res >= 128 NEEDS caps — the full-buffer fit OOMs at compile).
    # Surface-crossing counts scale ~res^2; ~16 res^2 / ~24 res^2 are
    # generous for typical objects.
    vert_cap: int = 0
    face_cap: int = 0
    # freeze the marching-tets TOPOLOGY (crossing-edge set + face tables)
    # at the start of each fit program and re-lerp only the vertex
    # positions per inner step (structured grids only). Step 0 is exactly
    # the per-step path; later steps see topology at most n_steps-1
    # updates stale, refreshed every program (the pipeline chains <= 8-
    # step programs). Saves a measured 164 ms/step at tet 128 (1098 ->
    # 934, prof_mesh_fit r5). Quality A/B'd vs per-step extraction on an
    # 80-step bumpy-sphere fit (ab_freeze_topology.py, PERF.md r5):
    # chamfer identical to 5 digits, silhouette IoU within 4e-4 —
    # the staleness is quality-neutral at the pipeline's program length.
    freeze_topology: bool = False


def default_mesh_schedule_weights(cfg: "MeshFitConfig"):
    return {"lr": cfg.lr, "sdf_lr_mult": 1.0,
            "normal_reg": cfg.normal_reg_weight,
            "patch_rgb": cfg.patch_rgb_weight,
            "patch_normal": cfg.patch_normal_weight}


def init_sdf_from_density(density_fn, grid: TetGrid, thresh=5.0, scale=0.05,
                          adaptive=True):
    """sdf0 at tet verts from the NeRF density field (init_tet analog,
    pipelines/utils.py:156-184): positive inside (density > thresh).

    `adaptive` clamps the threshold below the field's 95th percentile (like
    the occupancy grid's mean-clamped threshold) so an undertrained field
    still yields a surface instead of an empty tet grid."""
    sigma = density_fn(jnp.asarray(grid.verts))
    thresh = jnp.asarray(thresh, sigma.dtype)
    if adaptive:
        thresh = jnp.minimum(thresh, jnp.percentile(sigma, 95.0) * 0.5)
        # degenerate low-contrast field (e.g. an undertrained fit whose
        # min density exceeds p95/2): ALL verts would start inside and
        # marching tets has no crossings to optimize — fall back to the
        # 70th percentile so the init surface encloses the densest 30%
        pos_frac = jnp.mean((sigma > thresh).astype(sigma.dtype))
        thresh = jnp.where(pos_frac > 0.95,
                           jnp.percentile(sigma, 70.0), thresh)
    # symmetric guard (applies regardless of `adaptive`): an all-OUTSIDE
    # init — near-zero density everywhere with the threshold stuck above
    # it — yields an SDF with no marching-tets crossings and a mesh phase
    # that can never form a surface. Fall back to the 70th percentile so
    # the init surface always has crossings (unless sigma is constant,
    # where no threshold can help).
    pos_frac = jnp.mean((sigma > thresh).astype(sigma.dtype))
    thresh = jnp.where(pos_frac < 0.02,
                       jnp.percentile(sigma, 70.0), thresh)
    return jnp.clip((sigma - thresh) * scale, -1.0, 1.0)


def normal_consistency_loss(verts, faces, face_mask):
    """Penalize the angle between normals of faces sharing a vertex — a
    static-shape stand-in for the reference's edge-paired normal
    consistency (base_mesh_renderer.py:55-68, which builds a dynamic
    edge-to-face map): per-vertex mean face normal vs each face normal.

    Accumulation stays as per-corner .at[].add scatters: a packed
    segment_add variant (one 3F-row 4ch scatter) was A/B'd on chip and
    LOST (prof_losses.py r5: lap+NC 62.5 ms loop vs 76.1 ms packed — the
    tile/repeat materialization outweighs the scatter-count saving).
    """
    v0 = verts[faces[:, 0]]
    v1 = verts[faces[:, 1]]
    v2 = verts[faces[:, 2]]
    fn = jnp.cross(v1 - v0, v2 - v0)
    # rsqrt(sumsq+eps), NOT x/clip(norm(x)): norm's VJP at x=0 is 0/0, and
    # the masked (w=0) downstream multiply gives 0*NaN = NaN — degenerate
    # masked faces would poison the whole sdf/deform gradient
    fn = fn * jax.lax.rsqrt(
        jnp.sum(fn * fn, axis=-1, keepdims=True) + 1e-20)
    w = face_mask.astype(verts.dtype)
    vsum = jnp.zeros_like(verts)
    deg = jnp.zeros((verts.shape[0],), verts.dtype)
    for i in range(3):
        vsum = vsum.at[faces[:, i]].add(fn * w[:, None])
        deg = deg.at[faces[:, i]].add(w)
    vn = vsum / jnp.clip(deg[:, None], 1.0, None)
    vn = vn * jax.lax.rsqrt(
        jnp.sum(vn * vn, axis=-1, keepdims=True) + 1e-20)
    # mean (1 - cos) between each face normal and its 3 vertex normals
    cos = sum(jnp.sum(fn * vn[faces[:, i]], axis=-1) for i in range(3)) / 3
    return jnp.sum((1.0 - cos) * w) / jnp.clip(w.sum(), 1.0, None)


def laplacian_loss(verts, faces, face_mask, vert_mask):
    """Uniform Laplacian smoothing over the extracted mesh, static shapes.

    Neighbor sums accumulated from the (masked) face buffer — equivalent to
    the reference's sparse uniform Laplacian (base_mesh_renderer.py:94-101).
    """
    # per-edge .at[].add scatters: the packed-segment_add form was A/B'd
    # on chip and lost (see normal_consistency_loss perf note)
    w = face_mask.astype(verts.dtype)
    nsum = jnp.zeros_like(verts)
    deg = jnp.zeros((verts.shape[0],), verts.dtype)
    for a, b in ((0, 1), (1, 2), (2, 0)):
        ia, ib = faces[:, a], faces[:, b]
        nsum = nsum.at[ia].add(verts[ib] * w[:, None])
        nsum = nsum.at[ib].add(verts[ia] * w[:, None])
        deg = deg.at[ia].add(w)
        deg = deg.at[ib].add(w)
    lap = verts - nsum / jnp.clip(deg[:, None], 1.0, None)
    m = (vert_mask & (deg > 0)).astype(verts.dtype)
    # sqrt(sumsq+eps): plain norm's VJP is NaN at lap == 0 (flat vertex)
    lap_mag = jnp.sqrt(jnp.sum(lap * lap, axis=-1) + 1e-20)
    return jnp.sum(lap_mag * m) / jnp.clip(m.sum(), 1.0, None)


def make_mesh_fit(grid: TetGrid, color_fn, cfg: MeshFitConfig, mesh=None):
    """Build jitted `fit(state, opt_state, targets, key)`.

    state: {"field": albedo field params, "sdf": (V,), "deform": (V, 3) raw}.
    color_fn(field_params, xyz) -> rgb in [0,1] (the NGP albedo field).
    targets: dict images/masks/normals/poses/intrinsics/cam_weights/
    cam_lights as in nerf_fit.

    mesh: optional jax.sharding.Mesh with a 'dp' axis. When given, the
    pixel rows (H axis) of the rendered maps and the regularizer face
    samples are sharded over 'dp' (same constraint-based SPMD pattern as
    nerf_fit): the field shading, loss, and soft-alpha math — the
    FLOP-heavy, per-pixel half of the step — split across chips, GSPMD
    propagates the sharding backward into the tile shader, and the
    scalar loss makes XLA emit the gradient psum over ICI. Extraction
    and binning stay replicated (integer machinery, ~30% of the step —
    the modeled 8-chip projection in PERF.md accounts for this Amdahl
    split).
    """
    from .mesh.structured_tets import (StructuredTetGrid,
                                       marching_tets_structured,
                                       marching_tets_topology,
                                       marching_tets_verts)
    tm = Tonemapping()
    optimizer = optax.scale_by_adam(b1=0.9, b2=0.99, eps=1e-15)
    structured = isinstance(grid, StructuredTetGrid)
    cell = (2.0 / grid.resolution if structured
            else 2.0 / max(round((len(grid.verts)) ** (1 / 3)) - 1, 1))
    grid_arrays = grid.arrays()

    def _caps():
        # ONE cap formula for both the fused extract and the frozen-
        # topology path: if they diverged, frozen-path buffer shapes would
        # silently mismatch the final extract's (recompile or shape error)
        g = grid.resolution
        vc = cfg.vert_cap or (1 << max(9, (16 * g * g - 1).bit_length()))
        return vc, cfg.face_cap or vc + (vc >> 1)

    @jax.jit
    def _extract_jit(state, ga):
        # jitted: eager marching_tets materializes poorly-tiled (N,3)
        # temporaries (42x padding) and OOMs at full tet scale
        deform = jnp.tanh(state["deform"]) * (cfg.deform_scale * cell)
        if structured:
            # closed-form topology: 8x faster extraction at tet 128
            # (225 vs 1798 ms, benchmarks/prof_extract_bwd.py)
            vc, fc = _caps()
            return marching_tets_structured(
                grid, ga, state["sdf"], deform=deform, vert_cap=vc,
                face_cap=fc)
        if cfg.vert_cap:
            return marching_tets_compact(
                ga, state["sdf"], deform=deform, vert_cap=cfg.vert_cap,
                face_cap=cfg.face_cap or 2 * cfg.vert_cap)
        return marching_tets(ga, state["sdf"], deform=deform)

    def extract(state, ga=None):
        return _extract_jit(state, ga if ga is not None else grid_arrays)

    freeze_topo = cfg.freeze_topology and structured
    if cfg.freeze_topology and not structured:
        raise ValueError("freeze_topology requires a StructuredTetGrid")

    def _deform(state):
        return jnp.tanh(state["deform"]) * (cfg.deform_scale * cell)

    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P
        _row_spec = NamedSharding(mesh, P(None, "dp"))
        _face_spec = NamedSharding(mesh, P("dp"))

    def _shard_rows(x):
        # (B, H, W, ...) pixel maps: shard H over 'dp'
        if mesh is None or getattr(x, "ndim", 0) < 3:
            return x
        return jax.lax.with_sharding_constraint(x, _row_spec)

    def loss_fn(state, batch, key, ga, sw, lpips_params, topo=None):
        if topo is not None:
            # frozen topology: only the vertex lerp is recomputed (and
            # differentiated) this step
            mt = dict(topo)
            mt["verts"] = marching_tets_verts(grid, topo, state["sdf"],
                                              deform=_deform(state))
        else:
            mt = extract(state, ga)
        # regularizers on a face subsample: full-buffer scatter temporaries
        # at DMTet scale tile-pad badly on TPU
        if cfg.reg_face_samples and cfg.reg_face_samples < mt["faces"].shape[0]:
            rf = jax.random.randint(key, (cfg.reg_face_samples,), 0,
                                    mt["faces"].shape[0])
            if mesh is not None:
                rf = jax.lax.with_sharding_constraint(rf, _face_spec)
            reg_faces = mt["faces"][rf]
            reg_mask = mt["face_mask"][rf]
        else:
            reg_faces = mt["faces"]
            reg_mask = mt["face_mask"]

        def shading_fun(xyz, normal, view_dir):
            return color_fn(state["field"], _shard_rows(xyz))

        out = render_views(
            mt["verts"], mt["faces"], mt["face_mask"], batch["poses"],
            batch["intrinsics"], cfg.raster, shading_fun=shading_fun,
            ssaa=cfg.ssaa, bg_color=cfg.bg_color)
        if mesh is not None:
            # pixel-sharded SPMD: the loss/shading math downstream (and,
            # via GSPMD's backward propagation, the tile shader upstream)
            # splits over chips; batch targets get the same layout below
            out = {k: _shard_rows(v) for k, v in out.items()}
            batch = dict(batch)
            for k in ("rgb", "mask", "normal"):
                if k in batch:
                    batch[k] = _shard_rows(batch[k])
        alpha = out["alpha"]
        albedo = out["rgb"]
        # lambertian shading in tonemapped log space (same as nerf_fit)
        n_img = out["normal"]  # world normals
        if cfg.shaded:
            lam = jnp.clip(jnp.sum(
                batch["cam_lights"][:, None, None, :] * n_img, axis=-1,
                keepdims=True), 0.0, None)
            shading = lam * (1 - cfg.ambient_light) + cfg.ambient_light
            fg = jnp.clip((albedo - cfg.bg_color * (1 - alpha))
                          / jnp.clip(alpha, 1e-6, None), 1e-4, 1.0)
            rgb = tm.lut(tm.inverse_lut(fg)
                         + jnp.log2(jnp.clip(shading, 1e-6, None)))
            rgb = rgb * alpha + cfg.bg_color * (1 - alpha)
        else:
            rgb = albedo
        w = (batch["cam_weight"]
             / jnp.clip(jnp.mean(batch["cam_weight"]), 1e-6, None)
             )[:, None, None, None]
        total = L.l1_loss(rgb, batch["rgb"], weight=w) * cfg.pixel_rgb_weight
        metrics = {"pixel_rgb": total}
        a_loss = L.l1_loss(alpha, batch["mask"], weight=w) * cfg.alpha_weight
        total += a_loss
        metrics["alpha"] = a_loss
        if "normal" in batch:
            # normal map in [0,1] camera space vs target; per-view target
            # validity via normal_weight (only view 0 has an Omnidata map
            # in image-to-3D, mvedit_3d_pipeline.py:248-303)
            nx = jnp.moveaxis(n_img, -1, 1)
            nt = jnp.moveaxis(batch["normal"], -1, 1) * 2 - 1
            if "normal_weight" in batch:
                # tv_loss differentiates the weight map spatially too —
                # give it full (B, C, H, W) maps, not broadcastable 1s
                nw = jnp.broadcast_to(
                    batch["normal_weight"][:, None, None, None], nx.shape)
                n_loss = (L.tv_loss(nx, nt, weight=nw, power=1.5)
                          + L.tv_loss(nx, None, weight=1 - nw, power=1.5))
            else:
                n_loss = L.tv_loss(nx, nt, power=1.5)
            n_loss = n_loss * sw["normal_reg"]
            total += n_loss
            metrics["normal"] = n_loss
        if lpips_params is not None:
            ps = min(cfg.patch_size, cfg.raster.height)
            k_oy, k_ox = jax.random.split(jax.random.fold_in(key, 7))
            nb = rgb.shape[0]
            oy = jax.random.randint(k_oy, (nb,), 0,
                                    cfg.raster.height - ps + 1)
            ox = jax.random.randint(k_ox, (nb,), 0,
                                    cfg.raster.width - ps + 1)

            def crop(img, y, x):
                return jax.lax.dynamic_slice(img, (y, x, 0), (ps, ps, 3))

            pr = jax.vmap(crop)(rgb, oy, ox)
            pt = jax.vmap(crop)(batch["rgb"], oy, ox)
            p_loss = L.lpips_apply(lpips_params, pr, pt,
                                   weight=batch["cam_weight"]) \
                * sw["patch_rgb"]
            total += p_loss
            metrics["patch_rgb"] = p_loss
        lap = laplacian_loss(mt["verts"], reg_faces, reg_mask,
                             mt["vert_mask"]) * cfg.laplacian_weight
        total += lap
        metrics["laplacian"] = lap
        if cfg.normal_consistency_weight > 0:
            nc = normal_consistency_loss(
                mt["verts"], reg_faces, reg_mask) \
                * cfg.normal_consistency_weight
            total += nc
            metrics["normal_consistency"] = nc
        return total, metrics

    def sample_batch(key, targets):
        n = targets["images"].shape[0]
        p = (targets["cam_weights"] > 0).astype(jnp.float32)
        ids = jax.random.categorical(
            key, jnp.log(jnp.clip(p, 1e-9, None))[None].repeat(
                cfg.render_bs, 0))
        batch = {"poses": targets["poses"][ids],
                 "intrinsics": targets["intrinsics"][ids],
                 "rgb": targets["images"][ids],
                 "mask": targets["masks"][ids],
                 "cam_weight": targets["cam_weights"][ids],
                 "cam_lights": targets["cam_lights"][ids]}
        if "normals" in targets:
            batch["normal"] = targets["normals"][ids]
            if "normal_weights" in targets:
                batch["normal_weight"] = targets["normal_weights"][ids]
        return batch

    @partial(jax.jit, donate_argnums=(0, 1))
    def _fit(state, opt_state, targets, key, ga, sched=None,
             lpips_params=None):
        # tet topology arrives as TRACED args (ga): baking the >100MB numpy
        # topology in as constants overflows the compiler request payload
        sw = default_mesh_schedule_weights(cfg) if sched is None else sched
        topo = None
        if freeze_topo:
            vc, fc = _caps()
            topo = marching_tets_topology(grid, ga, state["sdf"],
                                          vert_cap=vc, face_cap=fc)
            # stop_gradient is structural (all-integer), kept as intent
            topo = jax.lax.stop_gradient(topo)

        def step(carry, k):
            state, opt_state = carry
            k1, k2 = jax.random.split(k)
            batch = sample_batch(k1, targets)
            (loss, metrics), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(state, batch, k2, ga, sw,
                                       lpips_params, topo=topo)
            updates, opt_state = optimizer.update(grads, opt_state, state)
            # per-subtree lr: field at lr, sdf/deform at lr * sdf_lr_scale
            # (* lr multiplier near the end, mvedit_3d_pipeline.py:688-689)
            sdf_lr = sw["lr"] * cfg.sdf_lr_scale * sw["sdf_lr_mult"]
            updates = {
                k_: jax.tree_util.tree_map(
                    lambda u: u * (-sw["lr"] if k_ == "field" else -sdf_lr),
                    v) for k_, v in updates.items()}
            state = optax.apply_updates(state, updates)
            return (state, opt_state), loss

        keys = jax.random.split(key, cfg.n_steps)
        (state, opt_state), losses_hist = jax.lax.scan(
            step, (state, opt_state), keys)
        # return the extraction too: callers reuse it instead of running a
        # separate extraction program (whose un-donated workspace OOMs when
        # HBM is near-full at production scale)
        mt = extract(state, ga)
        return state, opt_state, {"loss": losses_hist, "mt": mt}

    def fit(state, opt_state, targets, key, sched=None, lpips_params=None):
        return _fit(state, opt_state, targets, key, grid_arrays,
                    sched=sched, lpips_params=lpips_params)

    return fit, optimizer, extract


def make_texture_refine(color_fn, cfg: MeshFitConfig, n_steps: int = 24,
                        mesh=None):
    """Texture-only refinement on a FIXED (decimated) mesh.

    The reference's final mesh_optim steps after quadric decimation
    (`mvedit_3d_pipeline.py:827-847,925`): the simplified mesh is frozen
    and only the albedo field keeps optimizing. Returns a jitted
    `refine(field_params, opt_state, verts, faces, targets, key,
    sched=None, lpips_params=None)`. `mesh` shards the pixel rows over
    'dp' as in make_mesh_fit.
    """
    tm = Tonemapping()
    optimizer = optax.scale_by_adam(b1=0.9, b2=0.99, eps=1e-15)
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P
        _row_spec = NamedSharding(mesh, P(None, "dp"))

    def _shard_rows(x):
        if mesh is None or getattr(x, "ndim", 0) < 3:
            return x
        return jax.lax.with_sharding_constraint(x, _row_spec)

    def loss_fn(field, batch, verts, faces, fmask, sw, lpips_params, key):
        def shading_fun(xyz, normal, view_dir):
            return color_fn(field, _shard_rows(xyz))

        out = render_views(verts, faces, fmask, batch["poses"],
                           batch["intrinsics"], cfg.raster,
                           shading_fun=shading_fun, ssaa=cfg.ssaa,
                           bg_color=cfg.bg_color)
        if mesh is not None:
            out = {k: _shard_rows(v) for k, v in out.items()}
            batch = dict(batch)
            batch["rgb"] = _shard_rows(batch["rgb"])
        alpha = out["alpha"]
        albedo = out["rgb"]
        if cfg.shaded:
            lam = jnp.clip(jnp.sum(
                batch["cam_lights"][:, None, None, :] * out["normal"],
                axis=-1, keepdims=True), 0.0, None)
            shading = lam * (1 - cfg.ambient_light) + cfg.ambient_light
            fg = jnp.clip((albedo - cfg.bg_color * (1 - alpha))
                          / jnp.clip(alpha, 1e-6, None), 1e-4, 1.0)
            rgb = tm.lut(tm.inverse_lut(fg)
                         + jnp.log2(jnp.clip(shading, 1e-6, None)))
            rgb = rgb * alpha + cfg.bg_color * (1 - alpha)
        else:
            rgb = albedo
        w = (batch["cam_weight"]
             / jnp.clip(jnp.mean(batch["cam_weight"]), 1e-6, None)
             )[:, None, None, None]
        total = L.l1_loss(rgb, batch["rgb"], weight=w) * cfg.pixel_rgb_weight
        if lpips_params is not None:
            ps = min(cfg.patch_size, cfg.raster.height)
            k_oy, k_ox = jax.random.split(key)
            nb = rgb.shape[0]
            oy = jax.random.randint(k_oy, (nb,), 0,
                                    cfg.raster.height - ps + 1)
            ox = jax.random.randint(k_ox, (nb,), 0,
                                    cfg.raster.width - ps + 1)

            def crop(img, y, x):
                return jax.lax.dynamic_slice(img, (y, x, 0), (ps, ps, 3))

            pr = jax.vmap(crop)(rgb, oy, ox)
            pt = jax.vmap(crop)(batch["rgb"], oy, ox)
            total += L.lpips_apply(lpips_params, pr, pt,
                                   weight=batch["cam_weight"]) \
                * sw["patch_rgb"]
        return total

    def sample_batch(key, targets):
        p = (targets["cam_weights"] > 0).astype(jnp.float32)
        ids = jax.random.categorical(
            key, jnp.log(jnp.clip(p, 1e-9, None))[None].repeat(
                cfg.render_bs, 0))
        return {"poses": targets["poses"][ids],
                "intrinsics": targets["intrinsics"][ids],
                "rgb": targets["images"][ids],
                "cam_weight": targets["cam_weights"][ids],
                "cam_lights": targets["cam_lights"][ids]}

    @partial(jax.jit, donate_argnums=(0, 1))
    def refine(field, opt_state, verts, faces, targets, key, sched=None,
               lpips_params=None):
        sw = default_mesh_schedule_weights(cfg) if sched is None else sched
        fmask = jnp.ones((faces.shape[0],), bool)

        def step(carry, k):
            field, opt_state = carry
            k1, k2 = jax.random.split(k)
            batch = sample_batch(k1, targets)
            loss, grads = jax.value_and_grad(loss_fn)(
                field, batch, verts, faces, fmask, sw, lpips_params, k2)
            updates, opt_state = optimizer.update(grads, opt_state, field)
            updates = jax.tree_util.tree_map(
                lambda u: u * (-sw["lr"]), updates)
            field = optax.apply_updates(field, updates)
            return (field, opt_state), loss

        keys = jax.random.split(key, n_steps)
        (field, opt_state), losses = jax.lax.scan(
            step, (field, opt_state), keys)
        return field, opt_state, losses

    return refine, optimizer
