"""MVEdit 3D pipeline: the denoise <-> reconstruct alternation (the product).

TPU-native rebuild of `MVEdit3DPipeline.__call__`
(`lib/pipelines/mvedit_3d_pipeline.py:875-1499`). Control flow (SURVEY §3.1):

  for t in [None] + timesteps:
    camera schedule: prune to max_num_views(progress) (:1149-1215)
    P1 denoise (2-pass: encoder once, decoder w/ extra ControlNets only;
                1-pass: all ControlNets on the previous step's renders)
    x0 = (x_t - sqrt(1-acp) eps) / sqrt(acp) -> VAE decode -> target views
    3D fuse: progress <= switch -> NeRF inner loop; after -> DMTet inner loop
      (at render_size_p(progress): 128 -> 256 -> 512, :52-58)
    re-render all views [-> SRVGG image enhancer when render < 512, :1400]
      -> ControlNet tile/depth inputs
    P2 denoise (2-pass only): decoder re-run with tile+depth residuals
    eps_3d from VAE-encoded renders; blend with eps_unet by
      blend_weight = 1 - sqrt(acp_t)  ('dynamic', :1438-1479)
    scheduler.step
  final step: quadric decimation + texture-only refinement steps
    (:827-847, mesh_simplify_texture_steps :925)
  bake albedo field -> UV atlas -> Mesh

TPU design decisions (SURVEY §7.6):
- the view axis is pruned by flipping cam_weights to 0 (fit sampling honors
  the mask) and physically gathered down only at a few static BUCKET sizes
  (start/mid/end of the reference's view schedule) — each bucket is one
  compiled program, and the denoise FLOPs actually shrink as views drop;
- each phase (denoise step, fit loop, render-all-views, VAE enc/dec) is one
  jitted function reused across timesteps;
- the NeRF->DMTet switch and each render-size ramp step are compile
  boundaries;
- progress-scheduled scalars (lr, entropy/patch/normal-reg weights) ride as
  traced scalars so schedules do not retrigger compilation
  (models/nerf_fit.py `sched`, models/mesh_fit.py `sched`).
"""
import math
import os
from dataclasses import dataclass, field
from functools import partial
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..models.diffusion import schedulers as S
from ..models.fields import (INGPConfig, ingp_init,
                             ingp_point_decode, FieldColor)
from ..models.volume_renderer import RenderConfig, OccupancyGrid
from ..models import nerf_fit as NF
from ..models import mesh_fit as MF
from ..models.mesh import (RasterConfig, build_grid_tets, render_views,
                           bake_texture, Mesh)
from ..ops.image import edge_dilation
from ..ops.rotation import prune_cameras
from ..utils.geometry import normalize_depth

__all__ = ["MVEdit3DConfig", "MVEdit3DPipeline", "default_max_num_views",
           "default_lr_schedule", "default_render_size_p",
           "default_entropy_weight", "default_patch_rgb_weight",
           "default_patch_normal_weight", "default_normal_reg_weight",
           "default_lr_multiplier"]


def _ingp_decode(params, xyz, ingp_cfg):
    """Module-level decode fn (stable identity for jit caches)."""
    return ingp_point_decode(params, xyz, ingp_cfg)


def _ingp_color(params, xyz, ingp_cfg):
    return ingp_point_decode(params, xyz, ingp_cfg)[1]


# ---- progress schedules (mvedit_3d_pipeline.py:41-78) --------------------

def default_lr_multiplier(progress, progress_to_dmtet):
    return min((1 - progress) / (1 - progress_to_dmtet), 1)


def default_max_num_views(progress, progress_to_dmtet, start_num=32,
                          mid_num=16, end_num=9, power=3):
    """View-count schedule (mvedit_3d_pipeline.py:45-49)."""
    ratio = end_num / mid_num
    a = (start_num - mid_num) * (1 - progress) ** power + mid_num
    b = min((1 - progress) / (1 - progress_to_dmtet), 1) * (1 - ratio) + ratio
    return a * b


def default_render_size_p(progress, full=512):
    """Render-size ramp 128 -> 256 -> 512 (mvedit_3d_pipeline.py:52-58)."""
    if progress <= 0.3:
        return full // 4
    if progress <= 0.6:
        return full // 2
    return full


def default_lr_schedule(progress, start_lr=0.01, end_lr=0.005):
    return start_lr - (start_lr - end_lr) * progress


def default_patch_rgb_weight(progress, start_weight=0.3, end_weight=1.5):
    return start_weight + (end_weight - start_weight) * progress


def default_patch_normal_weight(progress, start_weight=0.0, end_weight=3.0):
    return start_weight + (end_weight - start_weight) * progress


def default_entropy_weight(progress, start_weight=0.0, end_weight=4.0):
    return start_weight - (start_weight - end_weight) * progress


def default_normal_reg_weight(progress, start_weight=4.0, end_weight=0.0):
    return start_weight - (start_weight - end_weight) * progress


@dataclass(frozen=True)
class MVEdit3DConfig:
    num_views: int = 32              # start of the view schedule
    mid_num_views: int = 16
    min_num_views: int = 9
    keep_first_views: int = 0        # views never pruned (input view etc.)
    render_size: int = 512
    render_size_ramp: bool = True    # 128 -> 256 -> 512 ramp (:52-58)
    latent_size: int = 64
    diffusion_steps: int = 24
    denoising_strength: float = 1.0
    guidance_scale: float = 7.0
    tile_weight: float = 1.0
    depth_weight: float = 0.5
    extra_control_scale: float = 1.0  # ip2p etc. (adapter3d_mixin.py:182)
    nerf_switch_progress: float = 0.6   # NeRF -> DMTet (:899)
    init_inverse_steps: int = 640
    n_inverse_steps: int = 80
    tet_init_inverse_steps: int = 120   # first DMTet fit (:1316)
    tet_resolution: int = 64
    # closed-form structured grid (8x faster extraction at tet 128); the
    # table-driven build_grid_tets path remains for irregular grids
    structured_tets: bool = True
    # snapshot the marching-tets topology once per <=8-step fit program
    # and re-lerp only vertex positions per inner step (structured grids
    # only; step 0 of each program is exact, later steps' face tables are
    # at most 7 sdf-updates stale)
    freeze_mesh_topology: bool = True
    # render_all dispatches this many views per program: ONE compiled
    # renderer per (mode, render size) reused across every view-pruning
    # bucket (N-jitted whole-bucket renders recompiled ~65 s per
    # (bucket, rs) pair). 2 bounds the dup-view padding waste at one
    # view; ~27 ms tunnel dispatch per chunk.
    render_view_chunk: int = 2
    patch_size: int = 128
    patch_bs: int = 1
    # largest image-space batch run as ONE program (the reference's
    # --diff-bs role, app.py:36). On TPU the UNet stays whole (refpair
    # batching is where the MXU pays) but the 512^2 VAE passes are
    # chunked: a loaded TPU executable permanently reserves its temp
    # arena in HBM, and a 32-view VAE decode arena alone crowds out the
    # mesh-phase raster programs
    diff_bs: int = 8
    # max lax.scan length per fit PROGRAM: single-program device runtime
    # must stay bounded (the tunneled device kills executions after
    # ~10 min with UNAVAILABLE; a 120-step tet-128 mesh fit is ~14 min).
    # n_steps fits run as ceil(n/L) chained calls of one donated-buffer
    # program — which also deduplicates compiles (tet-init 120 and
    # per-step 80 share the same 8-step program). 0 = unchunked.
    fit_steps_per_program: int = 8
    blend_mode: str = "dynamic"      # blend_weight = 1 - sqrt(acp)
    # progress schedules (:60-78); entropy_d = entropy bg_width
    start_lr: float = 0.01
    end_lr: float = 0.005
    start_entropy_weight: float = 0.0
    end_entropy_weight: float = 4.0
    entropy_d: float = 0.015
    start_patch_rgb_weight: float = 0.3
    end_patch_rgb_weight: float = 1.5
    start_patch_normal_weight: float = 0.0
    end_patch_normal_weight: float = 3.0
    start_normal_reg_weight: float = 4.0
    end_normal_reg_weight: float = 0.0
    mesh_normal_reg_weight: float = 5.0
    mesh_smoothness: float = 1.0     # scales laplacian + NC regularizers
                                     # (ref mesh_optim lapsmth weights)
    alpha_soften: float = 0.02
    use_lpips: bool = False          # patch LPIPS losses (needs
                                     # models.lpips_params)
    # final decimation + texture-only steps (:827-847,925)
    mesh_reduction: float = 1.0      # <1 enables quadric decimation
    mesh_simplify_texture_steps: int = 24
    ingp: INGPConfig = field(default_factory=INGPConfig)
    render: RenderConfig = field(default_factory=RenderConfig)
    mode: str = "2-pass"             # '1-pass' (instruct) | '2-pass'
    # reference conditioning (mvedit_3d_pipeline.py:892 use_reference,
    # default True): the cond pass pairs each view with its fixed
    # reference latent; OFF -> all-view joint attention (our extension)
    use_reference: bool = True
    # per-step tile dumps (the reference's --debug {0,1,2} affordance,
    # mvedit_3d_pipeline.py:392-408 save_tiled_viz): 0 = off, >=1 dumps
    # [targets | renders] tiles per view per denoise step into debug_dir
    debug: int = 0
    debug_dir: str = "/tmp/mvedit_debug"

    def view_buckets(self):
        """Static view-buffer sizes the pipeline compiles for, descending."""
        b = [self.num_views]
        for n in (self.mid_num_views, self.min_num_views):
            n = max(n, max(self.keep_first_views, 1))
            if n < b[-1]:
                b.append(n)
        return tuple(b)

    def render_sizes(self):
        if not self.render_size_ramp:
            return (self.render_size,)
        return tuple(sorted({max(self.render_size // 4, self.patch_size),
                             max(self.render_size // 2, self.patch_size),
                             self.render_size}))


def _mem_debug(tag):
    """MVEDIT_DEBUG_MEM=1: print live device-array residency (works through
    the axon tunnel where device.memory_stats() returns {}) plus whatever
    allocator stats the backend does expose."""
    if not os.environ.get("MVEDIT_DEBUG_MEM"):
        return
    live = [x for x in jax.live_arrays() if not x.is_deleted()]
    tot = sum(x.nbytes for x in live)
    top = sorted(((x.nbytes, x.shape, str(x.dtype)) for x in live),
                 reverse=True)[:6]
    stats = jax.local_devices()[0].memory_stats() or {}
    print(f"[mem@{tag}] live={tot / 2**30:.2f}GiB n={len(live)} top="
          f"{[(round(n / 2**20, 1), s, d) for n, s, d in top]} "
          f"{ {k: round(v / 2**30, 2) for k, v in stats.items() if 'bytes_in_use' in k or 'peak' in k} }",
          flush=True)


def _gather_views(tree, ids):
    """Gather the leading (view) axis of every per-view array."""
    ids = np.asarray(ids)

    def g(x):
        if x is None:
            return None
        return x[jnp.asarray(ids)] if hasattr(x, "shape") else x
    return jax.tree_util.tree_map(g, tree)


class MVEdit3DPipeline:
    """Orchestrates jitted phases from Python (one iteration per timestep).

    Construction wants a `models` namespace holding module defs + params:
      unet, unet_params, controlnets (tile, depth[, extras...]), cn_params,
      vae, vae_params, schedule (NoiseSchedule); optionally segment_fn,
      lpips_params, enhance_fn (SRVGG upsampler), ip_context.
    """

    def __init__(self, models, cfg: MVEdit3DConfig):
        self.m = models
        self.cfg = cfg
        self.schedule = models.schedule
        # stable function objects: a fresh lambda per call would defeat the
        # jit caches of the renderers/fitters (recompile every timestep)
        self._decode_fn = partial(_ingp_decode, ingp_cfg=cfg.ingp)
        self._color_fn = partial(_ingp_color, ingp_cfg=cfg.ingp)
        self._fit_cache = {}
        # multi-chip: models.device_mesh (jax.sharding.Mesh with a 'dp'
        # axis) shards the denoise/VAE view batches and the fit's ray axis
        # across chips; params ride replicated (SURVEY §2.7 TPU note —
        # one pjit program, collectives over ICI, not NCCL DDP)
        self.device_mesh = getattr(models, "device_mesh", None)

    # ---------------- sharding helpers ----------------------------------

    def _shard_batch(self, x):
        """Place a per-view (or 2N CFG) batch on the mesh, view-sharded."""
        if self.device_mesh is None or x is None:
            return x
        n_dev = self.device_mesh.devices.size
        if x.shape[0] % n_dev != 0:
            return x
        from jax.sharding import NamedSharding, PartitionSpec as P
        spec = P(*(("dp",) + (None,) * (x.ndim - 1)))
        return jax.device_put(x, NamedSharding(self.device_mesh, spec))

    def _replicate_params(self):
        if self.device_mesh is None:
            return
        from jax.sharding import NamedSharding, PartitionSpec as P
        rep = NamedSharding(self.device_mesh, P())
        put = partial(jax.device_put, device=rep)
        m = self.m
        m.unet_params = jax.tree_util.tree_map(put, m.unet_params)
        m.cn_params = jax.tree_util.tree_map(put, m.cn_params)
        m.vae_params = jax.tree_util.tree_map(put, m.vae_params)
        if getattr(m, "lpips_params", None) is not None:
            m.lpips_params = jax.tree_util.tree_map(put, m.lpips_params)

    # ---------------- jitted phases -------------------------------------

    def _vae_decode(self):
        vae = self.m.vae

        @jax.jit
        def dec(params, lat):
            return vae.apply({"params": params}, lat, method=vae.decode)
        return self._chunk_views(dec)

    def _vae_encode(self):
        vae = self.m.vae

        @jax.jit
        def enc(params, img):
            return vae.apply({"params": params}, img, method=vae.encode)
        return self._chunk_views(enc)

    def _chunk_views(self, fn):
        """Bound the per-program view batch to cfg.diff_bs (single-chip).

        Remainders are padded up to one chunk so exactly one executable
        per chunk shape exists. Under a device mesh the batch stays whole
        (it is dp-sharded across chips, per-chip slice already small)."""
        bs = max(int(self.cfg.diff_bs), 1)

        def run(params, x):
            n = x.shape[0]
            if self.device_mesh is not None or n <= bs:
                return fn(params, x)
            outs = []
            for i in range(0, (n // bs) * bs, bs):
                outs.append(fn(params, x[i:i + bs]))
            r = n % bs
            if r:
                pad = jnp.concatenate(
                    [x[n - r:], jnp.repeat(x[:1], bs - r, 0)], axis=0)
                outs.append(fn(params, pad)[:r])
            return jnp.concatenate(outs, axis=0)
        return run

    def _denoise(self, num_views):
        from .denoise import (DenoiseModels, make_noise_pred_1pass,
                              make_noise_pred_2pass,
                              make_chunked_noise_pred_1pass,
                              make_chunked_noise_pred_2pass)
        ip_ctx = getattr(self.m, "ip_context", None)
        # diff_bs view chunking is exact in use_reference mode and makes
        # the UNet programs bucket-size independent (ONE executable reused
        # at every view count — bounded arena, no bucket recompiles).
        # Under a device mesh the batch is dp-sharded instead.
        chunked = (self.cfg.use_reference and self.device_mesh is None
                   and 0 < self.cfg.diff_bs < num_views)
        key = ("denoise", "chunked" if chunked else num_views,
               self.cfg.mode)
        if key in self._fit_cache:
            return self._fit_cache[key]
        dm = DenoiseModels(unet=self.m.unet,
                           controlnets=tuple(self.m.controlnets),
                           num_views=num_views,
                           use_reference=self.cfg.use_reference,
                           ip_tokens=0 if ip_ctx is None
                           else int(ip_ctx.shape[1]))
        if self.cfg.mode == "1-pass":
            fns = (make_chunked_noise_pred_1pass(dm, self.cfg.diff_bs)
                   if chunked else make_noise_pred_1pass(dm)), None
        elif chunked:
            fns = make_chunked_noise_pred_2pass(dm, self.cfg.diff_bs)
        else:
            fns = make_noise_pred_2pass(dm)
        self._fit_cache[key] = fns
        return fns

    def _nerf_fit_fns(self, rs, n_steps):
        """(fit, optimizer) for render size rs.

        Fit programs are built at <= cfg.fit_steps_per_program scan steps
        and chained (donated buffers) to cover n_steps — bounding
        single-program device runtime and sharing ONE compiled program
        between the init (640) and per-timestep (80) fits."""
        cfg = self.cfg

        def get(steps):
            key = ("nerf", rs, steps)
            if key not in self._fit_cache:
                fit_cfg = NF.NerfFitConfig(
                    render=cfg.render, patch_size=min(cfg.patch_size, rs),
                    patch_bs=cfg.patch_bs, n_steps=steps,
                    alpha_soften=cfg.alpha_soften, bg_width=cfg.entropy_d)
                self._fit_cache[key] = NF.make_nerf_fit(
                    self._decode_fn, fit_cfg, rs,
                    use_lpips=cfg.use_lpips and
                    getattr(self.m, "lpips_params", None) is not None,
                    mesh=self.device_mesh)
            return self._fit_cache[key]

        L = n_steps if cfg.fit_steps_per_program <= 0 \
            else min(n_steps, cfg.fit_steps_per_program)
        fit_l, opt = get(L)
        if L == n_steps:
            return fit_l, opt
        rem = n_steps % L
        fit_r = get(rem)[0] if rem else None

        def run(params, opt_state, grid, tgt, key, sched=None,
                lpips_params=None):
            hists = []
            for _ in range(n_steps // L):
                key, kc = jax.random.split(key)
                params, opt_state, grid, out = fit_l(
                    params, opt_state, grid, tgt, kc, sched=sched,
                    lpips_params=lpips_params)
                hists.append(out["loss"])
            if fit_r is not None:
                key, kc = jax.random.split(key)
                params, opt_state, grid, out = fit_r(
                    params, opt_state, grid, tgt, kc, sched=sched,
                    lpips_params=lpips_params)
                hists.append(out["loss"])
            return params, opt_state, grid, {
                "loss": jnp.concatenate(hists)}
        return run, opt

    def _mesh_raster_cfg(self, rs):
        # DMTet soups are many small tris: tight span, deep per-tile
        # budget. tile_chunk bounds the shade-stage working set (tiles
        # processed per lax.map step): at 512^2 the (chunk, px, K)
        # temporaries reach ~1.5GB at chunk 256, and a loaded TPU
        # executable RESERVES that arena for its lifetime — chunk 64
        # cuts it 4x for a few extra (fully parallel) map steps
        # pairs binning, k 768 -> 1024 (r4 sweep): DMTet surface tiles
        # hold ~900 overlapping tris at 512^2 — k 768 silently dropped
        # ~650 covered pixels (silhouette gradients); k 1024 recovers
        # them for +4 ms. bin_mode "t0" was A/B'd and lost on this
        # workload both ways (capacity at tile 16, gather rows at tile 8
        # — PERF.md r4)
        return RasterConfig(height=rs, width=rs, span=2,
                            k_per_tile=1024 if rs >= 256 else 256,
                            tile_chunk=64 if rs >= 512 else 256)

    def _mesh_fit_fns(self, tet_grid, n_steps):
        """(fit, optimizer, extract) — fit covers n_steps via chained
        <= fit_steps_per_program-step programs (see _nerf_fit_fns)."""
        cfg = self.cfg

        def get(steps):
            key = ("mesh", steps)
            if key not in self._fit_cache:
                # static-capacity surface compaction from res 32 up: caps
                # ~16/24 res^2 cover typical surfaces with slack; res >=
                # 128 REQUIRES it (full unique-edge buffers OOM at compile)
                res = cfg.tet_resolution
                vert_cap = 1 << max(9, (16 * res * res - 1).bit_length()) \
                    if res >= 32 else 0
                mcfg = MF.MeshFitConfig(
                    raster=self._mesh_raster_cfg(cfg.render_size),
                    n_steps=steps,
                    normal_reg_weight=cfg.mesh_normal_reg_weight,
                    laplacian_weight=0.25 * cfg.mesh_smoothness,
                    normal_consistency_weight=0.25 * cfg.mesh_smoothness,
                    patch_size=min(cfg.patch_size, cfg.render_size),
                    vert_cap=vert_cap,
                    face_cap=vert_cap + (vert_cap >> 1),
                    freeze_topology=(cfg.freeze_mesh_topology
                                     and cfg.structured_tets))
                self._fit_cache[key] = MF.make_mesh_fit(
                    tet_grid, self._color_fn, mcfg,
                    mesh=self.device_mesh)
            return self._fit_cache[key]

        L = n_steps if cfg.fit_steps_per_program <= 0 \
            else min(n_steps, cfg.fit_steps_per_program)
        fit_l, opt, extract = get(L)
        if L == n_steps:
            return fit_l, opt, extract
        rem = n_steps % L
        fit_r = get(rem)[0] if rem else None

        def run(state, opt_state, tgt, key, sched=None, lpips_params=None):
            out = None
            for _ in range(n_steps // L):
                key, kc = jax.random.split(key)
                state, opt_state, out = fit_l(
                    state, opt_state, tgt, kc, sched=sched,
                    lpips_params=lpips_params)
            if fit_r is not None:
                key, kc = jax.random.split(key)
                state, opt_state, out = fit_r(
                    state, opt_state, tgt, kc, sched=sched,
                    lpips_params=lpips_params)
            return state, opt_state, out
        return run, opt, extract

    # ---------------- schedules -----------------------------------------

    def _sched_weights(self, progress, phase):
        cfg = self.cfg
        lr = default_lr_schedule(progress, cfg.start_lr, cfg.end_lr)
        if phase == "nerf":
            return {
                "lr": jnp.asarray(lr, jnp.float32),
                "entropy": jnp.asarray(default_entropy_weight(
                    progress, cfg.start_entropy_weight,
                    cfg.end_entropy_weight), jnp.float32),
                "patch_rgb": jnp.asarray(default_patch_rgb_weight(
                    progress, cfg.start_patch_rgb_weight,
                    cfg.end_patch_rgb_weight), jnp.float32),
                "patch_normal": jnp.asarray(default_patch_normal_weight(
                    progress, cfg.start_patch_normal_weight,
                    cfg.end_patch_normal_weight), jnp.float32),
                "normal_reg": jnp.asarray(default_normal_reg_weight(
                    progress, cfg.start_normal_reg_weight,
                    cfg.end_normal_reg_weight), jnp.float32),
            }
        return {
            "lr": jnp.asarray(lr, jnp.float32),
            "sdf_lr_mult": jnp.asarray(default_lr_multiplier(
                progress, cfg.nerf_switch_progress), jnp.float32),
            "normal_reg": jnp.asarray(cfg.mesh_normal_reg_weight,
                                      jnp.float32),
            "patch_rgb": jnp.asarray(default_patch_rgb_weight(
                progress, cfg.start_patch_rgb_weight,
                cfg.end_patch_rgb_weight), jnp.float32),
            "patch_normal": jnp.asarray(default_patch_normal_weight(
                progress, cfg.start_patch_normal_weight,
                cfg.end_patch_normal_weight), jnp.float32),
        }

    def _resize_targets(self, tgt, rs):
        """Per-render-size supervision targets (the reference interpolates
        tgt tensors to render_size, mvedit_3d_pipeline.py:1283-1296)."""
        full = self.cfg.render_size
        if rs == full:
            return tgt
        out = dict(tgt)
        scale = rs / full

        def rsz(x, c):
            return jax.image.resize(
                x, (x.shape[0], rs, rs, c), "bilinear")

        out["images"] = rsz(tgt["images"], 3)
        out["masks"] = rsz(tgt["masks"], 1)
        if "normals" in tgt:
            out["normals"] = rsz(tgt["normals"], 3)
        if "depths" in tgt:
            out["depths"] = rsz(tgt["depths"][..., None], 1)[..., 0]
        out["intrinsics"] = tgt["intrinsics"] * scale
        return out

    # ---------------- main ----------------------------------------------

    def __call__(self, targets, key, prompt_embeds, negative_embeds,
                 init_latents=None, progress_callback=None,
                 init_field_params=None, extra_control_images=None):
        """Run the full loop.

        targets: dict with images (N,H,W,3), masks (N,H,W,1),
            poses (N,3,4), intrinsics (N,4), cam_weights (N,),
            cam_lights (N,3) [+ normals/depths/normal_weights] —
            N == cfg.num_views.
        prompt_embeds/negative_embeds: (N, L, C) per-view text embeddings.
        extra_control_images: list of (N,H,W,3) hints for ControlNets
            beyond tile+depth (default: the initial images, i.e. instruct
            ip2p conditioning, mvedit_3d_pipeline.py:358-361).
        Returns dict with mesh (Mesh), field params, renders.
        """
        cfg = self.cfg
        sch = self.schedule
        m = self.m

        self._replicate_params()
        vae_dec = self._vae_decode()
        vae_enc = self._vae_encode()
        lpips_params = getattr(m, "lpips_params", None) \
            if cfg.use_lpips else None
        ip_ctx = getattr(m, "ip_context", None)

        # --- per-view state (pruned by gathering at bucket sizes) -------
        tgt = dict(targets)
        n_extra_nets = max(len(m.controlnets) - 2, 0)
        if extra_control_images is None and n_extra_nets:
            extra_control_images = [tgt["images"]] * n_extra_nets
        extra_ctrl = list(extra_control_images or [])
        init_images = tgt["images"]
        init_masks = tgt["masks"]
        pos_e, neg_e = prompt_embeds, negative_embeds

        # --- init NeRF state -------------------------------------------
        key, k0 = jax.random.split(key)
        nerf_params = (init_field_params if init_field_params is not None
                       else ingp_init(k0, cfg.ingp))
        grid = OccupancyGrid.create(cfg.render.grid_size)
        _, nerf_opt = self._nerf_fit_fns(cfg.render_sizes()[0],
                                         cfg.n_inverse_steps)
        opt_state = nerf_opt.init(nerf_params)

        # --- diffusion state -------------------------------------------
        timesteps = S.make_timesteps(cfg.diffusion_steps,
                                     sch.num_train_timesteps, "trailing")
        n_keep = int(len(timesteps) * (1 - cfg.denoising_strength))
        timesteps = timesteps[n_keep:]

        key, k1, k2 = jax.random.split(key, 3)
        if init_latents is None:
            lat0 = vae_enc(m.vae_params,
                           self._shard_batch(tgt["images"] * 2.0 - 1.0))
        else:
            lat0 = init_latents
        # noise shared across views (reference convention:
        # randn_like(latents[0]).expand, mvedit_3d_pipeline.py:1467-1480)
        noise = jnp.broadcast_to(
            jax.random.normal(k1, lat0.shape[1:]), lat0.shape)
        t0_vec = jnp.full((lat0.shape[0],), int(timesteps[0]))
        latents = self._shard_batch(S.add_noise(sch, lat0, noise, t0_vec))
        solver_state = S.SolverState.init(latents.shape)
        if cfg.use_reference:
            # fixed clean reference latents + their on-schedule noisy
            # counterparts, denoised in lockstep (:1452-1456)
            ref_latents = lat0
            ref_noise = jnp.broadcast_to(
                jax.random.normal(k2, lat0.shape[1:]), lat0.shape)
            ref_noisy = self._shard_batch(
                S.add_noise(sch, ref_latents, ref_noise, t0_vec))
            ref_solver_state = S.SolverState.init(latents.shape)
            del ref_noise
        else:
            ref_latents = ref_noisy = ref_solver_state = None
        del lat0, noise

        mesh_state = None
        mesh_fit_fns = None
        mesh_opt_state = None
        last_mt = None
        ctrl_images = None   # previous-step renders at full size (1-pass)
        ctrl_depths = None
        renders = None
        keep_n = max(cfg.keep_first_views, 0)
        buckets = cfg.view_buckets()
        cur_n = cfg.num_views          # current DENOISE buffer size
        alive = np.ones(cur_n, bool)   # weight>0 mask of the bucket
        alive &= np.asarray(tgt["cam_weights"]) > 0
        # tgt stays FULL-SIZE for the whole run (pruned views keep
        # weight 0 and are never sampled): the fit programs' cost is
        # N-independent (they draw render_bs/patch_bs views by weight),
        # so pinning their target shapes means ONE compiled fit program
        # per phase instead of one per view bucket — bucket changes used
        # to recompile the multi-minute mesh/NeRF fit programs mid-run
        # (the round-3 e2e's wall-vs-steady gap). Only the denoise-side
        # arrays (latents, embeds, ctrl images...) shrink with the
        # bucket; `bsel` maps bucket rows -> global view ids.
        bsel = np.arange(cur_n)

        p1 = p2 = one_pass = None
        prev_rs = None
        from ..utils.profiling import phase_timer
        steps = [None] + list(timesteps)
        for i, t in enumerate(steps):
            pt = phase_timer()
            if pt is not None:
                pt.mark()
            progress = i / max(len(steps) - 1, 1)
            in_mesh_phase = progress > cfg.nerf_switch_progress
            rs = default_render_size_p(progress, cfg.render_size) \
                if (cfg.render_size_ramp and not in_mesh_phase) \
                else cfg.render_size
            if prev_rs is not None and rs != prev_rs and not in_mesh_phase:
                # render-size ramp step: the old-size fit + renderer
                # programs never run again — evict them (loaded TPU
                # executables reserve HBM arenas for their lifetime)
                for ck in [k for k in self._fit_cache
                           if k[0] == "nerf" and k[1] == prev_rs]:
                    fit_fn, _ = self._fit_cache.pop(ck)
                    if hasattr(fit_fn, "clear_cache"):
                        fit_fn.clear_cache()
                NF.clear_renderer_cache(prev_rs)
            prev_rs = rs

            # ---- camera schedule: prune + bucket gather (:1149-1215) ----
            if i > 0:
                target_n = max(int(round(default_max_num_views(
                    progress, cfg.nerf_switch_progress, cfg.num_views,
                    cfg.mid_num_views, cfg.min_num_views))), max(keep_n, 1))
                n_alive = int(alive.sum())
                if target_n < n_alive:
                    alive_ids = np.flatnonzero(alive)
                    poses_np = np.asarray(tgt["poses"])[bsel[alive_ids]]
                    if ctrl_images is not None:
                        diff = np.asarray(jnp.mean(
                            (ctrl_images - init_images) ** 2,
                            axis=(1, 2, 3)))
                        mask_mean = np.asarray(jnp.mean(
                            init_masks, axis=(1, 2, 3)))
                        bonus = (diff / (mask_mean + 0.1))[alive_ids]
                        # NaN renders (undertrained field) must not poison
                        # the min-score comparisons inside prune_cameras
                        bonus = np.nan_to_num(bonus, nan=0.0,
                                              posinf=0.0, neginf=0.0)
                        bonus = bonus[None, :] + bonus[:, None]
                    else:
                        bonus = None
                    kept_local = prune_cameras(
                        poses_np, list(range(min(keep_n, len(alive_ids)))),
                        target_n, pixel_dist_bonus=bonus)
                    kept_global = set(alive_ids[kept_local].tolist())
                    new_alive = np.array(
                        [j in kept_global for j in range(cur_n)])
                    if not np.array_equal(new_alive, alive):
                        # zero pruned views' weights GLOBALLY: the fit
                        # programs see the full buffer and gate sampling
                        # on weight > 0
                        dead_global = np.unique(bsel[~new_alive])
                        keep_global = np.unique(bsel[new_alive])
                        dead_global = np.setdiff1d(dead_global, keep_global)
                        alive = new_alive
                        if len(dead_global):
                            tgt["cam_weights"] = tgt["cam_weights"].at[
                                jnp.asarray(dead_global)].set(0.0)
                # gather the DENOISE-side arrays down to the next bucket
                # when all dead views fit out (tgt stays full-size)
                n_alive = int(alive.sum())
                for b in buckets:
                    if b < cur_n and n_alive <= b:
                        ids = np.flatnonzero(alive)[:b]
                        if len(ids) < b:   # pad with alive dupes (weight>0)
                            ids = np.concatenate(
                                [ids, np.repeat(ids[-1:], b - len(ids))])
                        init_images = init_images[jnp.asarray(ids)]
                        init_masks = init_masks[jnp.asarray(ids)]
                        extra_ctrl = [e[jnp.asarray(ids)]
                                      for e in extra_ctrl]
                        pos_e = pos_e[jnp.asarray(ids)]
                        neg_e = neg_e[jnp.asarray(ids)]
                        latents = latents[jnp.asarray(ids)]
                        solver_state = solver_state._replace(
                            prev_x0=solver_state.prev_x0[jnp.asarray(ids)])
                        if ref_noisy is not None:
                            ref_latents = ref_latents[jnp.asarray(ids)]
                            ref_noisy = ref_noisy[jnp.asarray(ids)]
                            ref_solver_state = ref_solver_state._replace(
                                prev_x0=ref_solver_state.prev_x0[
                                    jnp.asarray(ids)])
                        if ctrl_images is not None:
                            ctrl_images = ctrl_images[jnp.asarray(ids)]
                            ctrl_depths = ctrl_depths[jnp.asarray(ids)]
                        # chunked denoise fns are bucket-size independent
                        # (same executable, no hasattr(clear_cache));
                        # whole-batch fns re-jit at the new size — evict
                        # the superseded UNet+ControlNet programs
                        self._fit_cache.pop(
                            ("denoise", cur_n, self.cfg.mode), None)
                        for fn in (p1, p2, one_pass):
                            if fn is not None and hasattr(fn, "clear_cache"):
                                fn.clear_cache()
                        p1 = p2 = one_pass = None
                        cur_n = b
                        alive = alive[ids]
                        bsel = bsel[ids]
                        break

            N = cur_n
            if p1 is None and one_pass is None:
                if cfg.mode == "1-pass":
                    one_pass, _ = self._denoise(N)
                else:
                    p1, p2 = self._denoise(N)

            ip2 = None if ip_ctx is None else jnp.concatenate(
                [jnp.repeat(ip_ctx[:1], N, 0),
                 jnp.repeat(ip_ctx[1:2], N, 0)], axis=0)

            if t is not None:
                # ---- P1 denoise + x0 decode ----
                t_vec = self._shard_batch(
                    jnp.full((2 * N,), int(t), jnp.int32))
                cfg_lat = self._shard_batch(
                    jnp.concatenate([latents, latents], axis=0))
                embeds = self._shard_batch(
                    jnp.concatenate([neg_e, pos_e], 0))
                extras2 = tuple(self._shard_batch(
                    jnp.concatenate([e, e], 0)) for e in extra_ctrl)
                if cfg.mode == "1-pass":
                    # all nets on the previous step's renders (:1244-1248)
                    tiles2 = self._shard_batch(
                        jnp.concatenate([ctrl_images, ctrl_images], 0))
                    depths2 = self._shard_batch(
                        jnp.concatenate([ctrl_depths, ctrl_depths], 0))
                    conds = [tiles2, depths2] + list(extras2)
                    scales = [cfg.tile_weight, cfg.depth_weight] + \
                        [cfg.extra_control_scale] * len(extras2)
                    eps = one_pass(m.unet_params, m.cn_params, cfg_lat,
                                   t_vec, embeds, conds, scales,
                                   cfg.guidance_scale, ip_context=ip2,
                                   ref_noisy=ref_noisy)
                else:
                    eps, enc_state, p1_res = p1(
                        m.unet_params, m.cn_params, cfg_lat, t_vec,
                        embeds, None, cfg.depth_weight, cfg.guidance_scale,
                        ip_context=ip2, extra_images=extras2,
                        extra_scales=(cfg.extra_control_scale,)
                        * len(extras2), ref_noisy=ref_noisy)
                sa, sn = sch.sqrt_acp(jnp.asarray(int(t)))
                x0_lat = (latents - sn * eps) / sa
                dec_imgs = (vae_dec(m.vae_params, x0_lat) + 1) / 2
                dec_imgs = jnp.clip(dec_imgs, 0.0, 1.0)
                # scatter the bucket's decoded views back into the FULL
                # target buffer (pruned rows keep stale images but weight
                # 0 — never sampled by the fits)
                bj = jnp.asarray(bsel)
                tgt["images"] = tgt["images"].at[bj].set(dec_imgs)
                if getattr(m, "segment_fn", None) is not None:
                    tgt["masks"] = tgt["masks"].at[bj].set(
                        m.segment_fn(dec_imgs))
                if pt is not None:
                    pt.tick("denoise_p1+vae_dec", tgt["images"],
                            sig=(len(bsel), in_mesh_phase))

            # ---- 3D fuse ----
            key, kf = jax.random.split(key)
            if not in_mesh_phase:
                n_steps = cfg.init_inverse_steps if t is None \
                    else cfg.n_inverse_steps
                fit, _ = self._nerf_fit_fns(rs, n_steps)
                sw = self._sched_weights(progress, "nerf")
                tgt_rs = self._resize_targets(tgt, rs)
                nerf_params, opt_state, grid, _ = fit(
                    nerf_params, opt_state, grid, tgt_rs, kf,
                    sched=sw, lpips_params=lpips_params)
                if pt is not None:
                    pt.tick("nerf_fit", nerf_params,
                            sig=(rs, n_steps))
            else:
                first_mesh_step = mesh_state is None
                if first_mesh_step:
                    _mem_debug("mesh-switch")
                    # free the NeRF-phase optimizer state before building
                    # the mesh phase (hundreds of MB of Adam moments)
                    del opt_state
                    # evict the NeRF-phase executables: compiled TPU
                    # programs live in HBM, and by the switch we hold fit
                    # programs for every render size of the ramp plus the
                    # chunked image renderers — none runs again, but
                    # together they crowd out the mesh-phase raster peak
                    for ck in [k for k in self._fit_cache
                               if k[0] == "nerf"]:
                        fit_fn, _ = self._fit_cache.pop(ck)
                        if hasattr(fit_fn, "clear_cache"):
                            fit_fn.clear_cache()
                    NF.clear_renderer_cache()
                    if cfg.structured_tets:
                        from ..models.mesh.structured_tets import \
                            StructuredTetGrid
                        tet_grid = StructuredTetGrid(cfg.tet_resolution)
                    else:
                        tet_grid = build_grid_tets(cfg.tet_resolution)
                    sdf0 = MF.init_sdf_from_density(
                        lambda x: self._decode_fn(nerf_params, x)[0],
                        tet_grid)
                    mesh_state = {
                        "field": nerf_params,
                        "sdf": sdf0,
                        "deform": jnp.zeros((len(tet_grid.verts), 3)),
                    }
                    mesh_opt_state = self._mesh_fit_fns(
                        tet_grid, cfg.n_inverse_steps)[1].init(mesh_state)
                # first DMTet fit runs tet_init_inverse_steps (:1316)
                n_steps = cfg.tet_init_inverse_steps if first_mesh_step \
                    else cfg.n_inverse_steps
                mfit, _, _ = self._mesh_fit_fns(tet_grid, n_steps)
                sw = self._sched_weights(progress, "mesh")
                mesh_state, mesh_opt_state, fit_out = mfit(
                    mesh_state, mesh_opt_state, tgt, kf,
                    sched=sw, lpips_params=lpips_params)
                last_mt = fit_out["mt"]
                nerf_params = mesh_state["field"]
                if pt is not None:
                    pt.tick("mesh_fit", mesh_state["sdf"],
                            sig=(n_steps,))

            # ---- re-render the bucket's views -> ctrl inputs + eps_3d ----
            _mem_debug(f"render-all i={i}")
            tgt_b = {"poses": tgt["poses"][jnp.asarray(bsel)],
                     "intrinsics": tgt["intrinsics"][jnp.asarray(bsel)]}
            renders = self._render_all(nerf_params, mesh_state, last_mt,
                                       grid, tgt_b, rs)
            ctrl_depths_rs = normalize_depth(
                renders["depth"], renders["alpha"])[..., None].repeat(3, -1)
            ctrl_rgb = renders["rgb"]
            if rs != cfg.render_size:
                # upsample renders to the diffusion size; SRVGG enhancer
                # when present (mvedit_3d_pipeline.py:1400), else bilinear
                enhance = getattr(m, "enhance_fn", None)
                if enhance is not None:
                    ctrl_rgb = enhance(ctrl_rgb, cfg.render_size)
                else:
                    ctrl_rgb = jax.image.resize(
                        ctrl_rgb, (N, cfg.render_size, cfg.render_size, 3),
                        "bilinear")
                ctrl_depths_full = jax.image.resize(
                    ctrl_depths_rs,
                    (N, cfg.render_size, cfg.render_size, 3), "bilinear")
            else:
                ctrl_depths_full = ctrl_depths_rs
            ctrl_images = jnp.clip(ctrl_rgb, 0.0, 1.0)
            ctrl_depths = ctrl_depths_full
            if pt is not None:
                pt.tick("render_all", ctrl_images,
                        sig=(mesh_state is None, rs, len(bsel)))
            if cfg.debug:
                from ..utils.debug_viz import save_tiled_viz
                save_tiled_viz(cfg.debug_dir, i, renders,
                               _gather_views(tgt, bsel))

            if t is not None:
                lat_3d = vae_enc(m.vae_params,
                                 self._shard_batch(ctrl_images * 2 - 1))
                eps_3d = (latents - sa * lat_3d) / sn
                if cfg.mode == "1-pass":
                    eps_unet = eps
                else:
                    tiles2 = self._shard_batch(
                        jnp.concatenate([ctrl_images, ctrl_images], 0))
                    depths2 = self._shard_batch(
                        jnp.concatenate([ctrl_depths, ctrl_depths], 0))
                    eps_unet = p2(
                        m.unet_params, m.cn_params, cfg_lat,
                        enc_state, p1_res, t_vec, embeds, tiles2, depths2,
                        cfg.tile_weight, cfg.depth_weight,
                        cfg.guidance_scale, ip_context=ip2,
                        ref_noisy=ref_noisy)
                bw = (1.0 - sa) if cfg.blend_mode == "dynamic" else 0.5
                eps_final = bw * eps_3d + (1 - bw) * eps_unet
                t_prev = int(steps[i + 1]) if i + 1 < len(steps) else -1
                latents, solver_state = S.dpmsolver_step(
                    sch, latents, eps_final, jnp.asarray(int(t)),
                    jnp.asarray(t_prev), solver_state)
                if ref_noisy is not None:
                    # keep the reference rows exactly on-schedule: their
                    # eps is the residual noise of the clean ref latents
                    # (:1452-1456)
                    ref_eps = (ref_noisy - sa * ref_latents) / sn
                    ref_noisy, ref_solver_state = S.dpmsolver_step(
                        sch, ref_noisy, ref_eps, jnp.asarray(int(t)),
                        jnp.asarray(t_prev), ref_solver_state)
            if pt is not None and t is not None:
                pt.tick("denoise_p2+vae_enc+solver", latents,
                        sig=(len(bsel), in_mesh_phase))
            if progress_callback:
                progress_callback(i, len(steps))

        # ---- decimate + texture-only refinement + bake -----------------
        key, kb = jax.random.split(key)
        pt = phase_timer()
        if pt is not None:
            pt.mark()
        out_mesh = self._extract_and_bake(nerf_params, mesh_state, last_mt,
                                          tgt, kb, lpips_params)
        if pt is not None:
            pt.tick("bake", None if out_mesh is None
                    else jnp.asarray(out_mesh.albedo))
        return {"mesh": out_mesh, "nerf_params": nerf_params,
                "mesh_state": mesh_state, "renders": renders}

    # ---------------- helpers -------------------------------------------

    def _render_all(self, nerf_params, mesh_state, last_mt, grid, tgt, rs):
        """Render all bucket views in fixed-size view chunks.

        The view-pruning buckets give render_all a DIFFERENT N per bucket;
        jitting the whole bucket as one program recompiles the renderer at
        every (bucket, rs) pair — measured ~65 s per NeRF-renderer compile,
        which contaminated even the e2e record's per-call "steady" median
        (37 s/call recorded vs 8.8 s true steady at 16x512^2,
        prof_render_all.py). Chunking to `cfg.render_view_chunk` views per
        dispatch makes exactly ONE compiled render program per (mode, rs),
        reused by every bucket; N is padded up to a chunk multiple with
        duplicate views (<= chunk-1 wasted view renders) and the tunnel
        dispatch overhead is ~27 ms per chunk.
        """
        cfg = self.cfg
        N = tgt["poses"].shape[0]
        poses = tgt["poses"]
        intr = tgt["intrinsics"] * (rs / cfg.render_size)
        cv = min(cfg.render_view_chunk or N, N)
        n_pad = (-N) % cv
        if n_pad:
            ids = jnp.concatenate(
                [jnp.arange(N), jnp.zeros((n_pad,), jnp.int32)])
            poses, intr = poses[ids], intr[ids]
        outs = [self._render_chunk(nerf_params, mesh_state, last_mt, grid,
                                   poses[j:j + cv], intr[j:j + cv], rs)
                for j in range(0, N + n_pad, cv)]
        if len(outs) == 1 and not n_pad:
            return outs[0]
        return {k: jnp.concatenate([o[k] for o in outs], axis=0)[:N]
                for k in outs[0]}

    def _render_chunk(self, nerf_params, mesh_state, last_mt, grid,
                      poses, intr, rs):
        cfg = self.cfg
        if mesh_state is None:
            # chunk views in ONE program (lax.map over views — single-view
            # working set, single host dispatch; the tunneled device pays
            # ~27 ms per dispatch, so per-view Python loops cost ~N x 27 ms
            # of pure overhead every timestep)
            render = NF.make_multiview_renderer(
                self._decode_fn, rs, rs, cfg.render, chunk=rs * 128)
            out = render(nerf_params, poses, intr, grid)
            return {"rgb": out["rgb"], "depth": out["depth"],
                    "alpha": out["alpha"][..., None]}
        mt = last_mt
        from ..models.fields import FieldShading
        shading_fun = FieldShading(cfg.ingp)
        rc = self._mesh_raster_cfg(rs)
        # sequential=True: lax.map over views — vmapping all N views
        # multiplies the raster working set N-fold and OOMs at 512^2,
        # while per-view calls pay N host dispatches. Field params ride
        # as the TRACED shading_params arg — the old closure form baked
        # them in as per-program constants (HBM duplicates) and reused
        # stale values on jit cache hits.
        out = render_views(mt["verts"], mt["faces"], mt["face_mask"],
                           poses, intr, rc,
                           shading_fun=shading_fun,
                           shading_params=mesh_state["field"],
                           sequential=True)
        return {"rgb": out["rgb"], "depth": out["depth"],
                "alpha": out["alpha"]}

    def _compact_mesh(self, mt):
        verts = np.asarray(mt["verts"])
        faces = np.asarray(mt["faces"])
        fmask = np.asarray(mt["face_mask"])
        faces = faces[fmask]
        if len(faces) == 0:
            return None, None
        used = np.unique(faces)
        remap = np.full(len(verts), -1, np.int64)
        remap[used] = np.arange(len(used))
        return (verts[used].astype(np.float32),
                remap[faces].astype(np.int32))

    def _extract_and_bake(self, nerf_params, mesh_state, last_mt, tgt, key,
                          lpips_params=None, atlas_size=1024):
        cfg = self.cfg
        if mesh_state is None:
            return None
        verts, faces = self._compact_mesh(last_mt)
        if verts is None:
            # degenerate extraction (e.g. empty density field) — the
            # reference degrades to out_mesh=None (mvedit_3d_pipeline.py:1491)
            return None

        field = mesh_state["field"]
        if cfg.mesh_reduction < 1.0 and len(faces) > 64:
            # quadric decimation + texture-only refinement of the albedo
            # field on the simplified mesh (mvedit_3d_pipeline.py:827-847)
            from ..native import decimate_qem, native_available
            if native_available():
                target = max(int(round(len(faces) * cfg.mesh_reduction)), 16)
                verts_d, faces_d = decimate_qem(verts, faces, target)
                if len(faces_d) >= 16:
                    verts, faces = (verts_d.astype(np.float32),
                                    faces_d.astype(np.int32))
                    mcfg = MF.MeshFitConfig(
                        raster=self._mesh_raster_cfg(cfg.render_size),
                        patch_size=min(cfg.patch_size, cfg.render_size))
                    refine, ropt = MF.make_texture_refine(
                        self._color_fn, mcfg,
                        n_steps=cfg.mesh_simplify_texture_steps,
                        mesh=self.device_mesh)
                    r_state = ropt.init(field)
                    sw = MF.default_mesh_schedule_weights(mcfg)
                    sw = {**sw, "lr": jnp.asarray(cfg.end_lr, jnp.float32),
                          "patch_rgb": jnp.asarray(
                              cfg.end_patch_rgb_weight, jnp.float32)}
                    field, _, _ = refine(
                        field, r_state, jnp.asarray(verts),
                        jnp.asarray(faces), tgt, key, sched=sw,
                        lpips_params=lpips_params)

        mesh = Mesh(v=verts, f=faces)
        mesh.auto_normal()
        mesh.auto_uv()
        # bake the albedo field into the atlas
        acfg = RasterConfig(height=atlas_size, width=atlas_size, tile=16,
                            k_per_tile=64, k_big=32)
        rgb, mask = bake_texture(
            jnp.asarray(mesh.v), jnp.asarray(mesh.f),
            jnp.ones((len(mesh.f),), bool), jnp.asarray(mesh.vt),
            jnp.asarray(mesh.ft),
            FieldColor(cfg.ingp), acfg, field_params=field)
        rgb = edge_dilation(rgb, mask, n_iters=16)
        mesh.albedo = np.asarray(jnp.clip(rgb, 0, 1))
        return mesh
