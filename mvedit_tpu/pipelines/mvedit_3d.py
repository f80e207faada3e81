"""MVEdit 3D pipeline: the denoise <-> reconstruct alternation (the product).

TPU-native rebuild of `MVEdit3DPipeline.__call__`
(`lib/pipelines/mvedit_3d_pipeline.py:875-1499`). Control flow (SURVEY §3.1):

  for t in [None] + timesteps:
    P1 denoise (2-pass mode: encoder once, decoder w/o tile control)
    x0 = (x_t - sqrt(1-acp) eps) / sqrt(acp) -> VAE decode -> target views
    3D fuse: progress <= switch -> NeRF inner loop; after -> DMTet inner loop
    re-render all views -> ControlNet tile/depth inputs
    P2 denoise: decoder re-run with tile+depth residuals
    eps_3d from VAE-encoded renders; blend with eps_unet by
      blend_weight = 1 - sqrt(acp_t)  ('dynamic', :1438-1479)
    scheduler.step
  bake albedo field -> UV atlas -> Mesh

TPU design decisions (SURVEY §7.6):
- the view axis is padded to a fixed max; camera pruning flips weights to 0
  instead of shrinking tensors (one compiled program per phase);
- each phase (denoise step, fit loop, render-all-views, VAE enc/dec) is one
  jitted function reused across timesteps;
- the NeRF->DMTet switch is a compile boundary (two fit programs);
- progress-scheduled scalars (lr, loss weights) are passed as traced scalars
  so they do not retrigger compilation.

Schedules ported from the reference: max_num_views(progress) (:45-49),
render size ramp 128->256->512 (:52-58), lr(progress) (:60-63).
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
from ..models.fields import INGPConfig, ingp_init, ingp_point_decode
from ..models.volume_renderer import RenderConfig, OccupancyGrid
from ..models import nerf_fit as NF
from ..models import mesh_fit as MF
from ..models.mesh import (RasterConfig, build_grid_tets, render_views,
                           bake_texture, Mesh)
from ..ops.image import edge_dilation
from ..utils.geometry import normalize_depth

__all__ = ["MVEdit3DConfig", "MVEdit3DPipeline"]


def _ingp_decode(params, xyz, ingp_cfg):
    """Module-level decode fn (stable identity for jit caches)."""
    return ingp_point_decode(params, xyz, ingp_cfg)


def _ingp_color(params, xyz, ingp_cfg):
    return ingp_point_decode(params, xyz, ingp_cfg)[1]


class _FieldShading:
    """Hashable shading callback: equality by config so jitted renderers
    cache across timesteps while params update by closure."""

    def __init__(self, params, ingp_cfg):
        self.params = params
        self.ingp_cfg = ingp_cfg

    def __call__(self, xyz, normal, view_dir):
        return ingp_point_decode(self.params, xyz, self.ingp_cfg)[1]

    def __hash__(self):
        return hash(self.ingp_cfg)

    def __eq__(self, other):
        return isinstance(other, _FieldShading) \
            and other.ingp_cfg == self.ingp_cfg


def default_max_num_views(progress, start=32, end=9, power=3.0):
    """View-count schedule (mvedit_3d_pipeline.py:45-49)."""
    return int(round(start + (end - start) * (progress ** power)))


def default_lr(progress, start=0.01, end=0.005):
    """lr schedule (mvedit_3d_pipeline.py:60-63)."""
    return start + (end - start) * progress


@dataclass(frozen=True)
class MVEdit3DConfig:
    num_views: int = 32              # padded max (keep_views + surround)
    render_size: int = 512
    latent_size: int = 64
    diffusion_steps: int = 24
    denoising_strength: float = 1.0
    guidance_scale: float = 7.0
    tile_weight: float = 1.0
    depth_weight: float = 0.5
    nerf_switch_progress: float = 0.6   # NeRF -> DMTet (:899)
    init_inverse_steps: int = 640
    n_inverse_steps: int = 80
    tet_resolution: int = 64
    patch_size: int = 128
    patch_bs: int = 1
    blend_mode: str = "dynamic"      # blend_weight = 1 - sqrt(acp)
    ingp: INGPConfig = field(default_factory=INGPConfig)
    render: RenderConfig = field(default_factory=RenderConfig)
    mode: str = "2-pass"


class MVEdit3DPipeline:
    """Orchestrates jitted phases from Python (one iteration per timestep).

    Construction wants a `models` namespace holding module defs + params:
      unet, unet_params, controlnets (tile, depth), cn_params, vae,
      vae_params, schedule (NoiseSchedule); optionally segment_fn.
    """

    def __init__(self, models, cfg: MVEdit3DConfig):
        self.m = models
        self.cfg = cfg
        self.schedule = models.schedule
        self._jit_cache = {}
        # stable function objects: a fresh lambda per call would defeat the
        # jit caches of the renderers/fitters (recompile every timestep)
        self._decode_fn = partial(_ingp_decode, ingp_cfg=cfg.ingp)
        self._density_fn_builder = None

    # ---------------- jitted phases -------------------------------------

    def _vae_decode(self):
        vae = self.m.vae

        @jax.jit
        def dec(params, lat):
            return vae.apply({"params": params}, lat, method=vae.decode)
        return dec

    def _vae_encode(self):
        vae = self.m.vae

        @jax.jit
        def enc(params, img):
            return vae.apply({"params": params}, img, method=vae.encode)
        return enc

    def _denoise(self):
        from .denoise import DenoiseModels, make_noise_pred_1pass, \
            make_noise_pred_2pass
        dm = DenoiseModels(unet=self.m.unet,
                           controlnets=tuple(self.m.controlnets),
                           num_views=self.cfg.num_views)
        if self.cfg.mode == "1-pass":
            return make_noise_pred_1pass(dm), None
        return make_noise_pred_2pass(dm)

    # ---------------- main ----------------------------------------------

    def __call__(self, targets, key, prompt_embeds, negative_embeds,
                 init_latents=None, progress_callback=None,
                 init_field_params=None):
        """Run the full loop.

        targets: dict with images (N,H,W,3), masks (N,H,W,1),
            poses (N,3,4), intrinsics (N,4), cam_weights (N,),
            cam_lights (N,3) — N == cfg.num_views (padded; weight 0 =
            pruned/padding).
        prompt_embeds/negative_embeds: (N, L, C) per-view text embeddings.
        Returns dict with mesh (Mesh), field params, renders.
        """
        cfg = self.cfg
        sch = self.schedule
        N = cfg.num_views

        vae_dec = self._vae_decode()
        vae_enc = self._vae_encode()
        p1, p2 = self._denoise() if cfg.mode == "2-pass" else (None, None)

        # --- init NeRF state -------------------------------------------
        key, k0 = jax.random.split(key)
        nerf_params = (init_field_params if init_field_params is not None
                       else ingp_init(k0, cfg.ingp))
        grid = OccupancyGrid.create(cfg.render.grid_size)

        decode_fn = self._decode_fn
        fit_cfg = NF.NerfFitConfig(
            render=cfg.render, patch_size=cfg.patch_size,
            patch_bs=cfg.patch_bs, n_steps=cfg.n_inverse_steps)
        init_fit_cfg = NF.NerfFitConfig(
            render=cfg.render, patch_size=cfg.patch_size,
            patch_bs=cfg.patch_bs, n_steps=cfg.init_inverse_steps)
        fit, optimizer = NF.make_nerf_fit(decode_fn, fit_cfg, cfg.render_size)
        init_fit, _ = NF.make_nerf_fit(decode_fn, init_fit_cfg,
                                       cfg.render_size)
        opt_state = optimizer.init(nerf_params)

        # --- init loop state -------------------------------------------
        timesteps = S.make_timesteps(cfg.diffusion_steps,
                                     sch.num_train_timesteps, "trailing")
        n_keep = int(len(timesteps) * (1 - cfg.denoising_strength))
        timesteps = timesteps[n_keep:]

        key, k1, k2 = jax.random.split(key, 3)
        if init_latents is None:
            lat0 = vae_enc(self.m.vae_params,
                           targets["images"] * 2.0 - 1.0)
        else:
            lat0 = init_latents
        noise = jax.random.normal(k1, lat0.shape)
        latents = S.add_noise(sch, lat0, noise,
                              jnp.full((N,), int(timesteps[0])))

        mesh_state = None
        mesh_fit_fns = None
        solver_state = S.SolverState.init(latents.shape)
        tgt = dict(targets)

        steps = [None] + list(timesteps)
        for i, t in enumerate(steps):
            progress = i / max(len(steps) - 1, 1)
            in_mesh_phase = progress > cfg.nerf_switch_progress

            if t is not None:
                # ---- P1 denoise + x0 decode ----
                t_vec = jnp.full((2 * N,), int(t), jnp.int32)
                cfg_lat = jnp.concatenate([latents, latents], axis=0)
                embeds = jnp.concatenate([negative_embeds, prompt_embeds], 0)
                ctrl_depths2 = jnp.concatenate(
                    [self._ctrl_depths, self._ctrl_depths], axis=0) \
                    if hasattr(self, "_ctrl_depths") else None
                eps, enc_state, p1_res = p1(
                    self.m.unet_params, self.m.cn_params, cfg_lat, t_vec,
                    embeds, ctrl_depths2, cfg.depth_weight,
                    cfg.guidance_scale)
                sa, sn = sch.sqrt_acp(jnp.asarray(int(t)))
                x0_lat = (latents - sn * eps) / sa
                dec_imgs = (vae_dec(self.m.vae_params, x0_lat) + 1) / 2
                tgt["images"] = jnp.clip(dec_imgs, 0.0, 1.0)
                if getattr(self.m, "segment_fn", None) is not None:
                    tgt["masks"] = self.m.segment_fn(tgt["images"])

            # ---- 3D fuse ----
            key, kf = jax.random.split(key)
            if not in_mesh_phase:
                use_fit = init_fit if t is None else fit
                nerf_params, opt_state, grid, _ = use_fit(
                    nerf_params, opt_state, grid, tgt, kf)
            else:
                if mesh_state is None:
                    if os.environ.get("MVEDIT_DEBUG_MEM"):
                        stats = jax.local_devices()[0].memory_stats() or {}
                        print("[mem@mesh-switch]",
                              {k: round(v / 2**30, 2)
                               for k, v in stats.items()
                               if "bytes_in_use" in k or "limit" in k},
                              flush=True)
                    # free the NeRF-phase optimizer state before building
                    # the mesh phase (hundreds of MB of Adam moments)
                    del opt_state
                    tet_grid = build_grid_tets(cfg.tet_resolution)
                    sdf0 = MF.init_sdf_from_density(
                        lambda x: decode_fn(nerf_params, x)[0], tet_grid)
                    mesh_state = {
                        "field": nerf_params,
                        "sdf": sdf0,
                        "deform": jnp.zeros((len(tet_grid.verts), 3)),
                    }
                    mcfg = MF.MeshFitConfig(
                        raster=RasterConfig(
                            height=cfg.render_size, width=cfg.render_size,
                            # DMTet soups are many small tris: tight span,
                            # deep per-tile budget
                            span=2,
                            k_per_tile=768 if cfg.render_size >= 256
                            else 256),
                        n_steps=cfg.n_inverse_steps)
                    mesh_fit_fns = MF.make_mesh_fit(
                        tet_grid,
                        partial(_ingp_color, ingp_cfg=cfg.ingp), mcfg)
                    mesh_opt_state = mesh_fit_fns[1].init(mesh_state)
                mfit, _, _ = mesh_fit_fns
                mesh_state, mesh_opt_state, fit_out = mfit(
                    mesh_state, mesh_opt_state, tgt, kf)
                self._last_mt = fit_out["mt"]

            # ---- re-render all views -> ctrl inputs + eps_3d ----
            renders = self._render_all(nerf_params, mesh_state,
                                       mesh_fit_fns, grid, tgt)
            self._ctrl_depths = normalize_depth(
                renders["depth"], renders["alpha"])[..., None].repeat(3, -1)

            if t is not None:
                ctrl_images = renders["rgb"]
                cfg_lat2 = jnp.concatenate([latents, latents], axis=0)
                tiles2 = jnp.concatenate([ctrl_images, ctrl_images], 0)
                depths2 = jnp.concatenate(
                    [self._ctrl_depths, self._ctrl_depths], 0)
                eps_unet = p2(
                    self.m.unet_params, self.m.cn_params, cfg_lat2,
                    enc_state, p1_res, t_vec, embeds, tiles2, depths2,
                    cfg.tile_weight, cfg.depth_weight, cfg.guidance_scale)
                # eps from the reconstructed views
                lat_3d = vae_enc(self.m.vae_params,
                                 renders["rgb"] * 2 - 1)
                eps_3d = (latents - sa * lat_3d) / sn
                bw = (1.0 - sa) if cfg.blend_mode == "dynamic" else 0.5
                eps_final = bw * eps_3d + (1 - bw) * eps_unet
                t_prev = int(steps[i + 1]) if i + 1 < len(steps) else -1
                latents, solver_state = S.dpmsolver_step(
                    sch, latents, eps_final, jnp.asarray(int(t)),
                    jnp.asarray(t_prev), solver_state)
            if progress_callback:
                progress_callback(i, len(steps))

        # ---- bake -----------------------------------------------------
        out_mesh = self._extract_and_bake(nerf_params, mesh_state,
                                          mesh_fit_fns)
        return {"mesh": out_mesh, "nerf_params": nerf_params,
                "mesh_state": mesh_state, "renders": renders}

    # ---------------- helpers -------------------------------------------

    def _render_all(self, nerf_params, mesh_state, mesh_fit_fns, grid, tgt):
        cfg = self.cfg
        if mesh_state is None:
            render = NF.make_image_renderer(
                self._decode_fn,
                cfg.render_size, cfg.render_size, cfg.render,
                chunk=cfg.render_size * 128)
            outs = [render(nerf_params, tgt["poses"][i],
                           tgt["intrinsics"][i], grid)
                    for i in range(cfg.num_views)]
            return {
                "rgb": jnp.stack([o["rgb"] for o in outs]),
                "depth": jnp.stack([o["depth"] for o in outs]),
                "alpha": jnp.stack([o["alpha"] for o in outs])[..., None],
            }
        mt = getattr(self, "_last_mt", None)
        if mt is None:
            _, _, extract = mesh_fit_fns
            mt = extract(mesh_state)
        shading_fun = _FieldShading(mesh_state["field"], cfg.ingp)

        rc = RasterConfig(height=cfg.render_size, width=cfg.render_size,
                          span=2,
                          k_per_tile=768 if cfg.render_size >= 256 else 256)
        # one view per call: vmapping all N views multiplies the raster
        # working set N-fold and OOMs at 512^2
        outs = [render_views(mt["verts"], mt["faces"], mt["face_mask"],
                             tgt["poses"][i:i + 1],
                             tgt["intrinsics"][i:i + 1], rc,
                             shading_fun=shading_fun)
                for i in range(cfg.num_views)]
        return {"rgb": jnp.concatenate([o["rgb"] for o in outs]),
                "depth": jnp.concatenate([o["depth"] for o in outs]),
                "alpha": jnp.concatenate([o["alpha"] for o in outs])}

    def _extract_and_bake(self, nerf_params, mesh_state, mesh_fit_fns,
                          atlas_size=1024):
        cfg = self.cfg
        if mesh_state is None:
            return None
        mt = getattr(self, "_last_mt", None)
        if mt is None:
            _, _, extract = mesh_fit_fns
            mt = extract(mesh_state)
        verts = np.asarray(mt["verts"])
        faces = np.asarray(mt["faces"])
        fmask = np.asarray(mt["face_mask"])
        faces = faces[fmask]
        if len(faces) == 0:
            # degenerate extraction (e.g. empty density field) — the
            # reference degrades to out_mesh=None (mvedit_3d_pipeline.py:1491)
            return None
        # compact vertices
        used = np.unique(faces)
        remap = np.full(len(verts), -1, np.int64)
        remap[used] = np.arange(len(used))
        mesh = Mesh(v=verts[used].astype(np.float32),
                    f=remap[faces].astype(np.int32))
        mesh.auto_normal()
        mesh.auto_uv()
        # bake the albedo field into the atlas
        acfg = RasterConfig(height=atlas_size, width=atlas_size, tile=16,
                            k_per_tile=64, k_big=32)
        rgb, mask = bake_texture(
            jnp.asarray(mesh.v), jnp.asarray(mesh.f),
            jnp.ones((len(mesh.f),), bool), jnp.asarray(mesh.vt),
            jnp.asarray(mesh.ft),
            partial(_ingp_color, mesh_state["field"],
                    ingp_cfg=cfg.ingp), acfg)
        rgb = edge_dilation(rgb, mask, n_iters=16)
        mesh.albedo = np.asarray(jnp.clip(rgb, 0, 1))
        return mesh
