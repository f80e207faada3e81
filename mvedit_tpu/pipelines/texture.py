"""Re-texturing pipeline: frozen geometry, optimize only the albedo field.

TPU-native rebuild of `MVEditTexturePipeline`
(`lib/pipelines/mvedit_texture_pipeline.py:53-544`): the 3D state is just the
hash-grid *albedo field* rendered through the fixed input mesh. Per timestep
`texture_optim` (:93-172) fits the field to the denoised views with pixel L1
(+ optional LPIPS) weighted by per-view normal-cos maps
(`camera_dense_weighting`, :40-50); final bake writes the UV atlas.

Also covers the texture super-resolution pipeline's core
(`mvedit_texture_superres_pipeline.py`): same machinery at a fixed 6+2-view
rig with the texture optimized only at the final step.
"""
from dataclasses import dataclass, field
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..models.diffusion import schedulers as S
from ..models.fields import INGPConfig, ingp_init, ingp_point_decode
from ..models.mesh import (RasterConfig, render_views, bake_texture, Mesh)
from ..models import losses as L
from ..ops.image import edge_dilation
from ..utils.geometry import normalize_depth

__all__ = ["TextureConfig", "TexturePipeline", "make_texture_fit"]


@dataclass(frozen=True)
class TextureConfig:
    num_views: int = 32
    render_size: int = 512
    diffusion_steps: int = 12
    denoising_strength: float = 0.7
    guidance_scale: float = 7.0
    tile_weight: float = 1.0
    depth_weight: float = 0.5
    n_inverse_steps: int = 48
    views_per_step: int = 4   # random view subset per fit step (render_bs)
    lr: float = 0.01
    # LPIPS weight 0.1 (mvedit_texture_pipeline.py:32, flat schedule);
    # active when models.lpips_params is present
    patch_rgb_weight: float = 0.1
    blend_mode: str = "dynamic"
    # reference-pair conditioning (mvedit_texture_pipeline.py:188)
    use_reference: bool = True
    # extra ControlNets beyond (tile, depth), e.g. instruct-retex ip2p
    # conditioned on the source renders (adapter3d.py:1096-1099 +
    # adapter3d_mixin.py nets[controlnet_skip:] in pass 1)
    extra_control_scale: float = 1.0
    # progressive view pruning (mvedit_texture_pipeline.py:36,358-383:
    # max_num_views ramps start->end with power 2; pruned views zero out
    # of the fit's sampling weights, arrays gather down at static bucket
    # boundaries). 0 = keep the full rig.
    min_num_views: int = 0
    mid_num_views: int = 0
    keep_first_views: int = 0
    # largest view batch per UNet program (the reference's --diff-bs);
    # exact in use_reference mode, and keeps ONE bounded-arena executable
    # across every view-bucket size (see pipelines/denoise.py)
    diff_bs: int = 8
    ingp: INGPConfig = field(default_factory=INGPConfig)
    mode: str = "2-pass"

    def view_buckets(self):
        """Static view-buffer sizes compiled for, descending."""
        b = [self.num_views]
        for v in (self.mid_num_views, self.min_num_views):
            if v and v < b[-1]:
                b.append(v)
        return b


def camera_dense_weighting(normal_maps, poses, alpha):
    """Per-pixel weight = max(cos(normal, view_dir_to_cam), 0) * alpha
    (mvedit_texture_pipeline.py:40-50). normal_maps: (N, H, W, 3) world."""
    cam_dir = poses[:, :3, 3]
    cam_dir = cam_dir / jnp.clip(
        jnp.linalg.norm(cam_dir, axis=-1, keepdims=True), 1e-12, None)
    cosw = jnp.clip(jnp.sum(
        normal_maps * cam_dir[:, None, None, :], axis=-1, keepdims=True),
        0.0, None)
    return cosw * alpha


def make_texture_fit(color_fn, cfg: TextureConfig, n_views=None,
                     lpips_params=None):
    """Jitted albedo-field fit against target views on the FROZEN mesh.

    Returns `fit(params, opt_state, geom, targets, key=None)`. geom:
    per-view render geometry dict with xyz (N,H,W,3), alpha (N,H,W,1),
    weight (N,H,W,1) — rendering the frozen mesh once outside the loop and
    reusing xyz makes each fit step pure field evaluation (big MXU
    matmuls), no rasterization. Views are sampled by `cam_weights` in
    targets (pruned views carry weight 0 and are never drawn), matching
    the reference's weighted view batching."""
    optimizer = optax.adam(cfg.lr, b1=0.9, b2=0.99, eps=1e-15)
    n = n_views or cfg.num_views
    vps = min(cfg.views_per_step, n)
    # bound single-program device runtime: the tunneled device kills
    # long executions (PERF.md "Single-program device runtime is
    # bounded") — the superres 512-step fit as ONE scan program died
    # with a TPU worker crash in the r5 record run. Chain <=64-step
    # programs through donated buffers like the nerf/mesh fits.
    L_PER_PROGRAM = 64

    def loss_fn(params, geom, targets, ids):
        xyz = geom["xyz"][ids]
        alpha = geom["alpha"][ids]
        rgb = color_fn(params, xyz)
        rgb = rgb * alpha + 1.0 * (1 - alpha)
        w = geom["weight"][ids]
        total = L.l1_loss(rgb, targets["images"][ids], weight=w) * 4.5
        if lpips_params is not None and cfg.patch_rgb_weight > 0:
            total = total + L.lpips_apply(
                lpips_params, rgb,
                targets["images"][ids]) * cfg.patch_rgb_weight
        return total

    def _make_program(steps):
        @partial(jax.jit, donate_argnums=(0, 1))
        def fit_l(params, opt_state, geom, targets, key):
            p = targets.get("cam_weights")
            logp = jnp.zeros((n,)) if p is None else \
                jnp.log(jnp.clip((p > 0).astype(jnp.float32), 1e-9, None))

            def step(carry, k):
                params, opt_state = carry
                ids = jax.random.categorical(k, logp[None].repeat(vps, 0))
                loss, grads = jax.value_and_grad(loss_fn)(params, geom,
                                                          targets, ids)
                updates, opt_state = optimizer.update(grads, opt_state,
                                                      params)
                params = optax.apply_updates(params, updates)
                return (params, opt_state), loss

            keys = jax.random.split(key, steps)
            (params, opt_state), losses_hist = jax.lax.scan(
                step, (params, opt_state), keys)
            return params, opt_state, losses_hist

        return fit_l

    Lp = min(L_PER_PROGRAM, cfg.n_inverse_steps)
    fit_l = _make_program(Lp)
    rem = cfg.n_inverse_steps % Lp
    fit_r = _make_program(rem) if rem else None

    def fit(params, opt_state, geom, targets, key=None):
        key = key if key is not None else jax.random.PRNGKey(0)
        hists = []
        for _ in range(cfg.n_inverse_steps // Lp):
            key, kc = jax.random.split(key)
            params, opt_state, h = fit_l(params, opt_state, geom,
                                         targets, kc)
            hists.append(h)
        if fit_r is not None:
            key, kc = jax.random.split(key)
            params, opt_state, h = fit_r(params, opt_state, geom,
                                         targets, kc)
            hists.append(h)
        return params, opt_state, jnp.concatenate(hists)

    return fit, optimizer


class TexturePipeline:
    """Denoise <-> texture_optim alternation on a fixed mesh."""

    def __init__(self, models, cfg: TextureConfig):
        self.m = models
        self.cfg = cfg
        self.schedule = models.schedule

    def _render_geometry(self, mesh: Mesh, poses, intrinsics):
        """Render the frozen mesh once: xyz/alpha/normal per view."""
        rc = RasterConfig(height=self.cfg.render_size,
                          width=self.cfg.render_size)
        out = render_views(
            jnp.asarray(mesh.v), jnp.asarray(mesh.f),
            jnp.ones((len(mesh.f),), bool), poses, intrinsics, rc,
            sequential=True)
        weight = camera_dense_weighting(out["normal"], poses, out["alpha"])
        return {"xyz": out["xyz"], "alpha": out["alpha"],
                "normal": out["normal"], "depth": out["depth"],
                "weight": weight}

    def __call__(self, mesh: Mesh, poses, intrinsics, prompt_embeds,
                 negative_embeds, key, init_albedo_fn=None,
                 cam_weights=None, ip_context=None,
                 extra_control_images=None):
        """cam_weights: optional (N,) per-view loss weights (front-view
        vonmises weighting, adapter3d.py:1143-1150). ip_context: IP-Adapter
        [uncond; cond] tokens (2, T, C), else read from models.ip_context.
        extra_control_images: per-extra-ControlNet (N,H,W,3) hints;
        defaults to the source renders (instruct ip2p)."""
        cfg = self.cfg
        sch = self.schedule
        N = cfg.num_views
        vae = self.m.vae

        from .denoise import (DenoiseModels, make_noise_pred_2pass,
                              make_chunked_noise_pred_2pass,
                              chunk_view_batches)
        # diff_bs bounds the largest image-space program (VAE at 512^2
        # and, in use_reference mode exactly, the UNet passes)
        vae_enc = chunk_view_batches(
            jax.jit(lambda p, x: vae.apply({"params": p}, x,
                                           method=vae.encode)), cfg.diff_bs)
        vae_dec = chunk_view_batches(
            jax.jit(lambda p, z: vae.apply({"params": p}, z,
                                           method=vae.decode)), cfg.diff_bs)
        ip_ctx = ip_context if ip_context is not None else \
            getattr(self.m, "ip_context", None)
        ip2 = None if ip_ctx is None else jnp.concatenate(
            [jnp.repeat(ip_ctx[:1], N, 0),
             jnp.repeat(ip_ctx[1:2], N, 0)], axis=0)
        chunked = cfg.use_reference and 0 < cfg.diff_bs < N
        dm = DenoiseModels(unet=self.m.unet,
                           controlnets=tuple(self.m.controlnets),
                           num_views=N, use_reference=cfg.use_reference,
                           ip_tokens=0 if ip_ctx is None
                           else int(ip_ctx.shape[1]))
        p1, p2 = make_chunked_noise_pred_2pass(dm, cfg.diff_bs) \
            if chunked else make_noise_pred_2pass(dm)

        geom = self._render_geometry(mesh, poses, intrinsics)
        if cam_weights is not None:
            geom["weight"] = geom["weight"] * jnp.asarray(
                cam_weights, jnp.float32)[:, None, None, None]
        ctrl_depths = normalize_depth(
            geom["depth"], geom["alpha"])[..., None].repeat(3, -1)

        key, k0 = jax.random.split(key)
        params = ingp_init(k0, cfg.ingp)
        color_fn = lambda p, x: ingp_point_decode(p, x, cfg.ingp)[1]  # noqa
        lpips_params = getattr(self.m, "lpips_params", None)
        fit, optimizer = make_texture_fit(
            color_fn, cfg, lpips_params=lpips_params)
        opt_state = optimizer.init(params)

        def render_now(params, geom):
            rgb = color_fn(params, geom["xyz"])
            return jnp.clip(
                rgb * geom["alpha"] + (1 - geom["alpha"]), 0, 1)

        # initial target: input mesh albedo rendered, else field init
        timesteps = S.make_timesteps(cfg.diffusion_steps,
                                     sch.num_train_timesteps, "trailing")
        n_keep = int(len(timesteps) * (1 - cfg.denoising_strength))
        timesteps = timesteps[n_keep:]

        init_rgb = render_now(params, geom) if init_albedo_fn is None else \
            init_albedo_fn(geom)
        n_extra = len(self.m.controlnets) - 2
        if n_extra > 0 and extra_control_images is None:
            extra_control_images = [init_rgb] * n_extra
        extras = list(extra_control_images or [])
        lat0 = vae_enc(self.m.vae_params, init_rgb * 2 - 1)
        key, kn, kr = jax.random.split(key, 3)
        # view-shared noise (reference convention)
        noise = jnp.broadcast_to(
            jax.random.normal(kn, lat0.shape[1:]), lat0.shape)
        t0_vec = jnp.full((N,), int(timesteps[0]))
        latents = S.add_noise(sch, lat0, noise, t0_vec)
        solver_state = S.SolverState.init(latents.shape)
        if cfg.use_reference:
            ref_latents = lat0
            ref_noisy = S.add_noise(
                sch, lat0, jnp.broadcast_to(
                    jax.random.normal(kr, lat0.shape[1:]), lat0.shape),
                t0_vec)
            ref_solver = S.SolverState.init(latents.shape)
        else:
            ref_latents = ref_noisy = ref_solver = None
        cam_w = np.ones(N) if cam_weights is None else \
            np.asarray(cam_weights, np.float64)
        alive = np.ones(N, bool)
        buckets = cfg.view_buckets()
        cur_n = N
        keep_n = cfg.keep_first_views
        poses_np = np.asarray(poses)
        targets = {"images": init_rgb,
                   "cam_weights": jnp.asarray(cam_w, jnp.float32)}

        n_steps_total = len(timesteps)
        for i, t in enumerate(timesteps):
            progress = i / max(n_steps_total - 1, 1)
            # --- progressive view pruning (texture schedule: power 2,
            # mvedit_texture_pipeline.py:36,358-383) ---------------------
            if cfg.min_num_views and i > 0:
                from ..ops.rotation import prune_cameras
                target_n = max(int(round(
                    (N - cfg.min_num_views) * (1 - progress) ** 2
                    + cfg.min_num_views)), max(keep_n, 1))
                n_alive = int(alive.sum())
                if target_n < n_alive:
                    alive_ids = np.flatnonzero(alive)
                    kept_local = prune_cameras(
                        poses_np[alive_ids],
                        list(range(min(keep_n, len(alive_ids)))), target_n)
                    kept = set(alive_ids[kept_local].tolist())
                    new_alive = np.array(
                        [j in kept for j in range(cur_n)])
                    if not np.array_equal(new_alive, alive):
                        alive = new_alive
                        targets["cam_weights"] = jnp.asarray(
                            cam_w * alive, jnp.float32)
                n_alive = int(alive.sum())
                for b in buckets:
                    if b < cur_n and n_alive <= b:
                        ids = np.flatnonzero(alive)[:b]
                        if len(ids) < b:   # pad with alive dupes
                            ids = np.concatenate(
                                [ids, np.repeat(ids[-1:], b - len(ids))])
                        jids = jnp.asarray(ids)
                        geom = {k: v[jids] for k, v in geom.items()}
                        ctrl_depths = ctrl_depths[jids]
                        latents = latents[jids]
                        solver_state = solver_state._replace(
                            prev_x0=solver_state.prev_x0[jids])
                        if ref_noisy is not None:
                            ref_latents = ref_latents[jids]
                            ref_noisy = ref_noisy[jids]
                            ref_solver = ref_solver._replace(
                                prev_x0=ref_solver.prev_x0[jids])
                        prompt_embeds = prompt_embeds[jids]
                        negative_embeds = negative_embeds[jids]
                        extras = [e[jids] for e in extras]
                        targets["images"] = targets["images"][jids]
                        poses_np = poses_np[ids]
                        cam_w = cam_w[ids]
                        alive = alive[ids]
                        cur_n = b
                        targets["cam_weights"] = jnp.asarray(
                            cam_w * alive, jnp.float32)
                        # evict the superseded-size executables (loaded
                        # TPU programs reserve their HBM arenas); chunked
                        # denoise fns are bucket-size independent (plain
                        # wrappers, no clear_cache) and are kept
                        for fn in (p1, p2, fit):
                            if hasattr(fn, "clear_cache"):
                                fn.clear_cache()
                        if not chunked:
                            dm = DenoiseModels(
                                unet=self.m.unet,
                                controlnets=tuple(self.m.controlnets),
                                num_views=b,
                                use_reference=cfg.use_reference,
                                ip_tokens=0 if ip_ctx is None
                                else int(ip_ctx.shape[1]))
                            p1, p2 = make_noise_pred_2pass(dm)
                        fit, _ = make_texture_fit(
                            color_fn, cfg, n_views=b,
                            lpips_params=lpips_params)
                        if ip_ctx is not None:
                            ip2 = jnp.concatenate(
                                [jnp.repeat(ip_ctx[:1], b, 0),
                                 jnp.repeat(ip_ctx[1:2], b, 0)], axis=0)
                        break

            t_vec = jnp.full((2 * cur_n,), int(t), jnp.int32)
            lat2 = jnp.concatenate([latents, latents], 0)
            embeds = jnp.concatenate([negative_embeds, prompt_embeds], 0)
            depths2 = jnp.concatenate([ctrl_depths, ctrl_depths], 0)
            extras2 = tuple(jnp.concatenate([e, e], 0) for e in extras)
            eps, enc_state, p1_res = p1(
                self.m.unet_params, self.m.cn_params, lat2, t_vec, embeds,
                depths2, cfg.depth_weight, cfg.guidance_scale,
                ip_context=ip2, extra_images=extras2,
                extra_scales=(cfg.extra_control_scale,) * len(extras2),
                ref_noisy=ref_noisy)
            sa, sn = sch.sqrt_acp(jnp.asarray(int(t)))
            x0_lat = (latents - sn * eps) / sa
            targets["images"] = jnp.clip(
                (vae_dec(self.m.vae_params, x0_lat) + 1) / 2, 0, 1)

            params, opt_state, _ = fit(params, opt_state, geom, targets)
            renders = render_now(params, geom)

            tiles2 = jnp.concatenate([renders, renders], 0)
            eps_unet = p2(self.m.unet_params, self.m.cn_params, lat2,
                          enc_state, p1_res, t_vec, embeds, tiles2, depths2,
                          cfg.tile_weight, cfg.depth_weight,
                          cfg.guidance_scale, ip_context=ip2,
                          ref_noisy=ref_noisy)
            lat_3d = vae_enc(self.m.vae_params, renders * 2 - 1)
            eps_3d = (latents - sa * lat_3d) / sn
            bw = (1.0 - sa) if cfg.blend_mode == "dynamic" else 0.5
            eps_final = bw * eps_3d + (1 - bw) * eps_unet
            t_prev = int(timesteps[i + 1]) if i + 1 < len(timesteps) else -1
            latents, solver_state = S.dpmsolver_step(
                sch, latents, eps_final, jnp.asarray(int(t)),
                jnp.asarray(t_prev), solver_state)
            if ref_noisy is not None:
                ref_eps = (ref_noisy - sa * ref_latents) / sn
                ref_noisy, ref_solver = S.dpmsolver_step(
                    sch, ref_noisy, ref_eps, jnp.asarray(int(t)),
                    jnp.asarray(t_prev), ref_solver)

        # bake
        out_mesh = Mesh(v=mesh.v.copy(), f=mesh.f.copy(), vn=mesh.vn,
                        fn=mesh.fn, vt=mesh.vt, ft=mesh.ft)
        if out_mesh.vt is None:
            out_mesh.auto_uv()
        acfg = RasterConfig(height=1024, width=1024, tile=16,
                            k_per_tile=64, k_big=32)
        from ..models.fields import FieldColor
        rgb, mask = bake_texture(
            jnp.asarray(out_mesh.v), jnp.asarray(out_mesh.f),
            jnp.ones((len(out_mesh.f),), bool), jnp.asarray(out_mesh.vt),
            jnp.asarray(out_mesh.ft),
            FieldColor(cfg.ingp), acfg, field_params=params)
        rgb = edge_dilation(rgb, mask, n_iters=16)
        out_mesh.albedo = np.asarray(jnp.clip(rgb, 0, 1))
        return {"mesh": out_mesh, "field_params": params,
                "renders": render_now(params, geom)}
