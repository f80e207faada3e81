"""Texture super-resolution pipeline.

Rebuilds `MVEditTextureSuperResPipeline`
(`lib/pipelines/mvedit_texture_superres_pipeline.py:30-496`): img2img over
6 fixed surround views + 2 polar regularization poses at 512^2 with
tile+depth ControlNet (optionally IP-Adapter per-view conditioning,
:62-87); the albedo field is optimized ONLY at the final denoise step
(:397-405), then baked at 2048^2 and blended with the original albedo using
UV-space camera weights (:458-480).
"""
from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np

from ..models.diffusion import schedulers as S
from ..models.fields import INGPConfig, ingp_init, ingp_point_decode
from ..models.mesh import (RasterConfig, render_views, bake_texture,
                           camera_weights_uv, Mesh)
from ..ops.image import edge_dilation
from ..utils.geometry import normalize_depth
from .texture import TextureConfig, make_texture_fit, camera_dense_weighting

__all__ = ["SuperResConfig", "TextureSuperResPipeline"]


@dataclass(frozen=True)
class SuperResConfig:
    num_views: int = 8              # 6 surround + 2 regularization
    render_size: int = 512
    atlas_size: int = 2048
    diffusion_steps: int = 24
    denoising_strength: float = 0.4
    guidance_scale: float = 7.0
    tile_weight: float = 1.0
    depth_weight: float = 0.5
    n_inverse_steps: int = 512
    lr: float = 0.01
    blend_original_weight: float = 0.5
    ingp: INGPConfig = field(default_factory=INGPConfig)


class TextureSuperResPipeline:
    """models: unet/unet_params, controlnets/cn_params, vae/vae_params,
    schedule (same bundle as TexturePipeline)."""

    def __init__(self, models, cfg: SuperResConfig):
        self.m = models
        self.cfg = cfg

    def __call__(self, mesh: Mesh, poses, intrinsics, prompt_embeds,
                 negative_embeds, key, init_renders=None,
                 init_field_params=None):
        """init_field_params: live albedo-field params handed over from a
        preceding 3D/texture stage (the reference's `ingp_states` pass-
        through, adapter3d.py:848-857,1038-1044) — the fit warm-starts
        from them and, absent explicit init_renders, the initial views are
        rendered from the field instead of the baked atlas (no GLB/UV
        round-trip)."""
        cfg = self.cfg
        sch = self.m.schedule
        N = cfg.num_views
        vae = self.m.vae
        vae_enc = jax.jit(lambda p, x: vae.apply({"params": p}, x,
                                                 method=vae.encode))
        vae_dec = jax.jit(lambda p, z: vae.apply({"params": p}, z,
                                                 method=vae.decode))
        from .denoise import DenoiseModels, make_noise_pred_2pass
        # IP-Adapter image-prompt tokens (ref conditions superres on the
        # input renders, mvedit_texture_superres_pipeline.py:62-87)
        ip_ctx = getattr(self.m, "ip_context", None)
        dm = DenoiseModels(unet=self.m.unet,
                           controlnets=tuple(self.m.controlnets),
                           num_views=N,
                           ip_tokens=0 if ip_ctx is None
                           else int(ip_ctx.shape[1]))
        p1, p2 = make_noise_pred_2pass(dm)

        # frozen-mesh view geometry
        rc = RasterConfig(height=cfg.render_size, width=cfg.render_size)
        geo = render_views(
            jnp.asarray(mesh.v), jnp.asarray(mesh.f),
            jnp.ones((len(mesh.f),), bool), poses, intrinsics, rc)
        weight = camera_dense_weighting(geo["normal"], poses, geo["alpha"])
        geom = {"xyz": geo["xyz"], "alpha": geo["alpha"], "weight": weight}
        ctrl_depths = normalize_depth(
            geo["depth"], geo["alpha"])[..., None].repeat(3, -1)

        # init renders: explicit > live field (chained stage) > baked atlas
        if init_renders is None and init_field_params is not None:
            rgb = ingp_point_decode(init_field_params, geo["xyz"],
                                    cfg.ingp)[1]
            init_renders = jnp.clip(
                rgb * geo["alpha"] + (1 - geo["alpha"]), 0, 1)
        if init_renders is None:
            from ..models.mesh.texture import _sample_level
            uv_img = render_views(
                jnp.asarray(mesh.v), jnp.asarray(mesh.f),
                jnp.ones((len(mesh.f),), bool), poses, intrinsics, rc,
                vert_attrs={"uv": jnp.asarray(mesh.vt)}
                if mesh.vt is not None and len(mesh.vt) == len(mesh.v)
                else None)
            if mesh.albedo is not None and "uv" in uv_img:
                tex = jnp.asarray(mesh.albedo)
                rgb = _sample_level(tex, uv_img["uv"])
                init_renders = jnp.clip(
                    rgb * geo["alpha"] + (1 - geo["alpha"]), 0, 1)
            else:
                init_renders = jnp.ones(
                    (N, cfg.render_size, cfg.render_size, 3))

        # per-view image prompting: each view's own init render is its
        # IP-Adapter prompt (ref get_prompt_embeds ipa_images=in_images,
        # mvedit_texture_superres_pipeline.py:74-76); falls back to the
        # shared [uncond; cond] context when no encoder hook is installed
        ip_encode_fn = getattr(self.m, "ip_encode_fn", None)
        if ip_ctx is not None and ip_encode_fn is not None:
            ip2 = ip_encode_fn(init_renders)             # (2N, T, C)
        elif ip_ctx is not None:
            ip2 = jnp.concatenate(
                [jnp.repeat(ip_ctx[:1], N, 0),
                 jnp.repeat(ip_ctx[1:2], N, 0)], axis=0)
        else:
            ip2 = None

        from ..utils.profiling import phase_timer
        pt = phase_timer()
        if pt is not None:
            pt.mark()
        timesteps = S.make_timesteps(cfg.diffusion_steps,
                                     sch.num_train_timesteps, "trailing")
        n_keep = int(len(timesteps) * (1 - cfg.denoising_strength))
        timesteps = timesteps[n_keep:]
        lat0 = vae_enc(self.m.vae_params, init_renders * 2 - 1)
        key, kn = jax.random.split(key)
        latents = S.add_noise(sch, lat0,
                              jax.random.normal(kn, lat0.shape),
                              jnp.full((N,), int(timesteps[0])))
        solver_state = S.SolverState.init(latents.shape)
        ctrl_images = init_renders

        for i, t in enumerate(timesteps):
            t_vec = jnp.full((2 * N,), int(t), jnp.int32)
            lat2 = jnp.concatenate([latents, latents], 0)
            embeds = jnp.concatenate([negative_embeds, prompt_embeds], 0)
            depths2 = jnp.concatenate([ctrl_depths, ctrl_depths], 0)
            eps, enc_state, p1_res = p1(
                self.m.unet_params, self.m.cn_params, lat2, t_vec, embeds,
                depths2, cfg.depth_weight, cfg.guidance_scale,
                ip_context=ip2)
            sa, sn = sch.sqrt_acp(jnp.asarray(int(t)))
            x0_lat = (latents - sn * eps) / sa
            decoded = jnp.clip(
                (vae_dec(self.m.vae_params, x0_lat) + 1) / 2, 0, 1)
            tiles2 = jnp.concatenate([decoded, decoded], 0)
            eps_unet = p2(self.m.unet_params, self.m.cn_params, lat2,
                          enc_state, p1_res, t_vec, embeds, tiles2, depths2,
                          cfg.tile_weight, cfg.depth_weight,
                          cfg.guidance_scale, ip_context=ip2)
            t_prev = int(timesteps[i + 1]) if i + 1 < len(timesteps) else -1
            latents, solver_state = S.dpmsolver_step(
                sch, latents, eps_unet, jnp.asarray(int(t)),
                jnp.asarray(t_prev), solver_state)
            if pt is not None:
                pt.tick("superres_denoise", latents, sig=0)

        final_views = jnp.clip(
            (vae_dec(self.m.vae_params, latents) + 1) / 2, 0, 1)

        # texture optimized only at the final step (:397-405)
        tcfg = TextureConfig(num_views=N, render_size=cfg.render_size,
                             n_inverse_steps=cfg.n_inverse_steps,
                             lr=cfg.lr, ingp=cfg.ingp)
        key, k0 = jax.random.split(key)
        params = (init_field_params if init_field_params is not None
                  else ingp_init(k0, cfg.ingp))
        color_fn = lambda p, x: ingp_point_decode(p, x, cfg.ingp)[1]  # noqa
        fit, optimizer = make_texture_fit(
            color_fn, tcfg,
            lpips_params=getattr(self.m, "lpips_params", None))
        opt_state = optimizer.init(params)
        params, opt_state, _ = fit(params, opt_state, geom,
                                   {"images": final_views})
        if pt is not None:
            pt.tick("superres_tex_fit", params)

        # bake at atlas_size + blend with original using UV cam weights
        out_mesh = Mesh(v=mesh.v.copy(), f=mesh.f.copy(), vn=mesh.vn,
                        fn=mesh.fn, vt=mesh.vt, ft=mesh.ft)
        if out_mesh.vt is None:
            out_mesh.auto_uv()
        acfg = RasterConfig(height=cfg.atlas_size, width=cfg.atlas_size,
                            tile=32, k_per_tile=64, k_big=32)
        from ..models.fields import FieldColor
        rgb, mask = bake_texture(
            jnp.asarray(out_mesh.v), jnp.asarray(out_mesh.f),
            jnp.ones((len(out_mesh.f),), bool), jnp.asarray(out_mesh.vt),
            jnp.asarray(out_mesh.ft),
            FieldColor(cfg.ingp), acfg, field_params=params)
        rgb = edge_dilation(rgb, mask, n_iters=8)
        if pt is not None:
            pt.tick("superres_bake", rgb)
        new_albedo = np.asarray(jnp.clip(rgb, 0, 1))
        if mesh.albedo is not None \
                and mesh.albedo.shape == new_albedo.shape:
            w = cfg.blend_original_weight
            new_albedo = new_albedo * (1 - w) + mesh.albedo * w
        out_mesh.albedo = new_albedo
        return {"mesh": out_mesh, "renders": final_views,
                "field_params": params}
