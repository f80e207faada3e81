"""Zero123++ pipeline: single image -> 6 novel views (3x2 grid, 960x640).

TPU-native rebuild of the vendored Zero123++ pipeline
(`lib/pipelines/zero123plus.py:271-453`):

- reference-only attention: the conditioning image's noisy latent runs
  through the UNet in 'write' mode, storing every self-attention input; the
  target (6-view grid) pass runs in 'read' mode with those states
  concatenated onto K/V (:43-156 RefOnlyNoisedUNet; here AttnMode.reference
  on our UNet);
- CLIP-vision global embedding scaled by per-token `ramping_coefficients`
  and added to the encoded prompt (:385-415);
- the Zero123++ latent/image space rescalings (:158-176):
  lat' = (lat - 0.22) * 0.75, img' = img * 0.5 / 0.8;
- optional normal ControlNet (DepthControlUNet, :178) via cn_params;
- `shift_views` latent roll for the v1.2 camera rig (:330).

Camera rigs (azimuths/elevations of the 6 views) live in apis/cameras.py,
copied from `lib/apis/adapter3d.py:795-797,887-889`.
"""
from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp

from ..models.diffusion import AttnMode, schedulers as S

__all__ = ["Zero123PlusConfig", "Zero123PlusPipeline",
           "scale_latents", "unscale_latents", "scale_image",
           "unscale_image"]


def scale_latents(latents):
    return (latents - 0.22) * 0.75


def unscale_latents(latents):
    return latents / 0.75 + 0.22


def scale_image(image):
    return image * 0.5 / 0.8


def unscale_image(image):
    return image / 0.5 * 0.8


@dataclass(frozen=True)
class Zero123PlusConfig:
    num_steps: int = 40
    guidance_scale: float = 4.0
    grid_hw: tuple = (960, 640)      # 3x2 grid of 320x320 views
    cond_scale: float = 1.0
    shift_views: bool = False        # v1.2 latent roll
    # the reference samples Zero123++ with EulerAncestralDiscreteScheduler
    # (adapter3d.py:387-389); 'dpmsolver' kept as a faster 2nd-order option
    sampler: str = "euler_ancestral"


class Zero123PlusPipeline:
    """models: unet, unet_params, vae, vae_params, vision (CLIPVisionModel),
    vision_params, ramping (T,) coefficients, schedule (v-prediction),
    text_uncond (1, L, C) encoded empty prompt, optional controlnet/cn_params
    (normal ControlNet)."""

    def __init__(self, models, cfg: Zero123PlusConfig):
        self.m = models
        self.cfg = cfg
        self.schedule = models.schedule

    def _encode_condition(self, cond_image):
        """cond_image: (1, H, W, 3) in [0,1] CLIP-normalized outside.
        Returns prompt embeds (1, L, C) with ramped global image embed."""
        global_embed = self.m.vision.apply(
            {"params": self.m.vision_params}, cond_image)  # (1, proj)
        text = self.m.text_uncond  # (1, L, C)
        ramp = jnp.asarray(self.m.ramping)[None, :, None]  # (1, L, 1)
        return text + global_embed[:, None, :] * ramp

    def __call__(self, cond_image, key, cond_latent=None, normal_cond=None):
        """cond_image: (1, Hc, Wc, 3) in [0, 1] (CLIP-preprocessed for the
        vision tower separately as cond_pixels_clip in models).
        Returns (1, H, W, 3) decoded 6-view grid in [0, 1]."""
        cfg = self.cfg
        sch = self.schedule
        vae = self.m.vae
        H, W = cfg.grid_hw

        vae_enc = jax.jit(lambda p, x: vae.apply({"params": p}, x,
                                                 method=vae.encode))
        vae_dec = jax.jit(lambda p, z: vae.apply({"params": p}, z,
                                                 method=vae.decode))

        prompt = self._encode_condition(
            self.m.cond_pixels_clip if hasattr(self.m, "cond_pixels_clip")
            else cond_image)
        uncond = self.m.text_uncond
        embeds = jnp.concatenate([uncond, prompt], axis=0)  # (2, L, C)

        # conditioning latent (the reference VAE-encodes the scaled image)
        if cond_latent is None:
            cond_latent = vae_enc(self.m.vae_params,
                                  scale_image(cond_image * 2 - 1))

        timesteps = S.make_timesteps(cfg.num_steps, sch.num_train_timesteps,
                                     "trailing")
        key, k0 = jax.random.split(key)
        ds = 2 ** (len(vae.cfg.block_out_channels) - 1)
        latents = jax.random.normal(k0, (1, H // ds, W // ds, 4))

        unet = self.m.unet

        @jax.jit
        def denoise(params, latents, t_scalar, key):
            t2 = jnp.full((2,), t_scalar, jnp.int32)
            lat2 = jnp.concatenate([latents, latents], 0)
            # reference pass: add noise at t to the cond latent (the
            # RefOnlyNoisedUNet noises the cond latent with the SAME t)
            noise = jax.random.normal(key, cond_latent.shape)
            ref_lat = S.add_noise(sch, jnp.concatenate(
                [cond_latent, cond_latent], 0), jnp.concatenate(
                [noise, noise], 0), t2)
            _, ref_writes = unet.apply(
                {"params": params}, ref_lat, t2, embeds,
                mode=AttnMode(reference="write"))
            flat = [w[0] for w in ref_writes if w is not None]
            down_res = mid_res = None
            if normal_cond is not None and getattr(self.m, "controlnet",
                                                   None) is not None:
                nc2 = jnp.concatenate([normal_cond, normal_cond], 0)
                down_res, mid_res = self.m.controlnet.apply(
                    {"params": self.m.cn_params}, lat2, t2, embeds, nc2,
                    conditioning_scale=cfg.cond_scale)
            out = unet.apply(
                {"params": params}, lat2, t2, embeds,
                mode=AttnMode(reference="read"), ref_kv=flat,
                down_block_res=down_res, mid_block_res=mid_res)
            uncond_out, cond_out = jnp.split(out, 2, axis=0)
            return uncond_out + cfg.guidance_scale * (cond_out - uncond_out)

        solver_state = S.SolverState.init(latents.shape)
        for i, t in enumerate(timesteps):
            key, kr, ks = jax.random.split(key, 3)
            model_out = denoise(self.m.unet_params, latents, int(t), kr)
            t_prev = int(timesteps[i + 1]) if i + 1 < len(timesteps) else -1
            if cfg.sampler == "euler_ancestral":
                latents = S.euler_ancestral_step(
                    sch, latents, model_out, jnp.asarray(int(t)),
                    jnp.asarray(t_prev), ks)
            else:
                latents, solver_state = S.dpmsolver_step(
                    sch, latents, model_out, jnp.asarray(int(t)),
                    jnp.asarray(t_prev), solver_state)

        latents = unscale_latents(latents)
        if cfg.shift_views:
            # v1.2: roll the 3x2 grid latents by half a tile (:330)
            latents = jnp.roll(latents, shift=latents.shape[2] // 4,
                               axis=2)
        img = vae_dec(self.m.vae_params, latents)
        img = unscale_image(img)
        return jnp.clip((img + 1) / 2, 0.0, 1.0)
