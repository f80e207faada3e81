"""Jitted multiview denoise steps (Adapter3DMixin equivalent).

Rebuilds `lib/pipelines/adapter3d_mixin.py:68-317` as compiled functions:

- 1-pass: MultiControlNet(tile, depth, ...) -> UNet, CFG combine
  `gs * cond + (1 - gs) * uncond` (:130-135);
- 2-pass: pass 1 runs the UNet encoder once and the decoder WITHOUT tile
  control (x0 estimation for the 3D fuse), pass 2 re-runs only the DECODER
  with tile(+depth) ControlNet residuals injected (:137-317) — the encoder
  state is reused, saving ~40% of UNet FLOPs;
- reference-view concat: latents of shape (B, 2h, w) are split into
  (ref, target) image pairs that jointly self-attend (num_views=2 trick,
  :86-127); ControlNet only sees the target half and its residuals are
  zero-padded for the reference half.

All functions treat the full CFG batch (2N views) in ONE UNet call with
joint attention over N views — on TPU one big batch beats the reference's
--diff-bs micro-batching loop.
"""
from dataclasses import dataclass
from functools import partial
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from ..models.diffusion import AttnMode
from ..models.diffusion.controlnet import apply_multi_controlnet

__all__ = ["DenoiseModels", "make_noise_pred_1pass", "make_noise_pred_2pass"]


@dataclass(frozen=True)
class DenoiseModels:
    """Static bundle: module defs (not params) + attention options."""
    unet: object
    controlnets: Tuple[object, ...]   # (tile, depth[, extra...]) modules
    num_views: int = 6
    ip_tokens: int = 0
    ip_scale: float = 1.0

    def attn_mode(self, num_views=None):
        return AttnMode(num_views=num_views or self.num_views,
                        ip_tokens=self.ip_tokens, ip_scale=self.ip_scale)


def _cfg_combine(noise_pred, guidance_scale):
    uncond, cond = jnp.split(noise_pred, 2, axis=0)
    return guidance_scale * cond + (1.0 - guidance_scale) * uncond


def make_noise_pred_1pass(models: DenoiseModels):
    """(unet_params, cn_params_list, latents, t, embeds, cond_images,
    cn_scales, gs, ip_context) -> guided noise pred.

    latents: (2N, h, w, 4) CFG batch (uncond first half);
    cond_images: list of (2N, H, W, 3) ControlNet hints; cn_scales scalars.
    """
    @partial(jax.jit, static_argnames=())
    def noise_pred(unet_params, cn_params, latents, t, embeds, cond_images,
                   cn_scales, guidance_scale, ip_context=None):
        mode = models.attn_mode()
        downs, mid = apply_multi_controlnet(
            models.controlnets, cn_params, latents, t, embeds, cond_images,
            cn_scales, mode=AttnMode(), ip_context=None)
        eps = models.unet.apply(
            {"params": unet_params}, latents, t, embeds, mode=mode,
            ip_context=ip_context, down_block_res=downs, mid_block_res=mid)
        return _cfg_combine(eps, guidance_scale)

    return noise_pred


def make_noise_pred_2pass(models: DenoiseModels, use_depth_in_p1=True):
    """Returns (p1, p2).

    p1(unet_params, cn_params, latents, t, embeds, depth_images,
       depth_scale, gs, ip_context) -> (eps_guided, enc_state, p1_residuals)
       — encoder once; decoder with ONLY depth (+extra) control.
    p2(unet_params, cn_params, enc_state, p1_residuals, t, embeds,
       tile_images, depth_images, tile_scale, depth_scale, gs, ip_context)
       -> eps_guided — decoder re-run with tile(+depth) residuals ADDED to
       the p1 residuals (adapter3d_mixin.py:281-299).
    """
    def p1(unet_params, cn_params, latents, t, embeds, depth_images,
           depth_scale, guidance_scale, ip_context=None):
        mode = models.attn_mode()
        if use_depth_in_p1 and len(models.controlnets) > 1 \
                and depth_images is not None:
            downs, mid = apply_multi_controlnet(
                models.controlnets[1:2], cn_params[1:2], latents, t, embeds,
                [depth_images], [depth_scale], mode=AttnMode())
        else:
            downs, mid = None, None
        enc = models.unet.apply({"params": unet_params}, latents, t, embeds,
                                part="enc", mode=mode, ip_context=ip_context)
        eps = models.unet.apply({"params": unet_params}, latents, t, embeds,
                                part="dec", enc_state=enc, mode=mode,
                                ip_context=ip_context,
                                down_block_res=downs, mid_block_res=mid)
        return _cfg_combine(eps, guidance_scale), enc, (downs, mid)

    def p2(unet_params, cn_params, latents, enc_state, p1_residuals, t,
           embeds, tile_images, depth_images, tile_scale, depth_scale,
           guidance_scale, ip_context=None):
        mode = models.attn_mode()
        nets = models.controlnets[:2] if depth_images is not None \
            else models.controlnets[:1]
        params2 = cn_params[:2] if depth_images is not None else cn_params[:1]
        conds = [tile_images] + ([depth_images]
                                 if depth_images is not None else [])
        scales = [tile_scale] + ([depth_scale]
                                 if depth_images is not None else [])
        downs, mid = apply_multi_controlnet(
            nets, params2, latents, t, embeds, conds, scales, mode=AttnMode())
        p1_downs, p1_mid = p1_residuals
        if p1_downs is not None:
            downs = [a + b for a, b in zip(downs, p1_downs)]
            mid = mid + p1_mid
        eps = models.unet.apply({"params": unet_params}, latents, t, embeds,
                                part="dec", enc_state=enc_state, mode=mode,
                                ip_context=ip_context,
                                down_block_res=downs, mid_block_res=mid)
        return _cfg_combine(eps, guidance_scale)

    return jax.jit(p1), jax.jit(p2)
