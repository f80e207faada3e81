"""Legacy Zero123 novel-view pipeline (input view + relative camera -> image).

TPU-native rebuild of the vendored original Zero123 pipeline
(`lib/pipelines/zero123.py:96-660`), which the reference keeps for
compatibility (not wired into its Web UI — same here; this is a library
pipeline):

- conditioning tokens = Linear([CLIP image embed (768) || camera embed (4)])
  via `CLIPCameraProjection` (:56-94); the camera embed is
  [deg2rad(elev), sin(deg2rad(azim)), cos(deg2rad(azim)), distance]
  (:280-287);
- the input view's *unscaled* VAE mode latent concatenates onto the noisy
  latents channel-wise (8-channel UNet input); the uncond branch gets a
  zero image latent (:414-455 `_get_latent_model_input` — note the
  reference's FIXME: zero123 was trained WITHOUT the VAE scaling factor
  on the image latent, preserved here);
- classifier-free guidance with zeroed conditioning tokens (:297-305).

Everything runs as one jitted CFG denoise step inside a Python scheduler
loop (DDIM), matching this repo's other pipelines.
"""
from dataclasses import dataclass

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..models.diffusion import AttnMode, schedulers as S

__all__ = ["Zero123Config", "Zero123Pipeline", "CLIPCameraProjection",
           "camera_embedding"]


class CLIPCameraProjection(nn.Module):
    """Single linear projection of [clip_embed || camera_embed] back to the
    CLIP width (reference zero123.py:56-94)."""
    embedding_dim: int = 768
    additional_embeddings: int = 4

    @nn.compact
    def __call__(self, embedding):
        return nn.Dense(self.embedding_dim, name="proj")(embedding)


def camera_embedding(elevation_deg, azimuth_deg, distance):
    """(B,) angles in degrees -> (B, 1, 4) camera tokens
    (reference zero123.py:280-287)."""
    el = jnp.deg2rad(jnp.atleast_1d(jnp.asarray(elevation_deg,
                                                jnp.float32)))
    az = jnp.deg2rad(jnp.atleast_1d(jnp.asarray(azimuth_deg, jnp.float32)))
    d = jnp.atleast_1d(jnp.asarray(distance, jnp.float32))
    return jnp.stack([el, jnp.sin(az), jnp.cos(az), d], axis=-1)[:, None, :]


@dataclass(frozen=True)
class Zero123Config:
    num_steps: int = 50
    guidance_scale: float = 3.0
    height: int = 256
    width: int = 256
    eta: float = 0.0


class Zero123Pipeline:
    """models: unet (8-ch in) + unet_params, vae + vae_params,
    vision (CLIPVisionModel w/ projection) + vision_params,
    ccp (CLIPCameraProjection) + ccp_params, schedule (eps-prediction)."""

    def __init__(self, models, cfg: Zero123Config = Zero123Config()):
        self.m = models
        self.cfg = cfg
        self.schedule = models.schedule

    def _encode_image(self, clip_pixels, elevation, azimuth, distance):
        """CLIP-preprocessed pixels (B, 224, 224, 3) + relative camera ->
        (2B, 1, 768) CFG conditioning tokens (uncond = zeros, :297-305)."""
        emb = self.m.vision.apply({"params": self.m.vision_params},
                                  clip_pixels)          # (B, 768)
        cam = camera_embedding(elevation, azimuth, distance)  # (B, 1, 4)
        tok = jnp.concatenate([emb[:, None, :], cam], axis=-1)
        tok = self.m.ccp.apply({"params": self.m.ccp_params}, tok)
        return jnp.concatenate([jnp.zeros_like(tok), tok], axis=0)

    def __call__(self, image, clip_pixels, elevation, azimuth, distance,
                 key, latents=None):
        """image: (1, H, W, 3) in [0, 1] (the input view, VAE-encoded as
        the channel-concat condition); clip_pixels: (1, 224, 224, 3)
        CLIP-normalized. Returns (1, H, W, 3) novel view in [0, 1]."""
        cfg = self.cfg
        sch = self.schedule
        vae = self.m.vae

        # our AutoencoderKL returns *scaled* latents (x scaling_factor);
        # zero123's image-latent condition is the raw distribution mode
        # (reference FIXME at :441), so divide the scaling back out
        vae_enc_mode = jax.jit(lambda p, x: vae.apply(
            {"params": p}, x, method=vae.encode) / vae.cfg.scaling_factor)
        vae_dec = jax.jit(lambda p, z: vae.apply({"params": p}, z,
                                                 method=vae.decode))

        embeds = self._encode_image(clip_pixels, elevation, azimuth,
                                    distance)
        img_lat = vae_enc_mode(self.m.vae_params, image * 2.0 - 1.0)
        img_lat2 = jnp.concatenate([jnp.zeros_like(img_lat), img_lat], 0)

        ds = 2 ** (len(vae.cfg.block_out_channels) - 1)
        if latents is None:
            key, k0 = jax.random.split(key)
            latents = jax.random.normal(
                k0, (1, cfg.height // ds, cfg.width // ds, 4))

        unet = self.m.unet

        @jax.jit
        def denoise(params, latents, t_scalar):
            t2 = jnp.full((2,), t_scalar, jnp.int32)
            lat2 = jnp.concatenate([latents, latents], 0)
            lat_in = jnp.concatenate([lat2, img_lat2], axis=-1)  # 8 ch
            eps = unet.apply({"params": params}, lat_in, t2, embeds,
                             mode=AttnMode())
            eps_u, eps_c = jnp.split(eps, 2, axis=0)
            return eps_u + cfg.guidance_scale * (eps_c - eps_u)

        timesteps = S.make_timesteps(cfg.num_steps, sch.num_train_timesteps,
                                     "leading")
        for i, t in enumerate(timesteps):
            key, kr = jax.random.split(key)
            eps = denoise(self.m.unet_params, latents, int(t))
            t_prev = int(timesteps[i + 1]) if i + 1 < len(timesteps) else -1
            latents = S.ddim_step(sch, latents, eps, jnp.asarray(int(t)),
                                  jnp.asarray(t_prev), eta=cfg.eta, key=kr)

        img = vae_dec(self.m.vae_params, latents)
        return jnp.clip((img + 1) / 2, 0.0, 1.0)
