"""Latent diffusion over triplane codes (SSDNeRF's GaussianDiffusion).

TPU-native rebuild of `lib/models/diffusions/gaussian_diffusion.py:18-346`
(mmgen-style DDPM): beta schedules, q_sample, v-prediction training loss
with timestep-weight rescale (`DDPMMSELossMod`, ddpm_loss.py:56), x0
prediction with CFG and optional gradient guidance, and
`sample_from_noise` driving any of our schedulers (DPM-Solver++/DDIM/Euler
with trailing spacing + Karras sigmas, matching the reference's diffusers
delegation at :285-346).

The denoiser is any flax module `(x, t, cond) -> out` (DenoisingUnet below
or the SD2.1 UNet + LoRA for StableSSDNeRF).
"""
from dataclasses import dataclass
from functools import partial
from typing import Callable, Optional

import jax
import jax.numpy as jnp

from .diffusion import schedulers as S

__all__ = ["GaussianDiffusionConfig", "q_sample", "v_target",
           "training_loss", "sample_from_noise"]


@dataclass(frozen=True)
class GaussianDiffusionConfig:
    num_timesteps: int = 1000
    prediction_type: str = "v_prediction"
    timestep_weight_power: float = 0.5   # p in E[w^p] rescale (ddpm_loss)
    guidance_scale: float = 1.0


def q_sample(schedule: S.NoiseSchedule, x0, noise, t):
    return S.add_noise(schedule, x0, noise, t)


def v_target(schedule: S.NoiseSchedule, x0, noise, t):
    """v = sqrt(acp) eps - sqrt(1-acp) x0."""
    sa, sn = schedule.sqrt_acp(t)
    sa = sa.reshape((-1,) + (1,) * (x0.ndim - 1))
    sn = sn.reshape((-1,) + (1,) * (x0.ndim - 1))
    return sa * noise - sn * x0


def training_loss(schedule, denoise_fn, x0, t, noise, cond=None,
                  cfg: GaussianDiffusionConfig = GaussianDiffusionConfig()):
    """Per-batch v-prediction (or epsilon) MSE with SNR-ish timestep
    weighting (DDPMMSELossMod semantics: weight each timestep's MSE, then
    rescale so weights average to 1)."""
    xt = q_sample(schedule, x0, noise, t)
    out = denoise_fn(xt, t, cond)
    if cfg.prediction_type == "v_prediction":
        target = v_target(schedule, x0, noise, t)
    else:
        target = noise
    mse = jnp.mean((out - target) ** 2, axis=tuple(range(1, x0.ndim)))
    acp = jnp.asarray(schedule.alphas_cumprod, jnp.float32)[t]
    w = (1.0 - acp) ** cfg.timestep_weight_power
    w = w / jnp.clip(jnp.mean(w), 1e-8, None)
    return jnp.mean(mse * w)


def sample_from_noise(schedule, denoise_fn, shape, key, num_steps=50,
                      solver="dpmsolver", cond=None, uncond=None,
                      guidance_scale=1.0, use_karras=False,
                      grad_guide_fn=None, guide_gain=1.0,
                      langevin_steps=0, langevin_delta=0.1,
                      langevin_t_range=(0, None)):
    """Full sampling loop (jit the caller; the loop is a lax.scan over a
    static timestep table). denoise_fn(x, t_vec, cond) -> model out.

    CFG runs the denoiser on a doubled batch when uncond is given.
    grad_guide_fn(x0_pred) -> scalar loss enables gradient guidance
    (`GaussianDiffusion.pred_x_0` grad guidance,
    lib/models/diffusions/gaussian_diffusion.py:192-262 /
    DiffusionNeRF.val_guide diffusion_nerf.py:240-315): at every step the
    x0 estimate takes a gradient-descent correction of the guide loss
    before re-deriving the model output.

    langevin_steps > 0 adds K predictor-corrector Langevin updates before
    each solver step while langevin_t_range[0] < t < langevin_t_range[1]
    (`p_sample_langevin`, gaussian_diffusion.py:263-283):
    x <- x - delta/2 * sigma * eps_hat + sqrt(delta) * sigma * z.
    """
    if use_karras:
        _, ts = S.karras_sigmas(schedule, num_steps)
        timesteps = ts[::-1].copy()
    else:
        timesteps = S.make_timesteps(num_steps, schedule.num_train_timesteps,
                                     "trailing")
    timesteps = jnp.asarray(timesteps, jnp.int32)
    t_prev = jnp.concatenate([timesteps[1:], jnp.asarray([-1], jnp.int32)])
    key, k0 = jax.random.split(key)
    x = jax.random.normal(k0, shape)
    state = S.SolverState.init(shape)
    lg_lo = langevin_t_range[0]
    lg_hi = langevin_t_range[1] if langevin_t_range[1] is not None \
        else schedule.num_train_timesteps - 1

    def model_out(x, t):
        t_vec = jnp.full((shape[0],), t, jnp.int32)
        if uncond is not None and guidance_scale != 1.0:
            x2 = jnp.concatenate([x, x], 0)
            t2 = jnp.concatenate([t_vec, t_vec], 0)
            c2 = jax.tree_util.tree_map(
                lambda u, c: jnp.concatenate([u, c], 0), uncond, cond)
            out = denoise_fn(x2, t2, c2)
            o_u, o_c = jnp.split(out, 2, axis=0)
            return o_u + guidance_scale * (o_c - o_u)
        return denoise_fn(x, t_vec, cond)

    def step(carry, inp):
        x, state = carry
        t, tp, k = inp
        if langevin_steps > 0:
            sa_l, sn_l = schedule.sqrt_acp(t)

            def corr(i, xx):
                o = model_out(xx, t)
                if schedule.prediction_type == "v_prediction":
                    eps = sa_l * o + sn_l * xx
                else:
                    eps = o
                z = jax.random.normal(jax.random.fold_in(k, i), xx.shape)
                return (xx - 0.5 * langevin_delta * sn_l * eps
                        + jnp.sqrt(langevin_delta) * sn_l * z)

            x = jax.lax.cond(
                (t > lg_lo) & (t < lg_hi),
                lambda xx: jax.lax.fori_loop(0, langevin_steps, corr, xx),
                lambda xx: xx, x)
        out = model_out(x, t)
        if grad_guide_fn is not None:
            # x0-space gradient guidance: descend the guide loss on the
            # x0 estimate, then re-derive the model output
            sa, sn = schedule.sqrt_acp(t)
            if schedule.prediction_type == "v_prediction":
                x0 = sa * x - sn * out
            else:
                x0 = (x - sn * out) / sa
            g = jax.grad(lambda z: grad_guide_fn(z))(x0)
            x0 = x0 - guide_gain * g
            if schedule.prediction_type == "v_prediction":
                eps = (x - sa * x0) / jnp.clip(sn, 1e-8, None)
                out = sa * eps - sn * x0
            else:
                out = (x - sa * x0) / jnp.clip(sn, 1e-8, None)
        if solver == "ddim":
            x = S.ddim_step(schedule, x, out, t, tp)
        else:
            x, state = S.dpmsolver_step(schedule, x, out, t, tp, state)
        return (x, state), None

    step_keys = jax.random.split(key, timesteps.shape[0])
    (x, _), _ = jax.lax.scan(step, (x, state),
                             (timesteps, t_prev, step_keys))
    return x
