"""Diffusion noise schedules and samplers (functional, jit-friendly).

Rebuilds the scheduler surface the reference uses through diffusers
(`lib/apis/adapter3d.py:278-304` scheduler factory with the '...Karras'
suffix convention, timestep_spacing='trailing'; `lib/models/diffusions/
gaussian_diffusion.py:285-346` sample_from_noise): DDIM, Euler-ancestral and
DPM-Solver++(2M), over the SD scaled-linear beta schedule, with optional
Karras sigma respacing.

Everything is a pure function of a `ScheduleState` pytree -> safe inside jit
and lax loops; per-step state (e.g. DPM-Solver's previous model output) is
carried explicitly, sized statically.
"""
import math
from dataclasses import dataclass
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["NoiseSchedule", "sd_schedule", "make_timesteps", "karras_sigmas",
           "ddim_step", "euler_ancestral_step", "dpmsolver_step",
           "add_noise", "get_noise_scales", "SolverState"]


@dataclass(frozen=True)
class NoiseSchedule:
    num_train_timesteps: int = 1000
    alphas_cumprod: np.ndarray = None  # (T,) float64 numpy (host constants)
    prediction_type: str = "epsilon"   # or "v_prediction"

    def sqrt_acp(self, t):
        acp = jnp.asarray(self.alphas_cumprod, jnp.float32)
        return jnp.sqrt(acp[t]), jnp.sqrt(1.0 - acp[t])


def sd_schedule(beta_start=0.00085, beta_end=0.012, num_train_timesteps=1000,
                prediction_type="epsilon"):
    """SD 'scaled_linear' schedule (betas linear in sqrt space)."""
    betas = np.linspace(beta_start ** 0.5, beta_end ** 0.5,
                        num_train_timesteps, dtype=np.float64) ** 2
    alphas_cumprod = np.cumprod(1.0 - betas)
    return NoiseSchedule(num_train_timesteps, alphas_cumprod, prediction_type)


def make_timesteps(num_inference_steps, num_train_timesteps=1000,
                   spacing="trailing"):
    """Discrete timesteps, descending. The reference forces
    timestep_spacing='trailing' (adapter3d.py:295)."""
    if spacing == "trailing":
        step = num_train_timesteps / num_inference_steps
        ts = np.round(np.arange(num_train_timesteps, 0, -step)).astype(np.int64) - 1
    elif spacing == "leading":
        step = num_train_timesteps // num_inference_steps
        ts = (np.arange(0, num_inference_steps) * step)[::-1].copy()
    else:  # linspace
        ts = np.linspace(0, num_train_timesteps - 1,
                         num_inference_steps).round()[::-1].astype(np.int64)
    return np.ascontiguousarray(ts)


def _t_to_sigma(schedule: NoiseSchedule, ts):
    acp = schedule.alphas_cumprod[ts]
    return np.sqrt((1 - acp) / acp)


def karras_sigmas(schedule: NoiseSchedule, num_inference_steps, rho=7.0):
    """Karras et al. sigma spacing over the schedule's sigma range, mapped
    back to nearest discrete timesteps (diffusers use_karras_sigmas)."""
    sig = _t_to_sigma(schedule,
                      np.arange(schedule.num_train_timesteps))
    sigma_min, sigma_max = sig[0], sig[-1]
    ramp = np.linspace(0, 1, num_inference_steps)
    inv_rho = 1.0 / rho
    sigmas = (sigma_max ** inv_rho
              + ramp * (sigma_min ** inv_rho - sigma_max ** inv_rho)) ** rho
    # map to timesteps by log-sigma interpolation
    log_all = np.log(sig)
    ts = np.interp(np.log(sigmas), log_all, np.arange(len(log_all)))
    return sigmas, np.round(ts).astype(np.int64)[::-1].copy()[::-1]


def add_noise(schedule: NoiseSchedule, x0, noise, t):
    sa, sn = schedule.sqrt_acp(t)
    sa = sa.reshape((-1,) + (1,) * (x0.ndim - 1))
    sn = sn.reshape((-1,) + (1,) * (x0.ndim - 1))
    return sa * x0 + sn * noise


def get_noise_scales(schedule: NoiseSchedule, t_float):
    """(sqrt_acp, sqrt_1macp) at fractional timestep, linear-interpolated —
    the reference's `core/diffusion.get_noise_scales` used for epsilon
    blending (mvedit_3d_pipeline.py:1438-1479)."""
    acp = jnp.asarray(schedule.alphas_cumprod, jnp.float32)
    t0 = jnp.clip(jnp.floor(t_float).astype(jnp.int32), 0,
                  schedule.num_train_timesteps - 1)
    t1 = jnp.clip(t0 + 1, 0, schedule.num_train_timesteps - 1)
    w = jnp.clip(t_float - t0, 0.0, 1.0)
    a = acp[t0] * (1 - w) + acp[t1] * w
    return jnp.sqrt(a), jnp.sqrt(1.0 - a)


def pred_x0(schedule: NoiseSchedule, sample, model_out, t):
    """x0 estimate from model output under the schedule's prediction type."""
    sa, sn = schedule.sqrt_acp(t)
    if schedule.prediction_type == "epsilon":
        return (sample - sn * model_out) / sa
    elif schedule.prediction_type == "v_prediction":
        return sa * sample - sn * model_out
    raise ValueError(schedule.prediction_type)


def pred_eps(schedule: NoiseSchedule, sample, model_out, t):
    sa, sn = schedule.sqrt_acp(t)
    if schedule.prediction_type == "epsilon":
        return model_out
    elif schedule.prediction_type == "v_prediction":
        return sn * sample + sa * model_out
    raise ValueError(schedule.prediction_type)


class SolverState(NamedTuple):
    """Carry for multistep solvers (DPM-Solver++ 2M keeps the previous x0
    estimate and its lambda)."""
    prev_x0: jnp.ndarray
    prev_lambda: jnp.ndarray  # scalar
    has_prev: jnp.ndarray     # bool scalar

    @classmethod
    def init(cls, shape, dtype=jnp.float32):
        return cls(prev_x0=jnp.zeros(shape, dtype),
                   prev_lambda=jnp.zeros(()),
                   has_prev=jnp.array(False))


def ddim_step(schedule, sample, model_out, t, t_prev, eta=0.0, key=None):
    x0 = pred_x0(schedule, sample, model_out, t)
    eps = pred_eps(schedule, sample, model_out, t)
    acp = jnp.asarray(schedule.alphas_cumprod, jnp.float32)
    a_prev = jnp.where(t_prev >= 0, acp[jnp.maximum(t_prev, 0)], 1.0)
    sa_p = jnp.sqrt(a_prev)
    var = 0.0
    if eta > 0 and key is not None:
        a_t = acp[t]
        var = eta ** 2 * (1 - a_prev) / (1 - a_t) * (1 - a_t / a_prev)
    sn_p = jnp.sqrt(jnp.clip(1.0 - a_prev - var, 0.0, None))
    prev = sa_p * x0 + sn_p * eps
    if eta > 0 and key is not None:
        prev = prev + jnp.sqrt(var) * jax.random.normal(key, sample.shape)
    return prev


def euler_ancestral_step(schedule, sample, model_out, t, t_prev, key):
    """Euler-ancestral in sigma space (diffusers EulerAncestralDiscrete)."""
    acp = jnp.asarray(schedule.alphas_cumprod, jnp.float32)
    sig = jnp.sqrt((1 - acp) / acp)
    s_t = sig[t]
    s_prev = jnp.where(t_prev >= 0, sig[jnp.maximum(t_prev, 0)], 0.0)
    x0 = pred_x0(schedule, sample, model_out, t)
    # to sigma-space sample: x_sigma = sample / sqrt(acp)
    x_sig = sample / jnp.sqrt(acp[t])
    sigma_up = jnp.sqrt(jnp.clip(
        s_prev ** 2 * (s_t ** 2 - s_prev ** 2) / jnp.clip(s_t ** 2, 1e-12, None),
        0.0, None))
    sigma_down = jnp.sqrt(jnp.clip(s_prev ** 2 - sigma_up ** 2, 0.0, None))
    d = (x_sig - x0) / jnp.clip(s_t, 1e-12, None)
    x_sig = x_sig + d * (sigma_down - s_t)
    x_sig = x_sig + jax.random.normal(key, sample.shape) * sigma_up
    # back to acp-scaled space at t_prev
    a_prev = jnp.where(t_prev >= 0, acp[jnp.maximum(t_prev, 0)], 1.0)
    return x_sig * jnp.sqrt(a_prev)


def dpmsolver_step(schedule, sample, model_out, t, t_prev, state: SolverState):
    """DPM-Solver++(2M) multistep (diffusers DPMSolverMultistepScheduler,
    algorithm_type='dpmsolver++', solver_order=2). Returns (prev_sample,
    state).

    With alpha=sqrt(acp), sigma=sqrt(1-acp), lambda=log(alpha/sigma):
      1st order: x_p = (sig_p/sig_t) x - alpha_p (e^{-h} - 1) x0
      2nd order adds -0.5 alpha_p (e^{-h}-1) D1, D1 = (x0 - x0_prev)/r0,
      r0 = h_prev / h.
    """
    acp = jnp.asarray(schedule.alphas_cumprod, jnp.float32)
    a_t = acp[t]
    a_p = jnp.where(t_prev >= 0, acp[jnp.maximum(t_prev, 0)],
                    jnp.asarray(1.0 - 1e-7))
    alpha_t, sig_t = jnp.sqrt(a_t), jnp.sqrt(1.0 - a_t)
    alpha_p, sig_p = jnp.sqrt(a_p), jnp.sqrt(jnp.clip(1.0 - a_p, 1e-12, None))
    lam_t = jnp.log(alpha_t / sig_t)
    lam_p = jnp.log(alpha_p / sig_p)
    h = lam_p - lam_t
    x0 = pred_x0(schedule, sample, model_out, t)

    first = (sig_p / sig_t) * sample - alpha_p * (jnp.exp(-h) - 1.0) * x0
    h_prev = lam_t - state.prev_lambda
    r0 = h_prev / jnp.where(jnp.abs(h) < 1e-12, 1e-12, h)
    d1 = (x0 - state.prev_x0) / jnp.where(jnp.abs(r0) < 1e-12, 1e-12, r0)
    second = first - 0.5 * alpha_p * (jnp.exp(-h) - 1.0) * d1
    out = jnp.where(state.has_prev, second, first)
    new_state = SolverState(prev_x0=x0, prev_lambda=lam_t,
                            has_prev=jnp.array(True))
    return out, new_state
