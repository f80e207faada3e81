"""SSDNeRF: multi-scene triplane NeRF + code diffusion (the trainable stack).

TPU-native rebuild of `lib/models/autoencoders/multiscene_nerf.py:34-268` +
`lib/models/diffusions/../diffusion_nerf.py:23-216`:

- per-scene triplane codes live in a HOST cache (`SceneCodeCache`, fp16 like
  the reference's 16-bit cache configs) with per-scene Adam moments; batches
  are staged to device each step (the reference shards this cache across
  DDP ranks — here the single jit program shards the scene batch over the
  mesh's dp axis instead);
- `make_train_step` builds ONE jitted step doing the reference's
  `train_step` (:196-268): (a) diffusion v-pred loss on (activated) codes ->
  denoiser AdamW update; (b) per-scene code render loss (+ prior grad from
  the diffusion loss) -> code Adam update; (c) decoder render loss ->
  decoder Adam update;
- code activation: `TanhCode` (base_nerf.py:24-76) scale 2: code_activated =
  tanh(code / 2) * 2 .

The renderer is the shared static-shape volume renderer; rays are sampled
on host into static (B, R) buffers.
"""
import os
from dataclasses import dataclass, field
from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np
import optax

from .triplane import TriPlaneConfig, triplane_point_decode
from .volume_renderer import RenderConfig, render_rays
from . import gaussian_diffusion as GD
from .diffusion import schedulers as S

__all__ = ["SSDNeRFConfig", "SceneCodeCache", "FileSceneCodeCache",
           "make_train_step", "tanh_code", "tanh_code_inverse"]


def tanh_code(code, scale=2.0):
    return jnp.tanh(code / scale) * scale


def tanh_code_inverse(act, scale=2.0):
    return jnp.arctanh(jnp.clip(act / scale, -0.999999, 0.999999)) * scale


@dataclass(frozen=True)
class SSDNeRFConfig:
    code_shape: tuple = (3, 16, 80, 80)   # activated feature triplane
    latent_shape: tuple = (3, 12, 40, 40)  # diffusion latent (StableSSDNeRF)
    triplane: TriPlaneConfig = field(default_factory=TriPlaneConfig)
    render: RenderConfig = field(default_factory=lambda: RenderConfig(
        num_samples=96, bound=0.5))
    n_rays: int = 4096
    code_lr: float = 0.04
    decoder_lr: float = 1e-3
    denoiser_lr: float = 1e-4
    diffusion: GD.GaussianDiffusionConfig = field(
        default_factory=GD.GaussianDiffusionConfig)


class SceneCodeCache:
    """Host-side per-scene code + Adam moment cache
    (multiscene_nerf.py:46-194 semantics, fp16 storage)."""

    def __init__(self, num_scenes, code_shape, dtype=np.float16):
        self.codes = np.zeros((num_scenes, *code_shape), dtype)
        self.m = np.zeros_like(self.codes)
        self.v = np.zeros_like(self.codes)
        self.steps = np.zeros((num_scenes,), np.int32)

    def gather(self, ids):
        return (jnp.asarray(self.codes[ids], jnp.float32),
                jnp.asarray(self.m[ids], jnp.float32),
                jnp.asarray(self.v[ids], jnp.float32),
                jnp.asarray(self.steps[ids]))

    def scatter(self, ids, codes, m, v, steps):
        self.codes[ids] = np.asarray(codes, self.codes.dtype)
        self.m[ids] = np.asarray(m, self.m.dtype)
        self.v[ids] = np.asarray(v, self.v.dtype)
        self.steps[ids] = np.asarray(steps)

    def save(self, path):
        np.savez(path, codes=self.codes, m=self.m, v=self.v,
                 steps=self.steps)

    @classmethod
    def load(cls, path):
        d = np.load(path)
        obj = cls.__new__(cls)
        obj.codes, obj.m, obj.v, obj.steps = (
            d["codes"], d["m"], d["v"], d["steps"])
        return obj

    def get_code(self, i):
        return self.codes[i]

    def flush(self):
        pass


class FileSceneCodeCache:
    """Disk-backed per-scene code cache with async file writers.

    The reference's filesystem cache recipe
    (configs/new_cfgs/stage1_cars_recons16v_16bit_filesystem.py:
    `num_file_writers=4`, per-scene code files under `code_dir`, written
    by `multiscene_nerf.py::MultiSceneNeRF.save_cache`) for training sets
    whose scene codes exceed host RAM. API-compatible with
    `SceneCodeCache`: `gather` reads the batch's per-scene ``.npz`` files
    (missing -> zeros), `scatter` writes them back through a
    `num_file_writers`-thread pool (the host overlaps serialization with
    the next device step; a scene's pending write is awaited before any
    re-read, so gather never sees torn state).
    """

    def __init__(self, num_scenes, code_shape, cache_dir,
                 dtype=np.float16, num_file_writers=4):
        import concurrent.futures as cf
        os.makedirs(cache_dir, exist_ok=True)
        self.num_scenes = int(num_scenes)
        self.code_shape = tuple(code_shape)
        self.cache_dir = cache_dir
        self.dtype = np.dtype(dtype)
        self._pool = cf.ThreadPoolExecutor(max_workers=num_file_writers)
        self._pending = {}          # scene id -> in-flight Future
        self.steps = np.zeros((self.num_scenes,), np.int32)

    def _path(self, i):
        return os.path.join(self.cache_dir, f"scene_{int(i):08d}.npz")

    def _wait(self, i):
        fut = self._pending.pop(int(i), None)
        if fut is not None:
            fut.result()

    def _read(self, i):
        self._wait(i)
        p = self._path(i)
        if not os.path.exists(p):
            z = np.zeros(self.code_shape, self.dtype)
            return z, np.zeros_like(z), np.zeros_like(z)
        with np.load(p) as d:
            return d["code"], d["m"], d["v"]

    def get_code(self, i):
        return self._read(i)[0]

    def gather(self, ids):
        rows = [self._read(i) for i in np.asarray(ids).reshape(-1)]
        return (jnp.asarray(np.stack([r[0] for r in rows]), jnp.float32),
                jnp.asarray(np.stack([r[1] for r in rows]), jnp.float32),
                jnp.asarray(np.stack([r[2] for r in rows]), jnp.float32),
                jnp.asarray(self.steps[ids]))

    def scatter(self, ids, codes, m, v, steps):
        codes = np.asarray(codes, self.dtype)
        m = np.asarray(m, self.dtype)
        v = np.asarray(v, self.dtype)
        self.steps[ids] = np.asarray(steps)

        def write(path, c, mm, vv):
            tmp = path + ".tmp"
            with open(tmp, "wb") as f:   # np.savez would append .npz
                np.savez(f, code=c, m=mm, v=vv)
            os.replace(tmp, path)

        for j, i in enumerate(np.asarray(ids).reshape(-1)):
            self._wait(i)
            self._pending[int(i)] = self._pool.submit(
                write, self._path(i), codes[j], m[j], v[j])

    def flush(self):
        for i in list(self._pending):
            self._wait(i)

    def save(self, path=None):
        """Codes already live on disk; just flush writers + dump steps."""
        self.flush()
        np.savez(os.path.join(self.cache_dir, "steps.npz"),
                 steps=self.steps, code_shape=np.asarray(self.code_shape))

    @classmethod
    def load(cls, cache_dir, num_file_writers=4):
        d = np.load(os.path.join(cache_dir, "steps.npz"))
        obj = cls(len(d["steps"]), tuple(d["code_shape"]), cache_dir,
                  num_file_writers=num_file_writers)
        obj.steps = d["steps"].copy()
        return obj


def _code_adam(codes, grads, m, v, steps, lr, b1=0.9, b2=0.99, eps=1e-8):
    """Per-scene Adam on raw codes (batched over scene axis)."""
    steps = steps + 1
    m = b1 * m + (1 - b1) * grads
    v = b2 * v + (1 - b2) * grads ** 2
    t = steps.reshape((-1,) + (1,) * (codes.ndim - 1)).astype(jnp.float32)
    mhat = m / (1 - b1 ** t)
    vhat = v / (1 - b2 ** t)
    codes = codes - lr * mhat / (jnp.sqrt(vhat) + eps)
    return codes, m, v, steps


def make_train_step(denoise_apply: Callable, decoder_cfg: TriPlaneConfig,
                    cfg: SSDNeRFConfig, schedule: S.NoiseSchedule,
                    with_decoder_loss=True, with_diffusion=True,
                    lpips_params=None, lpips_weight=1.2,
                    patch_size=None):
    """Build the jitted SSDNeRF train step.

    denoise_apply(params, x, t, cond) -> model out over the latent shape.
    Returns step(state, batch, key) -> (state, metrics) where
      state = {denoiser, denoiser_opt, decoder, decoder_opt,
               codes, code_m, code_v, code_steps}
      batch = {rays_o (B,R,3), rays_d (B,R,3), rgb (B,R,3), cond (any)}

    with_diffusion=False gives the stage-1 auto-decoder step (reference
    `MultiSceneNeRF`, configs/paper_cfgs/stage1_cars_recons16v.py): render
    loss only, no denoiser in `state`, no prior-grad mixing.
    """
    denoiser_opt = optax.adamw(cfg.denoiser_lr, b1=0.9, b2=0.999,
                               weight_decay=1e-2)
    decoder_opt = optax.adam(cfg.decoder_lr)

    def render_loss(decoder_params, codes_act, batch):
        B, R, _ = batch["rays_o"].shape

        def one_scene(code, ro, rd, rgb):
            def decode(x):
                s, c = triplane_point_decode(
                    decoder_params, code, x.reshape(-1, 3),
                    None, decoder_cfg, density_only=False)
                return (s.reshape(x.shape[:-1]),
                        c.reshape(*x.shape[:-1], 3))
            out = render_rays(decode, ro, rd, cfg.render, bg_color=1.0)
            return jnp.mean(jnp.abs(out["rgb"] - rgb)), out["rgb"]

        losses, rendered = jax.vmap(one_scene)(
            codes_act, batch["rays_o"], batch["rays_d"], batch["rgb"])
        total = jnp.mean(losses)
        if lpips_params is not None and patch_size is not None:
            # rays arrive as contiguous (ps, ps) patches (loader
            # patch_size mode) -> perceptual loss, the StableSSDNeRF
            # LPIPS term (configs/sd/stablessdnerf_cars_lpips.py)
            ps = patch_size
            pr = rendered.reshape(B, ps, ps, 3)
            pt = batch["rgb"].reshape(B, ps, ps, 3)
            from . import losses as L
            total = total + L.lpips_apply(lpips_params, pr, pt) \
                * lpips_weight
        return total

    @partial(jax.jit, donate_argnums=(0,))
    def step(state, batch, key):
        k1, k2 = jax.random.split(key)
        codes = state["codes"]                 # raw latent codes (B, ...)
        B = codes.shape[0]
        metrics = {}

        # --- (a) diffusion loss on codes -> denoiser update -------------
        if with_diffusion:
            t = jax.random.randint(k1, (B,), 0,
                                   schedule.num_train_timesteps)
            noise = jax.random.normal(k2, codes.shape)

            def diff_loss_fn(dparams, codes):
                return GD.training_loss(
                    schedule,
                    lambda x, tt, c: denoise_apply(dparams, x, tt, c),
                    codes, t, noise, cond=batch.get("cond"),
                    cfg=cfg.diffusion)

            (dloss, (dgrads, code_prior_grads)) = (
                lambda l, g: (l, g))(*jax.value_and_grad(
                    diff_loss_fn, argnums=(0, 1))(state["denoiser"], codes))
            updates, dopt = denoiser_opt.update(
                dgrads, state["denoiser_opt"], state["denoiser"])
            state["denoiser"] = optax.apply_updates(state["denoiser"],
                                                    updates)
            state["denoiser_opt"] = dopt
            metrics["loss_diffusion"] = dloss
        else:
            code_prior_grads = jnp.zeros_like(codes)

        # --- (b) render loss -> code + decoder updates ------------------
        if with_decoder_loss:
            def rec_loss_fn(decoder_params, codes):
                codes_act = tanh_code(codes)
                return render_loss(decoder_params, codes_act, batch)

            rloss, (decgrads, cgrads) = jax.value_and_grad(
                rec_loss_fn, argnums=(0, 1))(state["decoder"], codes)
            metrics["loss_render"] = rloss
            updates, decopt = decoder_opt.update(
                decgrads, state["decoder_opt"], state["decoder"])
            state["decoder"] = optax.apply_updates(state["decoder"], updates)
            state["decoder_opt"] = decopt
            # code update mixes render grads with the diffusion prior grad
            # (diffusion_nerf.py prior_grad mixing)
            total_cgrads = cgrads + code_prior_grads
            codes, m, v, steps = _code_adam(
                codes, total_cgrads, state["code_m"], state["code_v"],
                state["code_steps"], cfg.code_lr)
            state.update(codes=codes, code_m=m, code_v=v, code_steps=steps)

        return state, metrics

    return step


def make_render_loss(decoder_cfg: TriPlaneConfig, cfg: SSDNeRFConfig):
    """Per-scene ray render loss over activated triplane codes (shared by
    the train step and the val_guide/val_optim refinement paths)."""
    def render_loss(decoder_params, codes_act, batch):
        def one_scene(code, ro, rd, rgb):
            def decode(x):
                s, c = triplane_point_decode(
                    decoder_params, code, x.reshape(-1, 3),
                    None, decoder_cfg, density_only=False)
                return (s.reshape(x.shape[:-1]),
                        c.reshape(*x.shape[:-1], 3))
            out = render_rays(decode, ro, rd, cfg.render, bg_color=1.0)
            return jnp.mean(jnp.abs(out["rgb"] - rgb))

        losses = jax.vmap(one_scene)(codes_act, batch["rays_o"],
                                     batch["rays_d"], batch["rgb"])
        return jnp.mean(losses)
    return render_loss


def make_val_guide(denoise_apply: Callable, decoder_cfg: TriPlaneConfig,
                   cfg: SSDNeRFConfig, schedule: S.NoiseSchedule,
                   guide_gain=0.5):
    """Guided sampling (DiffusionNeRF.val_guide,
    lib/models/autoencoders/diffusion_nerf.py:240-315): every denoise
    step's x0 estimate takes a render-loss gradient against the cond
    views before the solver update."""
    @partial(jax.jit, static_argnames=("num_steps",))
    def val_guide(dparams, decoder_params, cond_batch, key, num_steps=50):
        render_loss = make_render_loss(decoder_cfg, cfg)

        def guide_loss(code_latent):
            return render_loss(decoder_params, tanh_code(code_latent),
                               cond_batch)

        B = cond_batch["rays_o"].shape[0]
        code = GD.sample_from_noise(
            schedule, lambda x, t, c: denoise_apply(dparams, x, t, c),
            (B, *cfg.latent_shape), key, num_steps=num_steps,
            grad_guide_fn=guide_loss, guide_gain=guide_gain)
        return code
    return val_guide


def make_val_optim(denoise_apply: Callable, decoder_cfg: TriPlaneConfig,
                   cfg: SSDNeRFConfig, schedule: S.NoiseSchedule,
                   n_steps=100, prior_weight=0.0):
    """Post-sampling per-scene code refinement (DiffusionNeRF.val_optim,
    diffusion_nerf.py:317-411): Adam on the raw code against the cond
    views, optionally mixing the diffusion v-pred prior gradient."""
    @partial(jax.jit, donate_argnums=(1,))
    def val_optim(dparams, code, decoder_params, cond_batch, key):
        render_loss = make_render_loss(decoder_cfg, cfg)
        m = jnp.zeros_like(code)
        v = jnp.zeros_like(code)
        steps0 = jnp.zeros((code.shape[0],), jnp.int32)

        def body(carry, k):
            code, m, v, steps = carry

            def loss_fn(c):
                loss = render_loss(decoder_params, tanh_code(c), cond_batch)
                if prior_weight > 0:
                    k1, k2 = jax.random.split(k)
                    t = jax.random.randint(
                        k1, (c.shape[0],), 0, schedule.num_train_timesteps)
                    noise = jax.random.normal(k2, c.shape)
                    loss = loss + prior_weight * GD.training_loss(
                        schedule,
                        lambda x, tt, cc: denoise_apply(dparams, x, tt, cc),
                        c, t, noise, cfg=cfg.diffusion)
                return loss

            loss, grads = jax.value_and_grad(loss_fn)(code)
            code, m, v, steps = _code_adam(code, grads, m, v, steps,
                                           cfg.code_lr)
            return (code, m, v, steps), loss

        keys = jax.random.split(key, n_steps)
        (code, _, _, _), losses = jax.lax.scan(
            body, (code, m, v, steps0), keys)
        return code, losses
    return val_optim
