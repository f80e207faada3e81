"""Training loop + hooks (the mm-runner replacement, idiomatic JAX).

Rebuilds the capabilities of `lib/apis/train.py`, `lib/core/runners.py:125`
(DynamicIterBasedRunnerMod) and the hook zoo (`lib/runner/hooks/`):

- iteration-based loop with per-iter `train_step(state, batch, key)`;
- hooks as plain callbacks: EMA with rampup momentum
  (ExponentialMovingAverageHookMod, ema_hook.py:20), checkpointing (orbax),
  scene-code cache save (SaveCacheHook, cache.py:15), scheduled config
  mutation (ModelUpdaterHook, model_updater.py:6), logging;
- resume restores step, params, optimizer states, and cache.

No DDP wrapper: the train step itself is a pjit program over the device
mesh (data-parallel over the scene batch; the reference's NCCL DDP
all-reduce becomes XLA's gradient psum).
"""
import json
import os
import time
from dataclasses import dataclass, field as dfield
from typing import Callable, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["EmaHook", "CheckpointHook", "LogHook", "ModelUpdaterHook",
           "EvalHook", "Trainer"]


class Hook:
    interval = 1

    def after_iter(self, trainer, metrics):
        pass

    def after_run(self, trainer):
        pass


class EmaHook(Hook):
    """EMA of selected state keys with rampup momentum
    (ema_hook.py:20: momentum ramps from 0 to `momentum` over `rampup`)."""

    def __init__(self, keys=("denoiser", "decoder"), momentum=0.001,
                 rampup=1000, interval=1):
        self.keys = keys
        self.momentum = momentum
        self.rampup = rampup
        self.interval = interval
        self.ema = None

    def after_iter(self, trainer, metrics):
        if trainer.step % self.interval:
            return
        src = {k: trainer.state[k] for k in self.keys}
        if self.ema is None:
            # deep copy: the train step donates its input buffers, so
            # aliasing them here would read deleted arrays next iteration
            self.ema = jax.tree_util.tree_map(
                lambda x: jnp.array(x, copy=True), src)
            return
        # rampup: early steps use a larger update fraction so the EMA tracks
        # the fast-moving young model, settling to `momentum`
        m = max(self.momentum, 1.0 / (1.0 + trainer.step)) if self.rampup \
            and trainer.step < self.rampup else self.momentum
        self.ema = jax.tree_util.tree_map(
            lambda e, s: e * (1 - m) + s * m, self.ema, src)


class CheckpointHook(Hook):
    """Orbax checkpointing of the full train state (+ EMA), trainable-only
    filtering like ckpt_trainable_only (core/runners.py:131-204)."""

    def __init__(self, out_dir, interval=1000, max_keep=3):
        self.out_dir = out_dir
        self.interval = interval
        self.max_keep = max_keep
        os.makedirs(out_dir, exist_ok=True)

    def after_iter(self, trainer, metrics):
        if trainer.step % self.interval:
            return
        self.save(trainer)

    def after_run(self, trainer):
        # always leave a final checkpoint (the reference saves on exit;
        # short runs would otherwise end with no restorable state)
        if trainer.step % self.interval:
            self.save(trainer)

    def save(self, trainer):
        import orbax.checkpoint as ocp
        path = os.path.abspath(
            os.path.join(self.out_dir, f"step_{trainer.step}"))
        ckptr = ocp.StandardCheckpointer()
        ckptr.save(path, jax.tree_util.tree_map(np.asarray, trainer.state),
                   force=True)
        ckptr.wait_until_finished()
        # prune old
        steps = sorted(
            int(d.split("_")[1]) for d in os.listdir(self.out_dir)
            if d.startswith("step_"))
        for s in steps[: -self.max_keep]:
            import shutil
            shutil.rmtree(os.path.join(self.out_dir, f"step_{s}"),
                          ignore_errors=True)

    @staticmethod
    def load(out_dir, step=None):
        import orbax.checkpoint as ocp
        steps = sorted(
            int(d.split("_")[1]) for d in os.listdir(out_dir)
            if d.startswith("step_"))
        if not steps:
            return None, 0
        step = step or steps[-1]
        ckptr = ocp.StandardCheckpointer()
        state = ckptr.restore(
            os.path.abspath(os.path.join(out_dir, f"step_{step}")))
        return state, step


class LogHook(Hook):
    """JSONL metrics log + stdout (TextLogger/TensorBoard replacement)."""

    def __init__(self, out_dir, interval=50):
        self.interval = interval
        os.makedirs(out_dir, exist_ok=True)
        self.path = os.path.join(out_dir, "metrics.jsonl")
        self._t0 = time.time()

    def after_iter(self, trainer, metrics):
        if trainer.step % self.interval and trainer.step != 1:
            return
        row = {"step": trainer.step,
               "time": round(time.time() - self._t0, 2)}
        row.update({k: float(v) for k, v in metrics.items()})
        with open(self.path, "a") as f:
            f.write(json.dumps(row) + "\n")
        print(f"[{trainer.step}] " + " ".join(
            f"{k}={v:.4g}" for k, v in row.items() if k != "step"))


class EvalHook(Hook):
    """Periodic held-out evaluation during SSDNeRF training (the
    reference's GenerativeEvalHook3D role, lib/runner/hooks/: render views
    from the current codes + decoder and log PSNR/SSIM into the metrics
    JSONL).

    eval_fn(state, step) -> dict of scalar metrics; typically closes over
    a scene-code cache + dataset and renders the first K scenes' view 0
    (see tools/train_ssdnerf.py --eval-interval).
    """

    def __init__(self, eval_fn, out_dir, interval=2000):
        self.eval_fn = eval_fn
        self.interval = interval
        os.makedirs(out_dir, exist_ok=True)
        self.path = os.path.join(out_dir, "eval.jsonl")

    def after_iter(self, trainer, metrics):
        if trainer.step % self.interval:
            return
        self._run(trainer)

    def after_run(self, trainer):
        self._run(trainer)

    def _run(self, trainer):
        out = {k: float(v)
               for k, v in self.eval_fn(trainer.state, trainer.step).items()}
        row = {"step": trainer.step, **out}
        with open(self.path, "a") as f:
            f.write(json.dumps(row) + "\n")
        print(f"[eval @{trainer.step}] " + " ".join(
            f"{k}={v:.4g}" for k, v in out.items()))


class ModelUpdaterHook(Hook):
    """Scheduled config/state mutation mid-training (model_updater.py:6;
    e.g. raise ray counts / unfreeze codes at given iters)."""

    def __init__(self, schedule: Dict[int, Callable]):
        self.schedule = dict(schedule)

    def after_iter(self, trainer, metrics):
        fn = self.schedule.pop(trainer.step, None)
        if fn is not None:
            fn(trainer)


class Trainer:
    """Minimal iteration-based trainer."""

    def __init__(self, train_step, state, data_iter, hooks: List[Hook],
                 key=None):
        self.train_step = train_step
        self.state = state
        self.data_iter = data_iter
        self.hooks = hooks
        self.step = 0
        self.key = key if key is not None else jax.random.PRNGKey(0)

    def run(self, max_iters):
        while self.step < max_iters:
            batch = next(self.data_iter)
            self.key, k = jax.random.split(self.key)
            self.state, metrics = self.train_step(self.state, batch, k)
            self.step += 1
            for h in self.hooks:
                h.after_iter(self, metrics)
        for h in self.hooks:
            h.after_run(self)
        return self.state
