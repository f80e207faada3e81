#!/usr/bin/env python
"""SSDNeRF training CLI (the reference's train.py / tools/train.py analog).

  python tools/train_ssdnerf.py --config configs/ssdnerf_cars.py \
      --data /path/to/srn_cars --work-dir work_dirs/cars

Single program over the local device mesh (no torch.distributed launcher:
pjit shards the scene batch across devices; multi-host via jax.distributed
when launched on a pod).
"""
import argparse
import importlib.util
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def load_config(path):
    spec = importlib.util.spec_from_file_location("config", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", required=True)
    ap.add_argument("--data", required=True)
    ap.add_argument("--work-dir", default="work_dirs/ssdnerf")
    ap.add_argument("--max-iters", type=int, default=None)
    ap.add_argument("--resume", action="store_true")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--eval-interval", type=int, default=0,
                    help="N>0: log held-out PSNR every N iters "
                         "(GenerativeEvalHook3D role)")
    ap.add_argument("--eval-scenes", type=int, default=4)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax
    from mvedit_tpu.datasets import ShapeNetSRN, ray_batch_iterator
    from mvedit_tpu.models.ssdnerf import (SceneCodeCache,
                                           FileSceneCodeCache,
                                           make_train_step, SSDNeRFConfig)
    from mvedit_tpu.models.triplane import triplane_init
    from mvedit_tpu.models.diffusion import schedulers as S
    from mvedit_tpu.runner.trainer import (Trainer, EmaHook, CheckpointHook,
                                           LogHook, EvalHook)

    cfg_mod = load_config(args.config)
    cfg: SSDNeRFConfig = cfg_mod.ssdnerf_config
    train_cfg = cfg_mod.train_config

    dataset = ShapeNetSRN(args.data,
                          caption_path=getattr(cfg_mod, "captions", None))
    print(f"dataset: {len(dataset)} scenes")
    # stage-2 recipes warm-start from a stage-1 scene-code cache
    # (reference configs/paper_cfgs/stage2_cars_*.py load_cache)
    init_cache = train_cfg.get("init_scene_cache")
    cache_dtype = train_cfg.get("cache_dtype", "float16")
    if train_cfg.get("cache_backend") == "filesystem":
        # reference new_cfgs/*_filesystem.py: per-scene code files +
        # num_file_writers async writers (codes exceed host RAM)
        code_dir = os.path.join(args.work_dir, "code")
        if init_cache or (args.resume and
                          os.path.exists(os.path.join(code_dir,
                                                      "steps.npz"))):
            cache = FileSceneCodeCache.load(
                init_cache or code_dir,
                num_file_writers=train_cfg.get("num_file_writers", 4))
            print(f"loaded filesystem scene-code cache "
                  f"({cache.num_scenes} scenes)")
        else:
            cache = FileSceneCodeCache(
                len(dataset), cfg.latent_shape, code_dir,
                dtype=cache_dtype,
                num_file_writers=train_cfg.get("num_file_writers", 4))
    elif init_cache:
        path = init_cache if os.path.isabs(init_cache) else \
            os.path.join(args.work_dir, init_cache)
        cache = SceneCodeCache.load(path)
        print(f"loaded scene-code cache from {path}")
    else:
        cache = SceneCodeCache(len(dataset), cfg.latent_shape,
                               dtype=cache_dtype)

    key = jax.random.PRNGKey(args.seed)
    schedule = S.sd_schedule(prediction_type="v_prediction")
    # stage-1 auto-decoder recipes (reference MultiSceneNeRF,
    # configs/paper_cfgs/stage1_cars_recons16v.py) train codes+decoder
    # only — no denoiser
    with_diffusion = not train_cfg.get("no_diffusion", False)
    decoder_params = triplane_init(key, cfg.triplane)
    state = {
        "decoder": decoder_params,
        "decoder_opt": optax.adam(cfg.decoder_lr).init(decoder_params),
    }
    if with_diffusion:
        denoiser, denoise_apply, dparams = cfg_mod.build_denoiser(key)
        state["denoiser"] = dparams
        state["denoiser_opt"] = optax.adamw(
            cfg.denoiser_lr, weight_decay=1e-2).init(dparams)
    else:
        denoise_apply = None
    lpips_params = None
    if train_cfg.get("use_lpips"):
        # converted VGG weights land via tools/convert_weights.py; random
        # init keeps the loss path live under zero egress
        from mvedit_tpu.models.losses import lpips_init
        lpips_params = lpips_init(jax.random.PRNGKey(7))
    step_fn = make_train_step(denoise_apply, cfg.triplane, cfg, schedule,
                              with_diffusion=with_diffusion,
                              lpips_params=lpips_params,
                              lpips_weight=train_cfg.get("lpips_weight",
                                                         1.2),
                              patch_size=train_cfg.get("patch_size"))
    start = 0
    if args.resume and os.path.exists(args.work_dir):
        restored, start = CheckpointHook.load(args.work_dir)
        if restored:
            state.update(restored)
            print(f"resumed from step {start}")

    B = train_cfg["batch_size"]
    data = ray_batch_iterator(dataset, B, cfg.n_rays, seed=args.seed,
                              skip_iter=start,
                              num_train_imgs=train_cfg.get(
                                  "num_train_imgs"),
                              patch_size=train_cfg.get("patch_size"))

    # text conditioning (StableSSDNeRF): the config may provide
    # make_cond_fn() -> (captions list -> (B, L, C) embeds)
    cond_fn = getattr(cfg_mod, "make_cond_fn", None)
    cond_fn = cond_fn() if cond_fn else None

    def wrapped_step(state, batch, k):
        ids = batch.pop("scene_ids")
        caps = batch.pop("captions", None)
        if cond_fn is not None and caps is not None:
            batch["cond"] = cond_fn(caps)
        codes, m, v, steps = cache.gather(ids)
        state = dict(state, codes=codes, code_m=m, code_v=v,
                     code_steps=steps)
        state, metrics = step_fn(state, batch, k)
        cache.scatter(ids, state.pop("codes"), state.pop("code_m"),
                      state.pop("code_v"), state.pop("code_steps"))
        return state, metrics

    hooks = [
        *([EmaHook(keys=("denoiser",), interval=1)]
          if with_diffusion else []),
        LogHook(args.work_dir, interval=train_cfg.get("log_interval", 50)),
        CheckpointHook(args.work_dir,
                       interval=train_cfg.get("ckpt_interval", 2000)),
    ]
    if args.eval_interval:
        from mvedit_tpu.models.ssdnerf import tanh_code
        from mvedit_tpu.models.triplane import triplane_point_decode
        from mvedit_tpu.models.volume_renderer import render_rays
        from mvedit_tpu.utils.geometry import get_cam_rays
        from mvedit_tpu.utils.evaluation import eval_psnr

        def eval_fn(state, step):
            psnrs = []
            for i in range(min(args.eval_scenes, len(dataset))):
                scene = dataset[i]
                code = tanh_code(jnp.asarray(cache.get_code(i),
                                             jnp.float32))
                h, w = scene["hw"]
                ro, rd = get_cam_rays(
                    jnp.asarray(scene["poses"][:1]),
                    jnp.asarray(scene["intrinsics"][:1]), h, w)

                def decode(x):
                    s, c2 = triplane_point_decode(
                        state["decoder"], code, x.reshape(-1, 3), None,
                        cfg.triplane)
                    return (s.reshape(x.shape[:-1]),
                            c2.reshape(*x.shape[:-1], 3))

                out = render_rays(decode, ro.reshape(-1, 3),
                                  rd.reshape(-1, 3), cfg.render,
                                  bg_color=1.0)
                img = np.asarray(out["rgb"]).reshape(h, w, 3)
                psnrs.append(float(eval_psnr(
                    img[None], scene["images"][:1])[0]))
            return {"psnr": float(np.mean(psnrs))}

        hooks.append(EvalHook(eval_fn, args.work_dir,
                              interval=args.eval_interval))
    trainer = Trainer(wrapped_step, state, data, hooks, key=key)
    trainer.step = start
    trainer.run(args.max_iters or train_cfg["max_iters"])
    cache.save(os.path.join(args.work_dir, "scene_cache.npz"))
    print("done")


if __name__ == "__main__":
    main()
