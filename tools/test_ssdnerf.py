#!/usr/bin/env python
"""SSDNeRF evaluation CLI (tools/test.py analog): renders held-out views
from cached scene codes and reports PSNR/SSIM; optional FID/KID when an
inception feature file is provided."""
import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", required=True)
    ap.add_argument("--data", required=True)
    ap.add_argument("--work-dir", required=True)
    ap.add_argument("--num-scenes", type=int, default=8)
    ap.add_argument("--recons-views", type=int, default=None,
                    help="N>0: ignore cached codes and reconstruct each "
                         "scene's code from its first N views via "
                         "val_optim (the reference's reconsNv eval, "
                         "configs/paper_cfgs/multiview_recons/); default "
                         "from the config's train_config['recons_views']")
    ap.add_argument("--recons-steps", type=int, default=100)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from tools.train_ssdnerf import load_config
    from mvedit_tpu.datasets import ShapeNetSRN
    from mvedit_tpu.models.ssdnerf import SceneCodeCache, tanh_code
    from mvedit_tpu.models.triplane import triplane_point_decode
    from mvedit_tpu.models.volume_renderer import render_rays
    from mvedit_tpu.utils.geometry import get_cam_rays
    from mvedit_tpu.utils.evaluation import eval_psnr, eval_ssim
    from mvedit_tpu.runner.trainer import CheckpointHook

    cfg_mod = load_config(args.config)
    cfg = cfg_mod.ssdnerf_config
    dataset = ShapeNetSRN(args.data)
    state, step = CheckpointHook.load(args.work_dir)
    recons_views = args.recons_views
    if recons_views is None:
        recons_views = cfg_mod.train_config.get("recons_views", 0)
    cache = None
    if not recons_views:
        npz = os.path.join(args.work_dir, "scene_cache.npz")
        if os.path.exists(npz):
            cache = SceneCodeCache.load(npz)
        else:  # filesystem cache backend (configs/*_filesystem.py)
            from mvedit_tpu.models.ssdnerf import FileSceneCodeCache
            cache = FileSceneCodeCache.load(
                os.path.join(args.work_dir, "code"))
    print(f"eval at step {step}"
          + (f", {recons_views}-view reconstruction" if recons_views
             else ", cached codes"))

    val_optim = None
    if recons_views:
        from mvedit_tpu.models.ssdnerf import make_val_optim
        from mvedit_tpu.models.diffusion import schedulers as S
        schedule = S.sd_schedule(prediction_type="v_prediction")
        denoise_apply = None
        if "denoiser" in state and hasattr(cfg_mod, "build_denoiser"):
            _, denoise_apply, _ = cfg_mod.build_denoiser(
                jax.random.PRNGKey(0))
        val_optim = make_val_optim(
            denoise_apply, cfg.triplane, cfg, schedule,
            n_steps=args.recons_steps,
            prior_weight=0.0 if denoise_apply is None else 1e-4)

    psnrs, ssims = [], []
    for i in range(min(args.num_scenes, len(dataset))):
        scene = dataset[i]
        h, w = scene["hw"]
        if recons_views:
            # condition on the first N views; evaluate the next view
            k = min(recons_views, len(scene["poses"]) - 1)
            cro, crd = get_cam_rays(jnp.asarray(scene["poses"][:k]),
                                    jnp.asarray(scene["intrinsics"][:k]),
                                    h, w)
            cond = {
                "rays_o": cro.reshape(1, -1, 3),
                "rays_d": crd.reshape(1, -1, 3),
                "rgb": jnp.asarray(
                    scene["images"][:k]).reshape(1, -1, 3),
            }
            code_raw, _ = val_optim(
                state.get("denoiser"),
                jnp.zeros((1, *cfg.latent_shape)), state["decoder"],
                cond, jax.random.PRNGKey(i))
            code = tanh_code(code_raw)[0]
            eval_idx = k
        else:
            code = tanh_code(jnp.asarray(cache.get_code(i), jnp.float32))
            eval_idx = 0
        pose = jnp.asarray(scene["poses"][eval_idx:eval_idx + 1])
        intr = jnp.asarray(scene["intrinsics"][eval_idx:eval_idx + 1])
        ro, rd = get_cam_rays(pose, intr, h, w)

        def decode(x):
            s, c = triplane_point_decode(
                state["decoder"], code, x.reshape(-1, 3), None,
                cfg.triplane)
            return s.reshape(x.shape[:-1]), c.reshape(*x.shape[:-1], 3)

        out = render_rays(decode, ro.reshape(-1, 3), rd.reshape(-1, 3),
                          cfg.render, bg_color=1.0)
        img = np.asarray(out["rgb"]).reshape(h, w, 3)
        gt = scene["images"][eval_idx]
        psnrs.append(float(eval_psnr(img[None], gt[None])[0]))
        ssims.append(eval_ssim(img, gt))
    print(f"PSNR {np.mean(psnrs):.2f}  SSIM {np.mean(ssims):.4f} "
          f"over {len(psnrs)} scenes")


if __name__ == "__main__":
    main()
