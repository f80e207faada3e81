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
    cache = SceneCodeCache.load(
        os.path.join(args.work_dir, "scene_cache.npz"))
    print(f"eval at step {step}")

    psnrs, ssims = [], []
    for i in range(min(args.num_scenes, len(dataset))):
        scene = dataset[i]
        code = tanh_code(jnp.asarray(cache.codes[i], jnp.float32))
        h, w = scene["hw"]
        pose = jnp.asarray(scene["poses"][:1])
        intr = jnp.asarray(scene["intrinsics"][:1])
        ro, rd = get_cam_rays(pose, intr, h, w)

        def decode(x):
            s, c = triplane_point_decode(
                state["decoder"], code, x.reshape(-1, 3), None,
                cfg.triplane)
            return s.reshape(x.shape[:-1]), c.reshape(*x.shape[:-1], 3)

        out = render_rays(decode, ro.reshape(-1, 3), rd.reshape(-1, 3),
                          cfg.render, bg_color=1.0)
        img = np.asarray(out["rgb"]).reshape(h, w, 3)
        gt = scene["images"][0]
        psnrs.append(float(eval_psnr(img[None], gt[None])[0]))
        ssims.append(eval_ssim(img, gt))
    print(f"PSNR {np.mean(psnrs):.2f}  SSIM {np.mean(ssims):.4f} "
          f"over {len(psnrs)} scenes")


if __name__ == "__main__":
    main()
