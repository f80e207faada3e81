#!/usr/bin/env python
"""Precompute inception feature statistics over a dataset
(`/root/reference/tools/inception_stat.py` analog): renders/loads the
dataset's views, runs InceptionV3 pool3 features in batches, and saves
{feats, mu, sigma} to an .npz that `tools/test_ssdnerf.py`-style FID
evals consume.

  python tools/inception_stat.py --data /path/srn_cars_test \
      --out work_dirs/cache/cars_test_inception.npz [--num-scenes N]
"""
import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--num-scenes", type=int, default=None)
    ap.add_argument("--views-per-scene", type=int, default=None)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--checkpoint-dir", default=None,
                    help="dir with converted inception weights "
                         "(tools/convert_weights.py --kind inception); "
                         "random init otherwise")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from mvedit_tpu.datasets import ShapeNetSRN
    from mvedit_tpu.models.inception import InceptionV3Features

    net = InceptionV3Features()
    if args.checkpoint_dir:
        import orbax.checkpoint as ocp
        path = os.path.abspath(os.path.join(args.checkpoint_dir,
                                            "inception"))
        params = ocp.StandardCheckpointer().restore(path)
    else:
        params = net.init(jax.random.PRNGKey(0),
                          jnp.zeros((1, 299, 299, 3)))["params"]
        print("WARNING: random inception weights (zero egress); "
              "features are only self-consistent")
    apply_fn = jax.jit(lambda p, x: net.apply({"params": p}, x))

    dataset = ShapeNetSRN(args.data)
    n = min(args.num_scenes or len(dataset), len(dataset))
    imgs = []
    for i in range(n):
        scene = dataset[i]
        v = scene["images"]
        if args.views_per_scene:
            v = v[:args.views_per_scene]
        imgs.append(v)
    imgs = np.concatenate(imgs, axis=0)
    print(f"{imgs.shape[0]} images from {n} scenes")

    feats = []
    for i in range(0, len(imgs), args.batch):
        batch = jnp.asarray(imgs[i:i + args.batch], jnp.float32)
        batch = jax.image.resize(
            batch, (batch.shape[0], 299, 299, 3), "bilinear")
        feats.append(np.asarray(apply_fn(params, batch)))
    feats = np.concatenate(feats, axis=0)
    mu = feats.mean(0)
    sigma = np.cov(feats, rowvar=False)
    os.makedirs(os.path.dirname(os.path.abspath(args.out)), exist_ok=True)
    np.savez(args.out, feats=feats, mu=mu, sigma=sigma)
    print(f"saved {feats.shape} features -> {args.out}")


if __name__ == "__main__":
    main()
