"""Batch iterators: scenes -> static-shape ray/image batches.

Replaces `lib/datasets/builder.py:13` + DistributedSampler(split_data=True)
(`samplers/distributed_sampler.py:13-40`): the TPU program is one pjit over
the mesh, so "per-rank disjoint shards" becomes per-host slicing here and
batch sharding inside jit. `skip_iter` resume = fast-forwarding the rng
stream (deterministic sampling from a seed).
"""
import numpy as np

from ..utils.geometry import get_cam_rays

__all__ = ["ray_batch_iterator", "scene_batch_iterator"]


def scene_batch_iterator(dataset, batch_size, seed=0, skip_iter=0,
                         shard=(0, 1)):
    """Yield lists of scene dicts, deterministic order, optionally sharded
    (host_id, num_hosts)."""
    rng = np.random.default_rng(seed)
    host, n_hosts = shard
    it = 0
    while True:
        order = rng.permutation(len(dataset))
        order = order[host::n_hosts]
        for i in range(0, len(order) - batch_size + 1, batch_size):
            if it >= skip_iter:
                yield [dataset[j] for j in order[i:i + batch_size]]
            it += 1


def ray_batch_iterator(dataset, batch_size, n_rays, seed=0, skip_iter=0,
                       shard=(0, 1), num_train_imgs=None, patch_size=None):
    """Yield jnp-ready dicts {rays_o, rays_d, rgb, scene_ids, cond,
    captions} with static shapes (B, n_rays, 3).

    num_train_imgs restricts ray sampling to the first k views of each
    scene (reference `num_train_imgs`, e.g. the cars3v 3-view recipes,
    configs/paper_cfgs/ssdnerf_cars3v_uncond_1m.py). patch_size draws one
    contiguous (ps, ps) pixel patch from a random view instead of n_rays
    scattered pixels (n_rays must equal ps*ps) — the patch-wise rendering
    loss that StableSSDNeRF's LPIPS term needs
    (configs/sd/stablessdnerf_cars_lpips.py patch-based train_cfg)."""
    import jax.numpy as jnp
    if patch_size is not None:
        assert n_rays == patch_size * patch_size, \
            "patch mode needs n_rays == patch_size^2"
    it_idx = skip_iter
    for scenes in scene_batch_iterator(dataset, batch_size, seed, skip_iter,
                                       shard):
        # rng keyed by iteration index -> resume (skip_iter) reproduces the
        # exact ray stream
        rng = np.random.default_rng((seed + 1, it_idx))
        it_idx += 1
        ro_b, rd_b, rgb_b, ids = [], [], [], []
        for s in scenes:
            imgs = s["images"]
            n, h, w = imgs.shape[:3]
            if num_train_imgs is not None:
                n = min(n, num_train_imgs)
            if patch_size is not None:
                ps = patch_size
                v = int(rng.integers(0, n))
                oy = int(rng.integers(0, max(h - ps, 0) + 1))
                ox = int(rng.integers(0, max(w - ps, 0) + 1))
                gy, gx = np.meshgrid(np.arange(oy, oy + ps),
                                     np.arange(ox, ox + ps), indexing="ij")
                vi = np.full(n_rays, v)
                yi = gy.reshape(-1)
                xi = gx.reshape(-1)
            else:
                vi = rng.integers(0, n, n_rays)
                yi = rng.integers(0, h, n_rays)
                xi = rng.integers(0, w, n_rays)
            o, d = get_cam_rays(jnp.asarray(s["poses"]),
                                jnp.asarray(s["intrinsics"]), h, w)
            o = np.asarray(o)
            d = np.asarray(d)
            ro_b.append(o[vi, yi, xi])
            rd_b.append(d[vi, yi, xi])
            rgb_b.append(imgs[vi, yi, xi])
            ids.append(s["scene_id"])
        yield {
            "rays_o": jnp.asarray(np.stack(ro_b)),
            "rays_d": jnp.asarray(np.stack(rd_b)),
            "rgb": jnp.asarray(np.stack(rgb_b)),
            "scene_ids": np.asarray(ids),
            "cond": None,
            "captions": [s.get("caption", "") for s in scenes],
        }
