"""LoRA adapters on flax param trees.

Rebuilds `lib/models/architecture/lora.py` + the UNet/CLIP LoRA wrappers
(`diffusers.py:240-318,384-471`) functionally: instead of wrapping modules,
LoRA lives as a separate small pytree {path: (A, B)} and `merge_lora` folds
`scale * B @ A` into the dense kernels — the natural TPU form (weights are
immutable pytree leaves; merging is a tree_map, unmerging is subtracting).

Used by StableSSDNeRF (SD2.1 UNet + CLIP LoRA fine-tune) and available for
training.
"""
import jax
import jax.numpy as jnp

__all__ = ["init_lora", "merge_lora", "lora_apply_delta"]


def _iter_dense_paths(tree, prefix=()):
    for k, v in tree.items():
        if isinstance(v, dict):
            if "kernel" in v and getattr(v["kernel"], "ndim", 0) == 2:
                yield prefix + (k,), v["kernel"].shape
            yield from _iter_dense_paths(v, prefix + (k,))


def init_lora(key, params, rank=8, match=None, std=0.01):
    """Create {path_tuple: {'a': (r, in), 'b': (out, r)}} for every 2D dense
    kernel whose '/'-joined path contains `match` (None -> attention
    projections to_q/to_k/to_v/to_out)."""
    match_keys = match or ("to_q", "to_k", "to_v", "to_out")
    lora = {}
    for path, shape in _iter_dense_paths(params):
        name = "/".join(path)
        if not any(m in name for m in match_keys):
            continue
        d_in, d_out = shape
        key, k1 = jax.random.split(key)
        lora[path] = {
            "a": jax.random.normal(k1, (rank, d_in)) * std,
            "b": jnp.zeros((d_out, rank)),
        }
    return lora


def lora_apply_delta(params, lora, scale=1.0, sign=1.0):
    params = jax.tree_util.tree_map(lambda x: x, params)  # shallow copy tree

    def set_in(tree, path, fn):
        node = tree
        for p in path[:-1]:
            node[p] = dict(node[p])
            node = node[p]
        node[path[-1]] = dict(node[path[-1]])
        node[path[-1]]["kernel"] = fn(node[path[-1]]["kernel"])

    out = {k: v for k, v in params.items()}

    def deep(d):
        return {k: deep(v) if isinstance(v, dict) else v for k, v in d.items()}

    out = deep(params)
    for path, ab in lora.items():
        delta = (ab["b"] @ ab["a"]).T * scale * sign  # (in, out)
        set_in(out, path, lambda kern: kern + delta.astype(kern.dtype))
    return out


def merge_lora(params, lora, scale=1.0):
    """Fold LoRA into the dense kernels; returns new params tree."""
    return lora_apply_delta(params, lora, scale=scale, sign=1.0)
