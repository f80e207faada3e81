"""Neural fields: instant-NGP hash-grid NeRF and small MLPs as param pytrees.

TPU-native rebuild of the reference iNGP decoder
(`lib/models/decoders/ingp_decoder.py:44-130`): hash-grid encoding (replacing
tiny-cuda-nn) -> 2-layer/64-wide MLP -> (sigma via trunc_exp + density blob,
rgb via saturated sigmoid). View direction is NOT an input for this field
(matches the reference: `point_decode` ignores `dirs`).

Parameters are plain dict pytrees so they thread through `lax.fori_loop` /
optax inside the jitted reconstruction inner loop, and `jax.grad` w.r.t. the
input points gives analytic density normals (the reference needs
`torch.autograd.grad` + a double-backward CUDA grid_sample for this).
"""
from dataclasses import dataclass, field
from functools import partial

import jax
import jax.numpy as jnp

from ..ops.activation import trunc_exp
from ..ops.hash_grid import HashGridConfig, hash_grid_encode, hash_grid_init
from ..ops.dense_grid import (DenseGridConfig, dense_grid_encode,
                              dense_grid_init)

__all__ = ["mlp_init", "mlp_apply", "INGPConfig", "ingp_init",
           "ingp_point_decode", "ingp_density", "FieldColor",
           "FieldShading"]


def mlp_init(key, dims, dtype=jnp.float32):
    """Xavier-uniform MLP params for layer sizes `dims` (ref init_weights)."""
    params = []
    keys = jax.random.split(key, len(dims) - 1)
    for k, d_in, d_out in zip(keys, dims[:-1], dims[1:]):
        bound = (6.0 / (d_in + d_out)) ** 0.5
        w = jax.random.uniform(k, (d_in, d_out), dtype, -bound, bound)
        b = jnp.zeros((d_out,), dtype)
        params.append({"w": w, "b": b})
    return params


def mlp_apply(params, x):
    """ReLU MLP; no activation on the last layer."""
    for i, layer in enumerate(params):
        x = jnp.dot(x, layer["w"], preferred_element_type=jnp.float32) + layer["b"]
        if i != len(params) - 1:
            x = jax.nn.relu(x)
    return x


@dataclass(frozen=True)
class INGPConfig:
    """Matches the reference defaults at ingp_decoder.py:47-57 (n_levels
    chosen 12 for 320 max res / 14 for 512, adapter3d.py:66).

    backend="hash" reproduces tcnn semantics; backend="dense" swaps in the
    TPU-first dense feature pyramid (ops/dense_grid.py) — far fewer, wider
    gathers; recommended on TPU."""
    hash: HashGridConfig = field(default_factory=HashGridConfig)
    dense: DenseGridConfig = field(default_factory=DenseGridConfig)
    backend: str = "hash"
    num_layers: int = 2
    hidden_dim: int = 64
    sigmoid_saturation: float = 0.001
    blob_density: float = 1.0
    blob_radius: float = 0.2
    bound: float = 1.0

    @property
    def enc_dim(self):
        return (self.hash.out_dim if self.backend == "hash"
                else self.dense.out_dim)

    @property
    def mlp_dims(self):
        return (self.enc_dim,
                *([self.hidden_dim] * (self.num_layers - 1)), 4)


def ingp_init(key, cfg: INGPConfig):
    k1, k2 = jax.random.split(key)
    if cfg.backend == "dense":
        table = dense_grid_init(k1, cfg.dense)
    else:
        table = hash_grid_init(k1, cfg.hash)
    return {
        "table": table,
        "mlp": mlp_init(k2, cfg.mlp_dims),
    }


def _density_blob(xyz, cfg: INGPConfig):
    """Gaussian density prior at the origin (ingp_decoder.py:101-104)."""
    d = jnp.clip(jnp.sum(xyz * xyz, axis=-1), 0.2, None)
    return cfg.blob_density * jnp.exp(-d / (2.0 * cfg.blob_radius ** 2))


@partial(jax.jit, static_argnames=("cfg",))
def ingp_point_decode(params, xyz, cfg: INGPConfig):
    """xyz: (..., 3) world points in [-bound, bound].

    Returns (sigma (...,), rgb (..., 3))."""
    x01 = (xyz + cfg.bound) / (2.0 * cfg.bound)
    if cfg.backend == "dense":
        enc = dense_grid_encode(params["table"], x01, cfg.dense)
    else:
        enc = hash_grid_encode(params["table"], x01, cfg.hash)
    h = mlp_apply(params["mlp"], enc)
    sigma = trunc_exp(h[..., 0] + _density_blob(xyz, cfg))
    rgb = jax.nn.sigmoid(h[..., 1:])
    if cfg.sigmoid_saturation > 0:
        rgb = rgb * (1 + 2 * cfg.sigmoid_saturation) - cfg.sigmoid_saturation
    return sigma, rgb


@partial(jax.jit, static_argnames=("cfg",))
def ingp_density(params, xyz, cfg: INGPConfig):
    sigma, _ = ingp_point_decode(params, xyz, cfg)
    return sigma


class FieldColor:
    """Hashable-by-config albedo callback `fn(params, xyz) -> rgb` for
    top-level jitted renderers (render_views / bake_texture): the field
    params ride as TRACED arguments, never as closure constants — a
    closure with a value-blind hash would bake params into the compiled
    binary (duplicate HBM) and silently reuse stale values on jit cache
    hits."""

    def __init__(self, cfg: INGPConfig):
        self.cfg = cfg

    def __call__(self, params, xyz):
        return ingp_point_decode(params, xyz, self.cfg)[1]

    def __hash__(self):
        return hash(self.cfg)

    def __eq__(self, other):
        return isinstance(other, FieldColor) and other.cfg == self.cfg


class FieldShading(FieldColor):
    """render_views shading_fun form of FieldColor (ignores normal and
    view direction — the MVEdit albedo field is lambertian-composited by
    the caller)."""

    def __call__(self, params, xyz, normal, view_dir):
        return ingp_point_decode(params, xyz, self.cfg)[1]
