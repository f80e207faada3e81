"""Log2-domain tone curve with forward/inverse LUTs.

Rebuilds the semantics of the reference Tonemapping module
(`lib/models/decoders/tonemapping.py:5-52`): a fixed sigmoid+linear curve in
log2 space, discretized to a 16-knot LUT whose forward and inverse are both
piecewise-linear interpolations. The pipelines compose shading multiplicatively
in this log space (e.g. `mvedit_3d_pipeline.py:165-168`).

Implemented as a frozen dataclass of jnp constants -> a pure pytree, safe to
close over inside jit.
"""
from dataclasses import dataclass, field

import jax.numpy as jnp

__all__ = ["Tonemapping"]


def _searchsorted_interp(xq, xs, ys):
    """Piecewise-linear interp of (xs, ys) at xq; linear extrapolation."""
    i = jnp.clip(jnp.searchsorted(xs, xq, side="right"), 1, len(xs) - 1)
    x0, x1 = xs[i - 1], xs[i]
    y0, y1 = ys[i - 1], ys[i]
    t = (xq - x0) / (x1 - x0)
    return y0 + (y1 - y0) * t


@dataclass(frozen=True)
class Tonemapping:
    exposure: float = 0.0
    contrast: float = 0.953
    bias: float = 0.088
    sigmoid_gain: float = 0.943
    log_gain: float = 0.011
    lut_logx_min: float = -9.0
    lut_logx_max: float = 3.0
    lut_steps: int = 16
    lut_x: jnp.ndarray = field(init=False, repr=False)
    lut_y: jnp.ndarray = field(init=False, repr=False)

    def __post_init__(self):
        lut_x = jnp.linspace(self.lut_logx_min, self.lut_logx_max, self.lut_steps)
        object.__setattr__(self, "lut_x", lut_x)
        object.__setattr__(self, "lut_y", self.smooth_forward(lut_x))

    def smooth_forward(self, x, input_mode="log"):
        assert input_mode in ("log", "linear")
        if input_mode == "linear":
            x = jnp.log2(jnp.clip(x, 1e-6, None))
        x = (x + self.exposure) * self.contrast
        return jax_sigmoid(x) * self.sigmoid_gain + x * self.log_gain + self.bias

    def lut(self, x, input_mode="log"):
        assert input_mode in ("log", "linear")
        dtype = x.dtype
        x = x.astype(self.lut_x.dtype)
        if input_mode == "linear":
            x = jnp.log2(jnp.clip(x, 1e-6, None))
        return _searchsorted_interp(x, self.lut_x, self.lut_y).astype(dtype)

    def inverse_lut(self, y, output_mode="log"):
        assert output_mode in ("log", "linear")
        dtype = y.dtype
        y = y.astype(self.lut_y.dtype)
        x = _searchsorted_interp(y, self.lut_y, self.lut_x)
        if output_mode == "linear":
            x = jnp.exp2(x)
        return x.astype(dtype)


def jax_sigmoid(x):
    return 1.0 / (1.0 + jnp.exp(-x))
