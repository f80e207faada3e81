"""Activations with numerically-safe gradients.

TPU-native counterpart of the reference's CUDA-free autograd activation
(`lib/ops/activation.py:8-44` in Lakonik/MVEdit): ``trunc_exp`` is exp with the
incoming gradient computed through a clamped pre-activation so fp32 training of
NeRF densities does not overflow.
"""
import jax
import jax.numpy as jnp

__all__ = ["trunc_exp"]


@jax.custom_jvp
def trunc_exp(x):
    """exp(x) whose gradient is exp(clip(x, -15, 15)) * dx.

    Forward matches plain exp; only the tangent is truncated, so density
    fields can saturate without producing inf gradients.
    """
    return jnp.exp(x)


@trunc_exp.defjvp
def _trunc_exp_jvp(primals, tangents):
    (x,), (dx,) = primals, tangents
    y = jnp.exp(x)
    return y, jnp.exp(jnp.clip(x, -15.0, 15.0)) * dx
