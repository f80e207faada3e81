"""Layout-preserving GroupNorm for NHWC conv stacks.

Drop-in replacement for `flax.linen.GroupNorm` (same param names/shapes:
`scale` (C,), `bias` (C,) — converted torch checkpoints load unchanged).

Why: flax's GroupNorm reshapes the FULL activation to (N, H, W, g, C/g)
to reduce per group. On TPU that splits the 128-lane channel dimension,
and the decode trace shows the cost at SD-VAE scale (6x512^2x128):
groupnorm 124 ms + ~100 ms of data-formatting/broadcast of a 294 ms
decode — 42% in normalization around 92 ms of actual convs
(benchmarks: /tmp/vae_trace, PERF.md r5). This version never reshapes
the big tensor: per-channel moments reduce over (H, W) into a small
(N, C) array, the group average happens on THAT, and the normalize is a
single fusable elementwise pass in the tensor's native NHWC layout (XLA
folds it into the consumer conv's input fusion).

Numerics: moments accumulate in float32 regardless of `dtype` (matching
flax, which also upcasts for reductions); var = E[x^2] - E[x]^2 on f32
is exact enough at bf16 input precision (pinned against nn.GroupNorm by
tests/test_diffusion.py::test_group_norm_nhwc_matches_flax).
"""
import flax.linen as nn
import jax
import jax.numpy as jnp

__all__ = ["GroupNormNHWC"]


class GroupNormNHWC(nn.Module):
    num_groups: int = 32
    epsilon: float = 1e-5
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        C = x.shape[-1]
        g = self.num_groups
        assert C % g == 0, f"channels {C} not divisible by groups {g}"
        scale = self.param("scale", nn.initializers.ones, (C,))
        bias = self.param("bias", nn.initializers.zeros, (C,))
        # moments via ones-vector matmuls: XLA lowers the (N, H, W, C)
        # spatial reduce as slow loop fusions (~86 ms of a 280 ms SD-VAE
        # decode, r5 trace); an MXU contraction with f32 accumulation
        # runs it at memory speed. x*x rides the second contraction's
        # lhs (bf16 squares, f32 accumulated — pinned against
        # nn.GroupNorm by the equivalence test).
        n = x.shape[0]
        S = 1
        for d in x.shape[1:-1]:
            S *= d
        xs = x.reshape(n, S, C)
        ones = jnp.ones((S,), x.dtype)
        m = jnp.einsum("nsc,s->nc", xs, ones,
                       preferred_element_type=jnp.float32) / S
        m2 = jnp.einsum("nsc,s->nc", xs * xs, ones,
                        preferred_element_type=jnp.float32) / S
        mg = jnp.mean(m.reshape(n, g, C // g), axis=-1)    # (N, g)
        m2g = jnp.mean(m2.reshape(n, g, C // g), axis=-1)
        var = jnp.maximum(m2g - jnp.square(mg), 0.0)
        inv = jax.lax.rsqrt(var + self.epsilon)            # (N, g)
        # per-channel affine folded into the group stats: ONE fused
        # elementwise pass over the big tensor, native NHWC layout
        inv_c = jnp.repeat(inv, C // g, axis=-1)           # (N, C)
        mean_c = jnp.repeat(mg, C // g, axis=-1)
        mul = (inv_c * scale[None, :]).astype(x.dtype)
        add = (bias[None, :] - mean_c * inv_c * scale[None, :]).astype(
            x.dtype)
        shape = (n,) + (1,) * (x.ndim - 2) + (C,)
        return x * mul.reshape(shape) + add.reshape(shape)
