"""Flash attention Pallas kernel tuned for the SD UNet's head dims.

The stock `jax.experimental.pallas.ops.tpu.flash_attention` treats
head_dim < 128 at full 128-lane cost end to end (measured: D=40 runs as
slow as D=128 at L=24576). This kernel keeps the PV/accumulator pipeline
lean for small D and feeds the MXU bf16 probabilities:

- one (bq, bk) score tile per grid step, f32 softmax statistics kept as
  (bq, 1) slices of a (bq, 128) VMEM scratch;
- probabilities cast to bf16 for the PV matmul (halves MXU cycles vs an
  f32 P; exactness is dominated by the f32 max-subtracted exp);
- no inner block loops: the k axis rides the (sequential) last grid dim,
  so Mosaic double-buffers the K/V DMAs across steps.

Forward only — the product's UNet/ControlNet denoise path is inference.
Gradients fall back to the chunked online-softmax scan via custom_vjp.

Reference behavior being replaced: multi-view joint self-attention
(`lib/models/architecture/joint_attn.py:5-54`) folding N views into one
L = N*h*w sequence.
"""
import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["flash_attention"]


def _kernel(q_ref, k_ref, v_ref, o_ref, acc_ref, m_ref, l_ref, *,
            sm_scale):
    ki = pl.program_id(2)

    @pl.when(ki == 0)
    def _init():
        m_ref[:] = jnp.full_like(m_ref, -1e30)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    q = q_ref[0]                      # (bq, D)
    k = k_ref[0]                      # (bk, D)
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * sm_scale   # (bq, bk)

    m_prev = m_ref[:, :1]
    m_new = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
    p = jnp.exp(s - m_new)
    corr = jnp.exp(m_prev - m_new)
    l_ref[:, :1] = l_ref[:, :1] * corr + jnp.sum(p, axis=1, keepdims=True)
    m_ref[:, :1] = m_new
    pv = jax.lax.dot_general(
        p.astype(v_ref.dtype), v_ref[0], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)              # (bq, D)
    acc_ref[:] = acc_ref[:] * corr + pv

    @pl.when(ki == pl.num_programs(2) - 1)
    def _finish():
        o_ref[0] = (acc_ref[:]
                    / jnp.maximum(l_ref[:, :1], 1e-30)).astype(o_ref.dtype)


def _pick_block(n, cap):
    for b in (cap, 1024, 512, 256, 128):
        if b <= cap and n % b == 0:
            return b
    return None


@functools.partial(jax.jit, static_argnames=("sm_scale",))
def _flash_fwd(q, k, v, sm_scale):
    """q: (BH, Lq, D); k/v: (BH, Lk, D). Returns (BH, Lq, D)."""
    BH, Lq, D = q.shape
    Lk = k.shape[1]
    bq = _pick_block(Lq, 1024)
    bk = _pick_block(Lk, 512)
    grid = (BH, Lq // bq, Lk // bk)
    return pl.pallas_call(
        functools.partial(_kernel, sm_scale=sm_scale),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, bq, D), lambda b, qi, ki: (b, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bk, D), lambda b, qi, ki: (b, ki, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bk, D), lambda b, qi, ki: (b, ki, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, bq, D), lambda b, qi, ki: (b, qi, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((BH, Lq, D), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((bq, D), jnp.float32),      # acc (lane-padded)
            pltpu.VMEM((bq, 128), jnp.float32),    # running max
            pltpu.VMEM((bq, 128), jnp.float32),    # running sum
        ],
    )(q, k, v)


def supported(q_shape, k_shape):
    """Static check: shapes this kernel handles."""
    _, Lq, D = q_shape[-3:]
    Lk = k_shape[-2]
    return (D <= 128 and _pick_block(Lq, 1024) is not None
            and _pick_block(Lk, 512) is not None)


def flash_attention(q, k, v, sm_scale=None):
    """(B, L, H, D) attention, bf16-friendly; returns (B, Lq, H, D).

    Layout note: inputs arrive in the UNet's natural (B, L, H, D); the
    (B*H, L, D) kernel layout is a transpose XLA fuses with the
    surrounding projection reshapes.
    """
    B, Lq, H, D = q.shape
    Lk = k.shape[1]
    scale = sm_scale if sm_scale is not None else 1.0 / (D ** 0.5)

    def to_bhld(t, L):
        return jnp.moveaxis(t, 1, 2).reshape(B * H, L, t.shape[-1])

    out = _flash_fwd(to_bhld(q.astype(jnp.bfloat16), Lq),
                     to_bhld(k.astype(jnp.bfloat16), Lk),
                     to_bhld(v.astype(jnp.bfloat16), Lk), scale)
    out = jnp.moveaxis(out.reshape(B, H, Lq, D), 1, 2)
    return out.astype(q.dtype)
