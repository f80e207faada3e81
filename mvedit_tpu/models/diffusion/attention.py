"""Attention core + processor mechanism for the diffusion UNets.

Replaces the reference's torch attention-processor zoo:
- cross-image ("joint") self-attention: `lib/models/architecture/joint_attn.py`
  reshapes (B*k, L, C) -> (B, k*L, C) so k views attend jointly;
- IP-Adapter decoupled cross-attention:
  `lib/models/architecture/ip_adapter/attention_processor.py` adds a second
  K/V projection over image-prompt tokens, scaled and summed;
- reference-only attention (`zero123plus.py:43-156`): concatenates stored
  reference K/V onto self-attention.

Instead of monkey-patching processors onto modules, the mode is a static
`AttnMode` carried through the forward pass — each combination compiles to its
own XLA program (static shapes, fusable).

All attention funnels through `dot_product_attention`, the single place to
swap in a Pallas flash-attention kernel.
"""
from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn
from .norm import GroupNormNHWC

__all__ = ["AttnMode", "dot_product_attention", "CrossAttention",
           "FeedForward", "BasicTransformerBlock", "Transformer2D"]


@dataclass(frozen=True)
class AttnMode:
    """Static attention behavior flags (part of the jit cache key)."""
    num_views: int = 1          # >1 -> cross-image joint self-attention
    ip_tokens: int = 0          # >0 -> decoupled IP-Adapter cross-attn
    ip_scale: float = 1.0
    reference: str = "none"     # none | write | read (zero123++ ref attn)


# Sequence length above which the memory-efficient kernels are used
# (joint attention over 6 views at 64^2 latent = 24576 tokens would
# materialize a 38GB score tensor through plain XLA attention).
_CHUNK_THRESHOLD = 1024
_KV_CHUNK = 2048


def _manual_attention(q, k, v):
    """Plain einsum attention with fp32 softmax. Measured far faster than
    jax.nn.dot_product_attention's lowering on this backend (which runs a
    12x4096x77 cross-attention in 29ms; this path is bandwidth-bound as it
    should be)."""
    D = q.shape[-1]
    s = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                   preferred_element_type=jnp.float32) * (1.0 / D ** 0.5)
    p = jax.nn.softmax(s, axis=-1).astype(v.dtype)
    return jnp.einsum("bhqk,bkhd->bqhd", p, v,
                      preferred_element_type=jnp.float32).astype(q.dtype)


def _chunked_attention(q, k, v):
    """Online-softmax attention, O(Lq * kv_chunk) memory.

    q: (B, Lq, H, D); k/v: (B, Lk, H, D). Flash-style accumulation over KV
    chunks with a lax.scan -> compiles on TPU and CPU alike; the per-chunk
    contractions are large matmuls that land on the MXU.
    """
    B, Lq, H, D = q.shape
    Lk = k.shape[1]
    scale = 1.0 / (D ** 0.5)
    pad = (-Lk) % _KV_CHUNK
    if pad:
        k = jnp.pad(k, ((0, 0), (0, pad), (0, 0), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, pad), (0, 0), (0, 0)))
    n_chunks = k.shape[1] // _KV_CHUNK
    kc = jnp.moveaxis(k.reshape(B, n_chunks, _KV_CHUNK, H, D), 1, 0)
    vc = jnp.moveaxis(v.reshape(B, n_chunks, _KV_CHUNK, H, D), 1, 0)
    valid = (jnp.arange(n_chunks * _KV_CHUNK) < Lk).reshape(n_chunks, -1)

    qs = q * scale

    def body(carry, inp):
        acc, m, l = carry
        kb, vb, ok = inp
        s = jnp.einsum("bqhd,bkhd->bhqk", qs, kb,
                       preferred_element_type=jnp.float32)
        s = jnp.where(ok[None, None, None, :], s, -1e30)
        m_new = jnp.maximum(m, jnp.max(s, axis=-1))
        p = jnp.exp(s - m_new[..., None])
        corr = jnp.exp(m - m_new)
        l = l * corr + jnp.sum(p, axis=-1)
        acc = acc * corr[..., None] + jnp.einsum(
            "bhqk,bkhd->bhqd", p.astype(vb.dtype), vb,
            preferred_element_type=jnp.float32)
        return (acc, m_new, l), None

    acc0 = jnp.zeros((B, H, Lq, D), jnp.float32)
    m0 = jnp.full((B, H, Lq), -jnp.inf, jnp.float32)
    l0 = jnp.zeros((B, H, Lq), jnp.float32)
    (acc, m, l), _ = jax.lax.scan(body, (acc0, m0, l0), (kc, vc, valid))
    out = acc / jnp.clip(l[..., None], 1e-30, None)
    return jnp.moveaxis(out, 1, 2).astype(q.dtype)


def _block(n, cap=1024):
    for b in (cap, 512, 256, 128):
        if n % b == 0:
            return b
    return None


def _pallas_flash(q, k, v):
    """Tuned Pallas TPU flash attention (measured 3x faster than the
    chunked scan at L=24576). Block sizes follow a measured-on-v5e table
    (PERF.md round-2 sweep): bq=2048 beats 1024 by 10-16% at the hot
    shapes (L=4096/8192/24576, H=8, D=40); bk=1024 wins at L<=8192,
    bk=512 at longer sequences (VMEM pressure)."""
    from jax.experimental.pallas.ops.tpu.flash_attention import (
        flash_attention, BlockSizes)
    B, Lq, H, D = q.shape
    Lk = k.shape[1]
    # bq=2048 only up to L=8192: at L=24576 it buys ~4% steady but
    # inflates XLA compile from ~1 to ~11 minutes (measured)
    bq = 2048 if (Lq % 2048 == 0 and Lq <= 8192) else _block(Lq)
    bkM = 1024 if Lk % 1024 == 0 else _block(Lk)
    if bq is None or bkM is None or D > 128:
        return None
    bk = min(bkM, 1024 if Lq <= 8192 else 512)
    # backward blocks stay <= 1024: the dkv pass keeps more operands
    # resident in VMEM than the forward
    bqb = min(bq, 1024)
    bkb = min(bk, 512)
    sizes = BlockSizes(block_q=bq, block_k_major=bkM,
                       block_k=bk, block_b=1,
                       block_q_major_dkv=bqb, block_k_major_dkv=bkM,
                       block_k_dkv=bkb, block_q_dkv=bqb,
                       block_k_major_dq=bkM, block_k_dq=bkb,
                       block_q_dq=bqb)
    dt = q.dtype
    qt = jnp.moveaxis(q, 1, 2).astype(jnp.bfloat16)
    kt = jnp.moveaxis(k, 1, 2).astype(jnp.bfloat16)
    vt = jnp.moveaxis(v, 1, 2).astype(jnp.bfloat16)
    out = flash_attention(qt, kt, vt, causal=False,
                          sm_scale=1.0 / (D ** 0.5), block_sizes=sizes)
    return jnp.moveaxis(out, 1, 2).astype(dt)


def dot_product_attention(q, k, v):
    """(B, Lq, H, D) x (B, Lk, H, D) -> (B, Lq, H, D). bf16-friendly.

    Long sequences: Pallas flash attention on TPU (falls back to the
    chunked online-softmax scan on CPU / odd shapes). Short sequences:
    plain XLA attention.
    """
    long_seq = max(q.shape[1], k.shape[1]) > _CHUNK_THRESHOLD
    if long_seq and jax.default_backend() != "cpu":
        out = _pallas_flash(q, k, v)
        if out is not None:
            return out
    if q.shape[1] * k.shape[1] > 4096 * 8192:
        return _chunked_attention(q, k, v)
    return _manual_attention(q, k, v)


class CrossAttention(nn.Module):
    """Multi-head attention, diffusers-compatible parameter layout
    (to_q/to_k/to_v/to_out)."""
    query_dim: int
    context_dim: Optional[int] = None
    heads: int = 8
    dim_head: int = 64
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, context=None, mode: AttnMode = AttnMode(),
                 ip_context=None, ref_kv=None):
        """x: (B, L, C). context: (B, Lc, Cc) or None for self-attention.

        Returns (out, new_ref_kv) where new_ref_kv is the (k-input, v-input)
        hidden states stored in 'write' reference mode (else None).
        """
        inner = self.heads * self.dim_head
        is_self = context is None
        h = self.heads

        to_q = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_q")
        ctx_dim = self.query_dim if is_self else self.context_dim
        to_k = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_k")
        to_v = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_v")
        to_out = nn.Dense(self.query_dim, dtype=self.dtype, name="to_out_0")
        del ctx_dim

        ctx = x if is_self else context
        written = None
        if is_self and mode.reference == "write":
            written = ctx
        if is_self and mode.reference == "read" and ref_kv is not None:
            ctx = jnp.concatenate([ctx, ref_kv], axis=1)

        if is_self and mode.num_views > 1:
            # joint self-attention: fold views into the sequence axis
            # (joint_attn.py:13-17)
            B, L, C = x.shape
            k_views = mode.num_views
            xq = x.reshape(B // k_views, k_views * L, C)
            cq = ctx.reshape(B // k_views, -1, ctx.shape[-1])
        else:
            xq, cq = x, ctx

        q = to_q(xq)
        k = to_k(cq)
        v = to_v(cq)

        def split(t):
            return t.reshape(t.shape[0], t.shape[1], h, self.dim_head)

        out = dot_product_attention(split(q), split(k), split(v))
        out = out.reshape(out.shape[0], out.shape[1], inner)

        if (not is_self) and mode.ip_tokens > 0 and ip_context is not None:
            ip_k = nn.Dense(inner, use_bias=False, dtype=self.dtype,
                            name="ip_to_k")(ip_context)
            ip_v = nn.Dense(inner, use_bias=False, dtype=self.dtype,
                            name="ip_to_v")(ip_context)
            ip_out = dot_product_attention(split(q), split(ip_k), split(ip_v))
            ip_out = ip_out.reshape(out.shape)
            out = out + mode.ip_scale * ip_out

        if is_self and mode.num_views > 1:
            out = out.reshape(x.shape[0], x.shape[1], inner)

        return to_out(out), written


class FeedForward(nn.Module):
    dim: int
    mult: int = 4
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        inner = self.dim * self.mult
        # GEGLU (diffusers net.0.proj)
        proj = nn.Dense(inner * 2, dtype=self.dtype, name="net_0_proj")(x)
        a, gate = jnp.split(proj, 2, axis=-1)
        x = a * jax.nn.gelu(gate)
        return nn.Dense(self.dim, dtype=self.dtype, name="net_2")(x)


class BasicTransformerBlock(nn.Module):
    dim: int
    heads: int
    dim_head: int
    context_dim: int = 768
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, context, mode: AttnMode = AttnMode(),
                 ip_context=None, ref_kv=None):
        attn1 = CrossAttention(self.dim, None, self.heads, self.dim_head,
                               dtype=self.dtype, name="attn1")
        attn2 = CrossAttention(self.dim, self.context_dim, self.heads,
                               self.dim_head, dtype=self.dtype, name="attn2")
        h, written = attn1(nn.LayerNorm(dtype=self.dtype, name="norm1")(x),
                           None, mode=mode, ref_kv=ref_kv)
        x = x + h
        h, _ = attn2(nn.LayerNorm(dtype=self.dtype, name="norm2")(x), context,
                     mode=mode, ip_context=ip_context)
        x = x + h
        x = x + FeedForward(self.dim, dtype=self.dtype, name="ff")(
            nn.LayerNorm(dtype=self.dtype, name="norm3")(x))
        return x, written


class Transformer2D(nn.Module):
    """Spatial transformer: GroupNorm -> proj_in -> blocks -> proj_out + skip.

    `use_linear_projection=False` (SD1.5 uses 1x1 convs)."""
    channels: int
    heads: int
    dim_head: int
    depth: int = 1
    context_dim: int = 768
    use_linear: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, context, mode: AttnMode = AttnMode(),
                 ip_context=None, ref_kv=None):
        """x: (B, H, W, C) NHWC. Returns (out, written_kv or None)."""
        B, H, W, C = x.shape
        residual = x
        h = GroupNormNHWC(32, epsilon=1e-6, dtype=self.dtype, name="norm")(x)
        if self.use_linear:
            h = h.reshape(B, H * W, C)
            h = nn.Dense(self.channels, dtype=self.dtype, name="proj_in")(h)
        else:
            h = nn.Conv(self.channels, (1, 1), dtype=self.dtype,
                        name="proj_in")(h)
            h = h.reshape(B, H * W, self.channels)
        writes = []
        for i in range(self.depth):
            rkv = ref_kv[i] if isinstance(ref_kv, (list, tuple)) else ref_kv
            h, w_kv = BasicTransformerBlock(
                self.channels, self.heads, self.dim_head, self.context_dim,
                dtype=self.dtype, name=f"transformer_blocks_{i}")(
                    h, context, mode=mode, ip_context=ip_context, ref_kv=rkv)
            writes.append(w_kv)
        if self.use_linear:
            h = nn.Dense(C, dtype=self.dtype, name="proj_out")(h)
            h = h.reshape(B, H, W, C)
        else:
            h = h.reshape(B, H, W, self.channels)
            h = nn.Conv(C, (1, 1), dtype=self.dtype, name="proj_out")(h)
        out = h + residual
        return out, (writes if any(w is not None for w in writes) else None)
