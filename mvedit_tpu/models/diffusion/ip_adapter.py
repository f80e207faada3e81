"""IP-Adapter image-prompt projection models (flax).

Rebuilds `lib/models/architecture/ip_adapter/ip_adapter.py:32-171`:
- `ImageProjModel`: CLIP image embed -> `num_tokens` (4) context tokens
  (plain IP-Adapter);
- `Resampler`: perceiver-style latent resampler over CLIP penultimate
  hidden states -> 16 tokens (IP-Adapter-plus).

The decoupled attention itself lives in attention.py (CrossAttention's
ip_to_k/ip_to_v branches, enabled by AttnMode.ip_tokens>0); ControlNets see
plain text tokens only (the reference's CNAttnProcessor simply truncates the
ip tokens away — here they are never passed to the ControlNet).

`get_prompt_embeds` composes [uncond, cond] text + image token sequences
exactly like ip_adapter.py:151-169.
"""
from dataclasses import dataclass

import jax
import jax.numpy as jnp
from flax import linen as nn

__all__ = ["ImageProjModel", "Resampler", "get_ip_prompt_embeds"]


class ImageProjModel(nn.Module):
    cross_attention_dim: int = 768
    clip_embed_dim: int = 1024
    num_tokens: int = 4

    @nn.compact
    def __call__(self, image_embeds):
        """(B, clip_embed_dim) -> (B, num_tokens, cross_attention_dim)."""
        x = nn.Dense(self.cross_attention_dim * self.num_tokens,
                     name="proj")(image_embeds)
        x = x.reshape(-1, self.num_tokens, self.cross_attention_dim)
        return nn.LayerNorm(name="norm")(x)


class PerceiverAttention(nn.Module):
    dim: int
    dim_head: int = 64
    heads: int = 16

    @nn.compact
    def __call__(self, x, latents):
        inner = self.dim_head * self.heads
        xl = nn.LayerNorm(name="norm1")(x)
        lt = nn.LayerNorm(name="norm2")(latents)
        q = nn.Dense(inner, use_bias=False, name="to_q")(lt)
        kv_in = jnp.concatenate([xl, lt], axis=-2)
        kv = nn.Dense(inner * 2, use_bias=False, name="to_kv")(kv_in)
        k, v = jnp.split(kv, 2, axis=-1)

        def split(t):
            return t.reshape(t.shape[0], t.shape[1], self.heads, self.dim_head)

        from .attention import dot_product_attention
        out = dot_product_attention(split(q), split(k), split(v))
        out = out.reshape(latents.shape[0], latents.shape[1], inner)
        return nn.Dense(self.dim, use_bias=False, name="to_out")(out)


class Resampler(nn.Module):
    """IP-Adapter-plus resampler (ip_adapter/resampler.py semantics)."""
    dim: int = 768
    depth: int = 4
    dim_head: int = 64
    heads: int = 12
    num_queries: int = 16
    embedding_dim: int = 1280   # CLIP ViT-H hidden
    output_dim: int = 768
    ff_mult: int = 4

    @nn.compact
    def __call__(self, x):
        """x: (B, P, embedding_dim) CLIP penultimate hiddens ->
        (B, num_queries, output_dim)."""
        latents = self.param("latents", nn.initializers.normal(0.02),
                             (self.num_queries, self.dim))
        latents = jnp.broadcast_to(latents[None],
                                   (x.shape[0], self.num_queries, self.dim))
        x = nn.Dense(self.dim, name="proj_in")(x)
        for i in range(self.depth):
            latents = latents + PerceiverAttention(
                self.dim, self.dim_head, self.heads,
                name=f"layers_{i}_attn")(x, latents)
            h = nn.LayerNorm(name=f"layers_{i}_ff_norm")(latents)
            h = nn.Dense(self.dim * self.ff_mult, use_bias=False,
                         name=f"layers_{i}_ff_1")(h)
            h = nn.Dense(self.dim, use_bias=False,
                         name=f"layers_{i}_ff_2")(jax.nn.gelu(h))
            latents = latents + h
        out = nn.Dense(self.output_dim, name="proj_out")(latents)
        return nn.LayerNorm(name="norm_out")(out)


def get_ip_prompt_embeds(text_embeds, uncond_text_embeds, image_tokens,
                         uncond_image_tokens):
    """Compose CFG pairs: concat image-prompt tokens onto text tokens
    (ip_adapter.py:151-169). Returns (pos, neg) contexts."""
    pos = jnp.concatenate([text_embeds, image_tokens], axis=1)
    neg = jnp.concatenate([uncond_text_embeds, uncond_image_tokens], axis=1)
    return pos, neg
