"""CLIP text and vision encoders (flax), HF-weight compatible.

Rebuilds the conditioning encoders the reference loads from transformers:
- text encoder (CLIP ViT-L/14 for SD1.5; `lib/models/architecture/
  diffusers.py:320-383` CLIPTextModel adapter with LoRA support);
- vision encoder w/ projection for IP-Adapter image prompts
  (`lib/models/architecture/ip_adapter/ip_adapter.py:32-80` uses
  CLIPVisionModelWithProjection).

Includes the simple BPE-free tokenizer contract: the pipelines pass
pre-tokenized int ids; `tokenizer.py` provides the actual BPE.
"""
from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

__all__ = ["CLIPTextConfig", "CLIPTextModel", "CLIPVisionConfig",
           "CLIPVisionModel", "SD15_TEXT", "IPADAPTER_VISION"]


@dataclass(frozen=True)
class CLIPTextConfig:
    vocab_size: int = 49408
    hidden_size: int = 768
    intermediate_size: int = 3072
    num_layers: int = 12
    num_heads: int = 12
    max_length: int = 77
    # SD1.5 CLIP uses quick_gelu; SD2.x uses gelu
    act: str = "quick_gelu"
    dtype: jnp.dtype = jnp.float32


SD15_TEXT = CLIPTextConfig()


@dataclass(frozen=True)
class CLIPVisionConfig:
    image_size: int = 224
    patch_size: int = 14
    hidden_size: int = 1024
    intermediate_size: int = 4096
    num_layers: int = 24
    num_heads: int = 16
    projection_dim: int = 768
    act: str = "quick_gelu"
    dtype: jnp.dtype = jnp.float32


IPADAPTER_VISION = CLIPVisionConfig(
    # IP-Adapter uses OpenCLIP ViT-H/14: 1280 wide, 32 layers, gelu
    image_size=224, patch_size=14, hidden_size=1280, intermediate_size=5120,
    num_layers=32, num_heads=16, projection_dim=1024, act="gelu")


def _act(name):
    if name == "quick_gelu":
        return lambda x: x * jax.nn.sigmoid(1.702 * x)
    return jax.nn.gelu


class CLIPLayer(nn.Module):
    hidden: int
    inter: int
    heads: int
    act: str
    dtype: jnp.dtype

    @nn.compact
    def __call__(self, x, causal_mask=None):
        h = nn.LayerNorm(dtype=self.dtype, name="layer_norm1")(x)
        d = self.hidden // self.heads
        q = nn.Dense(self.hidden, dtype=self.dtype, name="q_proj")(h)
        k = nn.Dense(self.hidden, dtype=self.dtype, name="k_proj")(h)
        v = nn.Dense(self.hidden, dtype=self.dtype, name="v_proj")(h)

        def split(t):
            return t.reshape(t.shape[0], t.shape[1], self.heads, d)

        from .attention import dot_product_attention as _dpa
        if causal_mask:
            o = jax.nn.dot_product_attention(
                split(q), split(k), split(v), is_causal=True)
        else:
            o = _dpa(split(q), split(k), split(v))
        o = o.reshape(x.shape[0], x.shape[1], self.hidden)
        x = x + nn.Dense(self.hidden, dtype=self.dtype, name="out_proj")(o)
        h = nn.LayerNorm(dtype=self.dtype, name="layer_norm2")(x)
        h = nn.Dense(self.inter, dtype=self.dtype, name="fc1")(h)
        h = _act(self.act)(h)
        x = x + nn.Dense(self.hidden, dtype=self.dtype, name="fc2")(h)
        return x


class CLIPTextModel(nn.Module):
    cfg: CLIPTextConfig = SD15_TEXT

    @nn.compact
    def __call__(self, input_ids, output_hidden_state_index=None):
        """input_ids: (B, L) int32. Returns last_hidden_state (B, L, H)
        (after final LN), or an intermediate layer when
        `output_hidden_state_index` is set (clip-skip support)."""
        cfg = self.cfg
        tok = nn.Embed(cfg.vocab_size, cfg.hidden_size, dtype=cfg.dtype,
                       name="token_embedding")(input_ids)
        pos = self.param("position_embedding",
                         nn.initializers.zeros,
                         (cfg.max_length, cfg.hidden_size))
        x = tok + pos[None, :input_ids.shape[1]]
        for i in range(cfg.num_layers):
            x = CLIPLayer(cfg.hidden_size, cfg.intermediate_size,
                          cfg.num_heads, cfg.act, cfg.dtype,
                          name=f"layers_{i}")(x, causal_mask=True)
            if output_hidden_state_index is not None \
                    and i == cfg.num_layers + output_hidden_state_index:
                return x
        return nn.LayerNorm(dtype=cfg.dtype, name="final_layer_norm")(x)


class CLIPVisionModel(nn.Module):
    cfg: CLIPVisionConfig = IPADAPTER_VISION

    @nn.compact
    def __call__(self, pixel_values, return_hidden=False):
        """pixel_values: (B, H, W, 3) CLIP-normalized.

        Returns image_embeds (B, projection_dim) by default, or the
        penultimate hidden states (B, 1+P, H) when `return_hidden` (used by
        IP-Adapter-plus Resampler)."""
        cfg = self.cfg
        B = pixel_values.shape[0]
        patches = nn.Conv(cfg.hidden_size,
                          (cfg.patch_size, cfg.patch_size),
                          strides=(cfg.patch_size, cfg.patch_size),
                          use_bias=False, dtype=cfg.dtype,
                          name="patch_embedding")(pixel_values)
        patches = patches.reshape(B, -1, cfg.hidden_size)
        cls = self.param("class_embedding", nn.initializers.zeros,
                         (cfg.hidden_size,))
        x = jnp.concatenate(
            [jnp.broadcast_to(cls, (B, 1, cfg.hidden_size)), patches], axis=1)
        pos = self.param("position_embedding", nn.initializers.zeros,
                         (x.shape[1], cfg.hidden_size))
        x = x + pos[None]
        x = nn.LayerNorm(dtype=cfg.dtype, name="pre_layrnorm")(x)
        hidden = None
        for i in range(cfg.num_layers):
            if return_hidden and i == cfg.num_layers - 1:
                hidden = x  # penultimate layer output
            x = CLIPLayer(cfg.hidden_size, cfg.intermediate_size,
                          cfg.num_heads, cfg.act, cfg.dtype,
                          name=f"layers_{i}")(x)
        if return_hidden:
            return hidden
        pooled = nn.LayerNorm(dtype=cfg.dtype, name="post_layernorm")(x[:, 0])
        return nn.Dense(cfg.projection_dim, use_bias=False, dtype=cfg.dtype,
                        name="visual_projection")(pooled)
