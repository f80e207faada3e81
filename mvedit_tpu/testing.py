"""Tiny random-weight model bundles for tests and multi-chip dryruns.

The shapes mirror the production SD1.5 stack (NHWC UNet + ControlNets +
VAE + schedule) at toy sizes so full pipelines compile and run in seconds
on the 8-device CPU test mesh.
"""
import types

import jax
import jax.numpy as jnp

from .models.diffusion import (UNetConfig, UNet2DCondition, VAEConfig,
                               AutoencoderKL, ControlNet, schedulers as S)
from .models.fields import INGPConfig
from .ops.hash_grid import HashGridConfig

__all__ = ["TINY_UNET", "TINY_VAE", "TINY_INGP", "make_tiny_models",
           "make_tiny_mvedit_cfg"]

TINY_UNET = UNetConfig(block_out_channels=(32, 64), layers_per_block=1,
                       attn_down=(True, False), cross_attention_dim=32,
                       num_heads=4, dtype=jnp.float32)
TINY_VAE = VAEConfig(block_out_channels=(32, 64), layers_per_block=1,
                     dtype=jnp.float32)
TINY_INGP = INGPConfig(hash=HashGridConfig(
    n_levels=4, base_resolution=4, max_resolution=32, log2_hashmap_size=12))


def make_tiny_models(key, n_cn=2, hint_strides=1):
    """UNet + n_cn ControlNets + VAE + schedule namespace (random init)."""
    unet = UNet2DCondition(TINY_UNET)
    vae = AutoencoderKL(TINY_VAE)
    cns = tuple(ControlNet(TINY_UNET, hint_strides=hint_strides)
                for _ in range(n_cn))
    x = jnp.zeros((1, 8, 8, 4))
    t = jnp.zeros((1,), jnp.int32)
    ctx = jnp.zeros((1, 8, 32))
    hint = jnp.zeros((1, 8 * 2 ** hint_strides, 8 * 2 ** hint_strides, 3))
    keys = jax.random.split(key, 3 + n_cn)
    m = types.SimpleNamespace()
    m.unet = unet
    m.unet_params = unet.init(keys[0], x, t, ctx)["params"]
    m.vae = vae
    m.vae_params = vae.init(keys[1], jnp.zeros((1, 64, 64, 3)))["params"]
    m.controlnets = cns
    m.cn_params = [cn.init(k, x, t, ctx, hint)["params"]
                   for cn, k in zip(cns, keys[2:])]
    m.schedule = S.sd_schedule()
    m.segment_fn = None
    return m


def make_tiny_mvedit_cfg(num_views=4, render_size=32, steps=3,
                         **overrides):
    from .pipelines import MVEdit3DConfig
    from .models.volume_renderer import RenderConfig
    kw = dict(
        num_views=num_views, mid_num_views=num_views,
        min_num_views=num_views,
        render_size=render_size, render_size_ramp=False,
        latent_size=render_size // 2, diffusion_steps=steps,
        n_inverse_steps=2, init_inverse_steps=2,
        tet_resolution=8, tet_init_inverse_steps=2,
        patch_size=8, patch_bs=1, ingp=TINY_INGP,
        render=RenderConfig(num_samples=8, grid_size=8))
    kw.update(overrides)
    return MVEdit3DConfig(**kw)
