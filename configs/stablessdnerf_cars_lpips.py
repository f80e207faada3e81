"""StableSSDNeRF recipe (ref configs/sd/stablessdnerf_cars_lpips.py):
text-conditioned triplane diffusion with a frozen SD2.1 UNet + trainable
LoRA (rank 32) as the denoiser, frozen SD2.1 CLIP text encoder + LoRA
(rank 4), patch-wise rendering loss with LPIPS.

The (3, 4, 40, 40) code rides through the UNet as a 4-channel 120x40
latent image (ref code_permute=(1,0,2,3) + code_reshape=(4,120,40));
text conditioning enters through the cross-attention `cond` argument.
"""
import os
import sys

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from mvedit_tpu.models.ssdnerf import SSDNeRFConfig
from mvedit_tpu.models.triplane import TriPlaneConfig
from mvedit_tpu.models.volume_renderer import RenderConfig

ssdnerf_config = SSDNeRFConfig(
    code_shape=(3, 4, 40, 40),
    latent_shape=(3, 4, 40, 40),
    triplane=TriPlaneConfig(
        n_channels=4,
        base_layers=(12, 64),
        density_layers=(64, 1),
        color_layers=(64, 3),
        dir_layers=(16, 64),
        bound=0.5),
    render=RenderConfig(num_samples=96, bound=0.5, grid_size=32),
    n_rays=32 * 32,          # one 32x32 patch per scene (LPIPS needs
                             # contiguous patches)
    code_lr=0.04,
    decoder_lr=1e-3,
    denoiser_lr=1e-4,
)

train_config = dict(
    batch_size=8,
    max_iters=100000,
    log_interval=50,
    ckpt_interval=2000,
    dataset="cars",
    patch_size=32,
    use_lpips=True,
    lpips_weight=1.2,
)


def build_denoiser(key):
    """Frozen SD2.1 UNet + trainable LoRA rank 32 on the attention
    projections (ref UNetLoRAWrapper, lib/models/architecture/
    diffusers.py:240-318). Only the LoRA pytree lives in the train state;
    the base weights are a closure constant (converted checkpoint when
    present, else seeded)."""
    from mvedit_tpu.models.diffusion import (UNet2DCondition, SD21_UNET,
                                             AttnMode)
    from mvedit_tpu.models.diffusion.lora import init_lora, merge_lora

    net = UNet2DCondition(SD21_UNET)
    P, C, H, W = ssdnerf_config.latent_shape
    x0 = jnp.zeros((1, P * H, W, C))
    t0 = jnp.zeros((1,), jnp.int32)
    ctx0 = jnp.zeros((1, 77, 1024))
    base = jax.jit(lambda k: net.init(k, x0, t0, ctx0))(key)["params"]
    lora = init_lora(jax.random.PRNGKey(0), base, rank=32)

    def apply_fn(lora_params, x, t, cond=None):
        B = x.shape[0]
        # (B, 3, 4, 40, 40) -> 4-channel (120, 40) latent image
        h = x.transpose(0, 1, 3, 4, 2).reshape(B, P * H, W, C)
        if cond is None:
            cond = jnp.zeros((B, 77, 1024), h.dtype)
        params = merge_lora(base, lora_params)
        out = net.apply({"params": params}, h, t, cond, mode=AttnMode())
        return out.reshape(B, P, H, W, C).transpose(0, 1, 4, 2, 3)

    return net, apply_fn, lora


def make_cond_fn():
    """Frozen SD2.1 CLIP text encoder (+ LoRA hook) mapping captions to
    (B, 77, 1024) embeds (ref CLIPLoRAWrapper). Weights are converted
    checkpoints when available, random otherwise."""
    from mvedit_tpu.models.diffusion.clip import (CLIPTextConfig,
                                                  CLIPTextModel)
    from mvedit_tpu.models.diffusion.tokenizer import (CLIPTokenizer,
                                                       HashTokenizer)

    cfg = CLIPTextConfig(hidden_size=1024, intermediate_size=4096,
                         num_layers=23, num_heads=16, act="gelu")
    net = CLIPTextModel(cfg)
    ckpt = os.environ.get("MVEDIT_CHECKPOINT_DIR")
    tok_dir = ckpt and os.path.join(ckpt, "tokenizer")
    if tok_dir and os.path.exists(os.path.join(tok_dir, "vocab.json")):
        tok = CLIPTokenizer(os.path.join(tok_dir, "vocab.json"),
                            os.path.join(tok_dir, "merges.txt"))
    else:
        tok = HashTokenizer()
    params = net.init(jax.random.PRNGKey(1),
                      jnp.zeros((1, 77), jnp.int32))["params"]
    enc = jax.jit(lambda p, ids: net.apply({"params": p}, ids))

    def cond_fn(captions):
        ids = jnp.asarray(tok(list(captions)))
        return enc(params, ids)

    return cond_fn
