"""Weight-converter and tokenizer tests (no real checkpoints needed)."""
import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest


def test_convert_unet_key_mapping():
    """Diffusers-style keys land at the right flax paths with transposed
    layouts."""
    from mvedit_tpu.models.diffusion.weights import convert_unet
    rng = np.random.default_rng(0)
    sd = {
        "time_embedding.linear_1.weight": rng.normal(size=(128, 32)),
        "time_embedding.linear_1.bias": rng.normal(size=(128,)),
        "conv_in.weight": rng.normal(size=(32, 4, 3, 3)),
        "conv_in.bias": rng.normal(size=(32,)),
        "down_blocks.0.resnets.0.norm1.weight": rng.normal(size=(32,)),
        "down_blocks.0.resnets.0.norm1.bias": rng.normal(size=(32,)),
        "down_blocks.0.resnets.0.conv1.weight":
            rng.normal(size=(32, 32, 3, 3)),
        "down_blocks.0.resnets.0.conv1.bias": rng.normal(size=(32,)),
        "down_blocks.0.attentions.1.transformer_blocks.0.attn1.to_q.weight":
            rng.normal(size=(32, 32)),
        "down_blocks.0.attentions.1.transformer_blocks.0.attn1.to_out.0"
        ".weight": rng.normal(size=(32, 32)),
        "down_blocks.0.attentions.1.transformer_blocks.0.ff.net.0.proj"
        ".weight": rng.normal(size=(256, 32)),
        "down_blocks.0.attentions.1.proj_in.weight":
            rng.normal(size=(32, 32, 1, 1)),
        "mid_block.resnets.0.conv2.weight": rng.normal(size=(64, 64, 3, 3)),
        "up_blocks.1.upsamplers.0.conv.weight":
            rng.normal(size=(32, 32, 3, 3)),
        "conv_out.weight": rng.normal(size=(4, 32, 3, 3)),
        "conv_out.bias": rng.normal(size=(4,)),
    }
    tree, unmatched = convert_unet(sd, strict=True)
    assert not unmatched
    # linear transposed
    assert tree["time_embedding_linear_1"]["kernel"].shape == (32, 128)
    # conv OIHW -> HWIO
    assert tree["conv_in"]["kernel"].shape == (3, 3, 4, 32)
    # norm weight -> scale
    assert "scale" in tree["down_0_resnets_0"]["norm1"]
    at = tree["down_0_attentions_1"]["transformer_blocks_0"]
    assert at["attn1"]["to_q"]["kernel"].shape == (32, 32)
    assert at["attn1"]["to_out_0"]["kernel"].shape == (32, 32)
    assert at["ff"]["net_0_proj"]["kernel"].shape == (32, 256)
    assert tree["down_0_attentions_1"]["proj_in"]["kernel"].shape \
        == (1, 1, 32, 32)
    assert tree["mid_resnets_0"]["conv2"]["kernel"].shape == (3, 3, 64, 64)
    assert tree["up_1_upsample"]["conv"]["kernel"].shape == (3, 3, 32, 32)


def test_convert_clip_text_embeddings():
    from mvedit_tpu.models.diffusion.weights import convert_clip_text
    rng = np.random.default_rng(1)
    sd = {
        "text_model.embeddings.token_embedding.weight":
            rng.normal(size=(100, 32)),
        "text_model.embeddings.position_embedding.weight":
            rng.normal(size=(16, 32)),
        "text_model.encoder.layers.0.self_attn.q_proj.weight":
            rng.normal(size=(32, 32)),
        "text_model.encoder.layers.0.self_attn.q_proj.bias":
            rng.normal(size=(32,)),
        "text_model.encoder.layers.0.mlp.fc1.weight":
            rng.normal(size=(64, 32)),
        "text_model.encoder.layers.0.layer_norm1.weight":
            rng.normal(size=(32,)),
        "text_model.final_layer_norm.weight": rng.normal(size=(32,)),
        "text_model.final_layer_norm.bias": rng.normal(size=(32,)),
    }
    tree, unmatched = convert_clip_text(sd, strict=True)
    assert not unmatched
    assert tree["token_embedding"]["embedding"].shape == (100, 32)
    assert tree["position_embedding"].shape == (16, 32)
    assert tree["layers_0"]["q_proj"]["kernel"].shape == (32, 32)
    assert tree["layers_0"]["fc1"]["kernel"].shape == (32, 64)


def test_clip_bpe_tokenizer(tmp_path):
    """Minimal vocab exercising merges + byte encoding."""
    from mvedit_tpu.models.diffusion.tokenizer import CLIPTokenizer
    # vocab: single-char tokens + merged 'he' + word-final tokens
    tokens = ["h", "e", "l", "o", "he", "o</w>", "l</w>", "he</w>",
              "llo</w>", "ll", "hello</w>", "<|startoftext|>",
              "<|endoftext|>"]
    vocab = {t: i for i, t in enumerate(tokens)}
    merges = ["h e", "l l", "ll o</w>", "he llo</w>"]
    vp = tmp_path / "vocab.json"
    mp = tmp_path / "merges.txt"
    vp.write_text(json.dumps(vocab))
    mp.write_text("#version\n" + "\n".join(merges))
    tok = CLIPTokenizer(str(vp), str(mp), max_length=8)
    ids = tok(["hello hello"])
    assert ids.shape == (1, 8)
    assert ids[0, 0] == vocab["<|startoftext|>"]
    assert ids[0, 1] == vocab["hello</w>"]
    assert ids[0, 2] == vocab["hello</w>"]
    assert ids[0, 3] == vocab["<|endoftext|>"]


def test_lora_merge_changes_attention_only():
    from mvedit_tpu.models.diffusion.lora import init_lora, merge_lora
    params = {
        "attn": {"to_q": {"kernel": jnp.zeros((8, 8))},
                 "to_k": {"kernel": jnp.zeros((8, 8))}},
        "ff": {"net_2": {"kernel": jnp.zeros((8, 8))}},
    }
    lora = init_lora(jax.random.PRNGKey(0), params, rank=2)
    assert len(lora) == 2  # only to_q / to_k
    # nonzero B to make the delta visible
    for k in lora:
        lora[k]["b"] = jnp.ones_like(lora[k]["b"])
    merged = merge_lora(params, lora, scale=1.0)
    assert float(jnp.abs(merged["attn"]["to_q"]["kernel"]).sum()) > 0
    assert float(jnp.abs(merged["ff"]["net_2"]["kernel"]).sum()) == 0
    # original untouched
    assert float(jnp.abs(params["attn"]["to_q"]["kernel"]).sum()) == 0
