"""Weight-converter and tokenizer tests (no real checkpoints needed)."""
import os
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


def test_convert_tracer_key_mapping():
    """TRACER converter: torch keys from the reference layout
    (tracerb7/{efficientnet,tracer,att_modules,conv_modules}.py) land at
    the right flax paths with the right layouts."""
    import numpy as np
    from mvedit_tpu.models.segmentors.tracer import convert_tracer
    sd = {
        "model.encoder._conv_stem.weight": np.zeros((64, 3, 3, 3)),
        "encoder._bn0.weight": np.zeros((64,)),
        "encoder._bn0.running_var": np.ones((64,)),
        "encoder._blocks.3._depthwise_conv.weight": np.zeros((192, 1, 5, 5)),
        "encoder._blocks.3._bn1.running_mean": np.zeros((192,)),
        "encoder._blocks.3._se_reduce.weight": np.zeros((8, 192, 1, 1)),
        "encoder._blocks.3._se_reduce.bias": np.zeros((8,)),
        "encoder._blocks.3._project_conv.weight": np.zeros((48, 192, 1, 1)),
        "encoder._blocks.3._bn2.num_batches_tracked": np.zeros(()),
        "rfb2.branch1.2.conv.weight": np.zeros((32, 32, 3, 1)),
        "rfb2.branch1.2.bn.running_mean": np.zeros((32,)),
        "agg.UAM.norm.0.weight": np.zeros((224,)),
        "agg.UAM.channel_q.weight": np.zeros((224, 224, 1, 1)),
        "agg.conv_upsample1.conv.weight": np.zeros((64, 128, 3, 3)),
        "ObjectAttention2.DWSConv.DWConv.weight": np.zeros((80, 1, 3, 3)),
        "ObjectAttention2.DWSConv.bn.weight": np.zeros((80,)),
        "ObjectAttention2.DWSConv.PWConv.weight": np.zeros((40, 80, 1, 1)),
        "ObjectAttention2.DWSConv.bn2.weight": np.zeros((40,)),
        "ObjectAttention2.DWConv1.0.DWConv.weight": np.zeros((40, 1, 1, 1)),
        "ObjectAttention2.DWConv1.1.conv.weight": np.zeros((10, 40, 1, 1)),
        "ObjectAttention2.conv1.conv.weight": np.zeros((1, 40, 1, 1)),
    }
    tree, unmatched = convert_tracer(sd)
    assert unmatched == [], unmatched
    p = tree["params"]
    assert p["encoder"]["stem_conv"]["kernel"].shape == (3, 3, 3, 64)
    assert p["encoder"]["stem_bn"]["scale"].shape == (64,)
    assert p["encoder"]["stem_bn"]["var"].shape == (64,)
    blk = p["encoder"]["blocks_3"]
    assert blk["depthwise_conv"]["kernel"].shape == (5, 5, 1, 192)
    assert blk["bn1"]["mean"].shape == (192,)
    assert blk["se_reduce"]["kernel"].shape == (1, 1, 192, 8)
    assert blk["se_reduce"]["bias"].shape == (8,)
    assert blk["project_conv"]["kernel"].shape == (1, 1, 192, 48)
    assert p["rfb2"]["branch1_2"]["conv"]["kernel"].shape == (3, 1, 32, 32)
    assert p["rfb2"]["branch1_2"]["bn"]["mean"].shape == (32,)
    assert p["agg"]["UAM"]["norm_bn"]["scale"].shape == (224,)
    assert p["agg"]["UAM"]["channel_q"]["kernel"].shape == (1, 1, 224, 224)
    oa = p["ObjectAttention2"]
    assert oa["DWSConv"]["depthwise"]["kernel"].shape == (3, 3, 1, 80)
    assert oa["DWSConv"]["bn1"]["scale"].shape == (80,)
    assert oa["DWSConv"]["pointwise"]["kernel"].shape == (1, 1, 80, 40)
    assert oa["DWSConv"]["bn2"]["scale"].shape == (40,)
    assert oa["DWConv1_0"]["conv"]["kernel"].shape == (1, 1, 1, 40)
    assert oa["DWConv1_1"]["conv"]["kernel"].shape == (1, 1, 40, 10)
    assert oa["conv1"]["conv"]["kernel"].shape == (1, 1, 40, 1)


def test_convert_ip_adapter_grafts_into_unet():
    """IP-Adapter converter: synthetic HF state dict -> ip branches merged
    into the UNet tree -> the UNet applies with ip mode (paths must line
    up exactly or flax raises)."""
    import numpy as np
    import jax
    import jax.numpy as jnp
    from mvedit_tpu.testing import make_tiny_models, TINY_UNET
    from mvedit_tpu.models.diffusion.weights import (convert_ip_adapter,
                                                     merge_params,
                                                     _attn2_paths)
    from mvedit_tpu.models.diffusion import AttnMode

    m = make_tiny_models(jax.random.PRNGKey(0))
    paths = _attn2_paths(TINY_UNET)
    inner = TINY_UNET.num_heads * \
        ((TINY_UNET.block_out_channels[0] // TINY_UNET.num_heads))
    # per-path inner dims vary with channel width; read from the tree
    def inner_dim(path):
        node = m.unet_params
        for p in path:
            node = node[p]
        return node["to_q"]["kernel"].shape[1]

    ctx_dim = TINY_UNET.cross_attention_dim
    sd = {"image_proj.proj.weight":
          np.zeros((ctx_dim * 4, 16), np.float32),
          "image_proj.proj.bias": np.zeros((ctx_dim * 4,), np.float32),
          "image_proj.norm.weight": np.ones((ctx_dim,), np.float32),
          "image_proj.norm.bias": np.zeros((ctx_dim,), np.float32)}
    for i, path in enumerate(paths):
        d = inner_dim(path)
        sd[f"ip_adapter.{2 * i + 1}.to_k_ip.weight"] = \
            0.01 * np.ones((d, ctx_dim), np.float32)
        sd[f"ip_adapter.{2 * i + 1}.to_v_ip.weight"] = \
            0.01 * np.ones((d, ctx_dim), np.float32)
    proj, patch, unmatched = convert_ip_adapter(sd, TINY_UNET)
    assert unmatched == [], unmatched
    merged = merge_params(m.unet_params, patch)
    x = jnp.zeros((2, 8, 8, 4))
    t = jnp.zeros((2,), jnp.int32)
    ctx = jnp.zeros((2, 8, ctx_dim))
    ip_ctx = jnp.zeros((2, 4, ctx_dim))
    out = m.unet.apply({"params": merged}, x, t, ctx,
                       mode=AttnMode(ip_tokens=4), ip_context=ip_ctx)
    assert np.isfinite(np.asarray(out)).all()


def test_huggingface_scheme_resolution(tmp_path, monkeypatch):
    """huggingface:// refs resolve against the local HF cache (offline);
    misses raise a clear zero-egress error (utils/hub.py)."""
    import pytest
    from mvedit_tpu.utils.hub import resolve_checkpoint, is_hub_path

    snap = (tmp_path / "hub" / "models--org--repo" / "snapshots" / "abc123")
    (snap / "unet").mkdir(parents=True)
    f = snap / "unet" / "model.safetensors"
    f.write_bytes(b"x")
    monkeypatch.setenv("HF_HOME", str(tmp_path))

    assert not is_hub_path("/local/path")
    assert resolve_checkpoint("/local/path") == "/local/path"
    got = resolve_checkpoint("huggingface://org/repo/unet/model.safetensors")
    assert got == str(f)
    assert resolve_checkpoint("huggingface://org/repo") == str(snap)
    with pytest.raises(FileNotFoundError, match="egress"):
        resolve_checkpoint("huggingface://org/missing/file.bin")
    with pytest.raises(ValueError):
        resolve_checkpoint("huggingface://onlyorg")

    # refs/main must win over a newer-mtime stale snapshot
    import os
    stale = snap.parent / "stale99"
    (stale / "unet").mkdir(parents=True)
    (stale / "unet" / "model.safetensors").write_bytes(b"y")
    os.utime(stale, (4e9, 4e9))  # newest mtime
    refs = snap.parent.parent / "refs"
    refs.mkdir(exist_ok=True)
    (refs / "main").write_text("abc123")
    assert resolve_checkpoint("huggingface://org/repo") == str(snap)
    got = resolve_checkpoint("huggingface://org/repo/unet/model.safetensors")
    assert got == str(f)

    # a filename that escapes the snapshot directory must be rejected
    (tmp_path / "hub" / "secret.txt").write_text("s")
    with pytest.raises(ValueError, match="traversal"):
        resolve_checkpoint("huggingface://org/repo/../../secret.txt")


def test_convert_weights_cli_dry_run(tmp_path):
    """Drive tools/convert_weights.py end-to-end on a SYNTHETIC torch
    checkpoint (real diffusers key names, torch.save .bin format): torch
    load -> converter -> npz write -> load_params_npz roundtrip. This is
    the offline stand-in for the real-checkpoint conversion that zero
    egress prevents (VERDICT r4 item 8)."""
    import subprocess
    import sys
    import torch

    rng = np.random.default_rng(0)
    sd = {
        "time_embedding.linear_1.weight": rng.normal(size=(128, 32)),
        "time_embedding.linear_1.bias": rng.normal(size=(128,)),
        "conv_in.weight": rng.normal(size=(32, 4, 3, 3)),
        "conv_in.bias": rng.normal(size=(32,)),
        "down_blocks.0.resnets.0.norm1.weight": rng.normal(size=(32,)),
        "down_blocks.0.resnets.0.norm1.bias": rng.normal(size=(32,)),
        "conv_out.weight": rng.normal(size=(4, 32, 3, 3)),
        "conv_out.bias": rng.normal(size=(4,)),
    }
    src = tmp_path / "unet"
    src.mkdir()
    torch.save({k: torch.from_numpy(np.asarray(v, np.float32))
                for k, v in sd.items()},
               src / "diffusion_pytorch_model.bin")
    out = tmp_path / "out" / "unet.npz"
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    r = subprocess.run(
        [sys.executable, os.path.join(repo, "tools", "convert_weights.py"),
         "--src", str(src), "--kind", "unet", "--out", str(out)],
        capture_output=True, text=True, env={**os.environ,
                                             "JAX_PLATFORMS": "cpu"})
    assert r.returncode == 0, r.stderr
    assert "0 unmatched" in r.stdout
    sys.path.insert(0, os.path.join(repo, "tools"))
    try:
        from convert_weights import load_params_npz
        tree = load_params_npz(str(out))
    finally:
        sys.path.pop(0)
    assert tree["conv_in"]["kernel"].shape == (3, 3, 4, 32)
    assert tree["time_embedding_linear_1"]["kernel"].shape == (32, 128)
    np.testing.assert_allclose(
        tree["conv_in"]["kernel"],
        np.asarray(sd["conv_in.weight"], np.float32).transpose(2, 3, 1, 0),
        rtol=1e-6)
