"""Torch checkpoint -> flax params conversion (one tool + manifest).

The reference loads every model from HF checkpoints through
diffusers/transformers (`lib/apis/adapter3d.py:159-423` model zoo). Here one
rule-based converter maps state_dict keys onto the mvedit_tpu module trees
(whose names were chosen to make this mechanical):

  UNet/ControlNet : down_blocks.0.resnets.1.* -> down_0_resnets_1.*
  VAE             : encoder.down_blocks... -> encoder/down_...
  CLIP text/vision: text_model.encoder.layers.N.* -> layers_N.*

Tensor layout rules: Linear (O,I)->kernel (I,O); Conv (O,I,kh,kw)->
(kh,kw,I,O); Norm weight->scale; Embedding weight->embedding.

Works on anything dict-like with numpy-convertible values (torch state_dict,
safetensors dict); torch itself is only needed to *load* .bin files.
"""
import re

import numpy as np

__all__ = ["convert_unet", "convert_controlnet", "convert_vae",
           "convert_clip_text", "convert_clip_vision", "load_torch_state",
           "unflatten", "convert_ip_adapter", "merge_params"]


def load_torch_state(path):
    """Load a torch .bin/.pt/.safetensors checkpoint into {key: np.ndarray}.

    Accepts huggingface://org/repo/file refs (resolved against the local
    HF cache — see utils/hub.py; reference configs' load_from scheme)."""
    from ...utils.hub import is_hub_path, resolve_checkpoint
    if is_hub_path(path):
        path = resolve_checkpoint(path)
    if str(path).endswith(".safetensors"):
        from safetensors import safe_open
        out = {}
        with safe_open(path, framework="np") as f:
            for k in f.keys():
                out[k] = f.get_tensor(k)
        return out
    import torch
    sd = torch.load(path, map_location="cpu", weights_only=True)
    if "state_dict" in sd:
        sd = sd["state_dict"]
    return {k: v.float().numpy() if v.dtype == torch.bfloat16
            else v.numpy() for k, v in sd.items()}


def unflatten(flat):
    """{'a.b.c': arr} -> nested dict params tree."""
    tree = {}
    for k, v in flat.items():
        parts = k.split("/")
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = v
    return tree


def _tensor(name, arr):
    """Apply layout rules by param name + rank."""
    arr = np.asarray(arr)
    if name == "weight":
        if arr.ndim == 4:   # conv OIHW -> HWIO
            return "kernel", arr.transpose(2, 3, 1, 0)
        if arr.ndim == 2:   # linear
            return "kernel", arr.T
        if arr.ndim == 1:   # norm
            return "scale", arr
    if name == "bias":
        return "bias", arr
    return name, arr


def _convert(sd, rules, strict=True):
    """Apply (regex, template) rules to each key; collect into flat tree."""
    flat = {}
    unmatched = []
    for key, val in sd.items():
        parts = key.rsplit(".", 1)
        if len(parts) != 2:
            unmatched.append(key)
            continue
        module, pname = parts
        new_module = None
        for pat, repl in rules:
            m = re.fullmatch(pat, module)
            if m:
                new_module = m.expand(repl)
                break
        if new_module is None:
            unmatched.append(key)
            continue
        new_p, arr = _tensor(pname, val)
        flat[f"{new_module}/{new_p}"] = arr
    if strict and unmatched:
        raise KeyError(f"{len(unmatched)} unconverted keys, e.g. "
                       f"{unmatched[:8]}")
    return unflatten(flat), unmatched


# inner attention-tower patterns with {G} placeholders renumbered per prefix
_ATTN_INNER = [
    (r"\.transformer_blocks\.(\d+)\.(attn[12])\.to_out\.0",
     "/transformer_blocks_{G1}/{G2}/to_out_0", 2),
    (r"\.transformer_blocks\.(\d+)\.(attn[12])\.(to_[qkv])",
     "/transformer_blocks_{G1}/{G2}/{G3}", 3),
    (r"\.transformer_blocks\.(\d+)\.(attn[12])\.processor"
     r"\.(ip_to_[kv])", "/transformer_blocks_{G1}/{G2}/{G3}", 3),
    (r"\.transformer_blocks\.(\d+)\.ff\.net\.0\.proj",
     "/transformer_blocks_{G1}/ff/net_0_proj", 1),
    (r"\.transformer_blocks\.(\d+)\.ff\.net\.2",
     "/transformer_blocks_{G1}/ff/net_2", 1),
    (r"\.transformer_blocks\.(\d+)\.(norm[123])",
     "/transformer_blocks_{G1}/{G2}", 2),
    (r"\.proj_in", "/proj_in", 0),
    (r"\.proj_out", "/proj_out", 0),
    (r"\.norm", "/norm", 0),
]


def _renumber(template, offset):
    """'{G1}' -> '\\<1+offset>' etc."""
    out = template
    for g in range(9, 0, -1):
        out = out.replace("{G%d}" % g, "\\%d" % (g + offset))
    return out


def _unet_body_rules(prefix=""):
    p = re.escape(prefix)
    rules = [
        (p + r"time_embedding\.linear_(\d)", r"time_embedding_linear_\1"),
        (p + r"conv_in", r"conv_in"),
        (p + r"conv_norm_out", r"conv_norm_out"),
        (p + r"conv_out", r"conv_out"),
        (p + r"down_blocks\.(\d+)\.resnets\.(\d+)\.(\w+)",
         r"down_\1_resnets_\2/\3"),
        (p + r"down_blocks\.(\d+)\.downsamplers\.0\.conv",
         r"down_\1_downsample/conv"),
        (p + r"up_blocks\.(\d+)\.resnets\.(\d+)\.(\w+)",
         r"up_\1_resnets_\2/\3"),
        (p + r"up_blocks\.(\d+)\.upsamplers\.0\.conv",
         r"up_\1_upsample/conv"),
        (p + r"mid_block\.resnets\.(\d+)\.(\w+)", r"mid_resnets_\1/\2"),
    ]
    # attention towers: rewrite the block prefix, renumber inner groups
    for pat, repl, _ in _ATTN_INNER:
        rules.append((
            p + r"down_blocks\.(\d+)\.attentions\.(\d+)" + pat,
            r"down_\1_attentions_\2" + _renumber(repl, 2)))
        rules.append((
            p + r"up_blocks\.(\d+)\.attentions\.(\d+)" + pat,
            r"up_\1_attentions_\2" + _renumber(repl, 2)))
        rules.append((
            p + r"mid_block\.attentions\.(\d+)" + pat,
            r"mid_attentions_\1" + _renumber(repl, 1)))
    return rules


def convert_unet(sd, strict=False):
    """diffusers UNet2DConditionModel state_dict -> flax params tree."""
    tree, unmatched = _convert(sd, _unet_body_rules(), strict=strict)
    return tree, unmatched


def convert_controlnet(sd, strict=False):
    rules = _unet_body_rules() + [
        (r"controlnet_cond_embedding\.conv_in", r"cond_conv_in"),
        (r"controlnet_cond_embedding\.blocks\.(\d+)", r"cond_blocks_\1"),
        (r"controlnet_cond_embedding\.conv_out", r"cond_conv_out"),
        (r"controlnet_down_blocks\.(\d+)", r"controlnet_down_blocks_\1"),
        (r"controlnet_mid_block", r"controlnet_mid_block"),
    ]
    return _convert(sd, rules, strict=strict)


def convert_vae(sd, strict=False):
    def side_rules(side):
        s = re.escape(side)
        updown = "down" if side == "encoder" else "up"
        return [
            (s + r"\.conv_in", side + r"/conv_in"),
            (s + r"\.conv_norm_out", side + r"/conv_norm_out"),
            (s + r"\.conv_out", side + r"/conv_out"),
            (s + rf"\.{updown}_blocks\.(\d+)\.resnets\.(\d+)\.(\w+)",
             side + rf"/{updown}_\1_resnets_\2/\3"),
            (s + r"\.down_blocks\.(\d+)\.downsamplers\.0\.conv",
             side + r"/down_\1_downsample"),
            (s + r"\.up_blocks\.(\d+)\.upsamplers\.0\.conv",
             side + r"/up_\1_upsample"),
            (s + r"\.mid_block\.resnets\.(\d+)\.(\w+)",
             side + r"/mid_resnets_\1/\2"),
            (s + r"\.mid_block\.attentions\.0\.(group_norm|to_q|to_k|to_v)",
             side + r"/mid_attentions_0/\1"),
            (s + r"\.mid_block\.attentions\.0\.to_out\.0",
             side + r"/mid_attentions_0/to_out_0"),
        ]
    rules = side_rules("encoder") + side_rules("decoder") + [
        (r"quant_conv", r"encoder/quant_conv"),
        (r"post_quant_conv", r"decoder/post_quant_conv"),
    ]
    return _convert(sd, rules, strict=strict)


def _clip_layer_rules(prefix):
    p = re.escape(prefix)
    return [
        (p + r"encoder\.layers\.(\d+)\.self_attn\.([qkv]_proj|out_proj)",
         r"layers_\1/\2"),
        (p + r"encoder\.layers\.(\d+)\.layer_norm([12])",
         r"layers_\1/layer_norm\2"),
        (p + r"encoder\.layers\.(\d+)\.mlp\.fc([12])", r"layers_\1/fc\2"),
    ]


def convert_clip_text(sd, strict=False):
    rules = _clip_layer_rules("text_model.") + [
        (r"text_model\.embeddings\.token_embedding", r"token_embedding"),
        (r"text_model\.final_layer_norm", r"final_layer_norm"),
    ]
    tree, unmatched = _convert(
        {k: v for k, v in sd.items()
         if "position_ids" not in k
         and "embeddings.position_embedding" not in k
         and not k.startswith("text_projection")}, rules, strict=strict)
    # special cases
    if "text_model.embeddings.position_embedding.weight" in sd:
        tree["position_embedding"] = np.asarray(
            sd["text_model.embeddings.position_embedding.weight"])
    if "token_embedding" in tree and "kernel" in tree["token_embedding"]:
        # Embed wants (vocab, dim) under 'embedding', not a transposed kernel
        tree["token_embedding"] = {
            "embedding": tree["token_embedding"]["kernel"].T}
    return tree, unmatched


def convert_clip_vision(sd, strict=False):
    rules = _clip_layer_rules("vision_model.") + [
        (r"vision_model\.embeddings\.patch_embedding", r"patch_embedding"),
        (r"vision_model\.pre_layrnorm", r"pre_layrnorm"),
        (r"vision_model\.post_layernorm", r"post_layernorm"),
        (r"visual_projection", r"visual_projection"),
    ]
    keep = {k: v for k, v in sd.items()
            if "position_ids" not in k
            and "class_embedding" not in k
            and "embeddings.position_embedding" not in k}
    tree, unmatched = _convert(keep, rules, strict=strict)
    if "vision_model.embeddings.class_embedding" in sd:
        tree["class_embedding"] = np.asarray(
            sd["vision_model.embeddings.class_embedding"])
    if "vision_model.embeddings.position_embedding.weight" in sd:
        tree["position_embedding"] = np.asarray(
            sd["vision_model.embeddings.position_embedding.weight"])
    return tree, unmatched


def _attn2_paths(cfg):
    """My UNet's cross-attn module paths in diffusers attn_processors
    order — down blocks, then UP blocks, then mid (torch named_children
    order: the ModuleLists are registered before mid_block in
    UNet2DConditionModel.__init__) — the order the HF IP-Adapter
    checkpoint numbers its `ip_adapter.{i}` entries by
    (ip_adapter/ip_adapter.py set_ip_adapter)."""
    paths = []
    n_blocks = len(cfg.block_out_channels)
    depth = getattr(cfg, "transformer_depth", 1)

    def tb(base):
        for d in range(depth):
            paths.append(base + (f"transformer_blocks_{d}", "attn2"))

    for bi in range(n_blocks):
        if cfg.attn_down[bi]:
            for li in range(cfg.layers_per_block):
                tb((f"down_{bi}_attentions_{li}",))
    for ui, bi in enumerate(reversed(range(n_blocks))):
        if cfg.attn_down[bi]:
            for li in range(cfg.layers_per_block + 1):
                tb((f"up_{ui}_attentions_{li}",))
    tb(("mid_attentions_0",))
    return paths


def convert_ip_adapter(sd, cfg, plus=False):
    """HF IP-Adapter checkpoint (h94/IP-Adapter ip-adapter_sd15.bin layout:
    image_proj.* + ip_adapter.{2k+1}.to_{k,v}_ip.weight) ->
    (proj_params, unet_ip_patch, unmatched).

    `unet_ip_patch` holds {attn2 path: {ip_to_k/ip_to_v: {kernel}}} to be
    merged into the UNet params (merge_params)."""
    unmatched = []
    proj = {}
    for k, v in sd.items():
        if k == "image_proj.proj.weight":
            proj.setdefault("proj", {})["kernel"] = np.asarray(v).T
        elif k == "image_proj.proj.bias":
            proj.setdefault("proj", {})["bias"] = np.asarray(v)
        elif k == "image_proj.norm.weight":
            proj.setdefault("norm", {})["scale"] = np.asarray(v)
        elif k == "image_proj.norm.bias":
            proj.setdefault("norm", {})["bias"] = np.asarray(v)
        elif not k.startswith("ip_adapter."):
            if not k.startswith("image_proj."):
                unmatched.append(k)
    # ip_adapter entries: numbered over ALL attn processors; only attn2
    # (odd indices) carry weights
    entries = {}
    for k, v in sd.items():
        m = re.match(r"ip_adapter\.(\d+)\.to_([kv])_ip\.weight$", k)
        if m:
            entries.setdefault(int(m.group(1)), {})[m.group(2)] = \
                np.asarray(v)
    paths = _attn2_paths(cfg)
    patch = {}
    ids = sorted(entries)
    if len(ids) != len(paths):
        unmatched.append(
            f"ip_adapter entry count {len(ids)} != attn2 count {len(paths)}")
    for idx, path in zip(ids, paths):
        node = patch
        for p in path:
            node = node.setdefault(p, {})
        node["ip_to_k"] = {"kernel": entries[idx]["k"].T}
        node["ip_to_v"] = {"kernel": entries[idx]["v"].T}
    return proj, patch, unmatched


def merge_params(base, patch):
    """Recursively merge `patch` into a copy of `base` (new leaves allowed
    — used to graft IP-Adapter ip_to_k/ip_to_v branches onto a converted
    UNet tree)."""
    out = dict(base)
    for k, v in patch.items():
        if k in out and isinstance(out[k], dict) and isinstance(v, dict):
            out[k] = merge_params(out[k], v)
        else:
            out[k] = v
    return out
