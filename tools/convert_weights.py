#!/usr/bin/env python
"""Convert reference torch checkpoints to mvedit_tpu param trees.

One conversion tool + manifest (SURVEY §7 hard-part 6). Usage:

  python tools/convert_weights.py --src /path/to/hf_model --kind unet \
      --out checkpoints/unet.npz

  # convert a whole checkpoint directory per the MANIFEST:
  python tools/convert_weights.py --all --src /path/to/ckpts \
      --out-dir checkpoints/

Inputs: HF diffusers/transformers layout (.bin or .safetensors) or the
aux nets' native torch checkpoints. Outputs: .npz of flattened params
('/'-joined paths) loadable by `load_params_npz`.

MANIFEST mirrors the reference's model zoo (`lib/apis/adapter3d.py:159-423`):
every checkpoint the reference downloads mapped to a (kind, subdir) pair
the Adapter3DRunner's `checkpoint_dir` layout expects.
"""
import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from mvedit_tpu.models.diffusion import weights as W  # noqa: E402


def flatten(tree, prefix=""):
    out = {}
    for k, v in tree.items():
        path = f"{prefix}/{k}" if prefix else k
        if isinstance(v, dict):
            out.update(flatten(v, path))
        else:
            out[path] = np.asarray(v)
    return out


def load_params_npz(path):
    d = np.load(path)
    return W.unflatten({k: d[k] for k in d.files})


def _convert_tracer(sd):
    from mvedit_tpu.models.segmentors.tracer import convert_tracer
    tree, unmatched = convert_tracer(sd)
    return tree["params"], unmatched


def _convert_lpips(sd):
    """Normalize torchvision-VGG16 + lpips lin checkpoints to the
    models.losses layout (features.N.* + linK)."""
    from mvedit_tpu.models.losses import lpips_params_from_torch
    if "lin0.model.1.weight" in sd:
        lins = [sd[f"lin{i}.model.1.weight"] for i in range(5)]
    elif "lin0" in sd:
        lins = [sd[f"lin{i}"] for i in range(5)]
    else:
        lins = [np.ones((c,), np.float32)
                for c in (64, 128, 256, 512, 512)]
    tree = lpips_params_from_torch(sd, lins)
    return tree, []


def _convert_srvgg(sd):
    from mvedit_tpu.models.image_enhancer import convert_srvgg
    return convert_srvgg(sd), []


def _convert_ip_adapter(sd):
    from mvedit_tpu.models.diffusion import SD15_UNET
    proj, patch, unmatched = W.convert_ip_adapter(sd, SD15_UNET)
    return {"image_proj": proj, "unet_patch": patch}, unmatched


def _convert_inception(sd):
    """FID pt_inception weights: stored as-is under torch names; the
    flax inception net maps them at load (models/inception.py)."""
    return {k.replace(".", "/"): np.asarray(v) for k, v in sd.items()}, []


def _convert_ramping(sd):
    """Zero123++ ramping coefficients (a single vector in the pipe config
    / 'ramping_coefficients' entry)."""
    for k in ("ramping_coefficients", "ramping.weight", "weight"):
        if k in sd:
            return {"ramping": np.asarray(sd[k]).reshape(-1)}, []
    return {}, list(sd)


def _convert_dpt(sd):
    from mvedit_tpu.models.segmentors.dpt import convert_dpt
    tree, unmatched = convert_dpt(sd)
    return tree["params"], unmatched


def _convert_loftr(sd):
    from mvedit_tpu.models.segmentors.loftr import convert_loftr
    tree, unmatched = convert_loftr(sd)
    return tree["params"], unmatched


def _convert_clip_camera_projection(sd):
    """Legacy Zero123 CLIPCameraProjection (one Linear; reference
    lib/pipelines/zero123.py:56-94) -> pipelines.zero123.CLIPCameraProjection."""
    import numpy as np
    tree, unmatched = {"proj": {}}, []
    for k, v in sd.items():
        a = np.asarray(v)
        if k.endswith("proj.weight"):
            tree["proj"]["kernel"] = a.T
        elif k.endswith("proj.bias"):
            tree["proj"]["bias"] = a
        else:
            unmatched.append(k)
    return tree, unmatched


def _convert_sam(sd):
    from mvedit_tpu.models.segmentors.sam import convert_sam
    return convert_sam(sd)


CONVERTERS = {
    "dpt": _convert_dpt,
    "loftr": _convert_loftr,
    "unet": lambda sd: W.convert_unet(sd),
    "controlnet": lambda sd: W.convert_controlnet(sd),
    "vae": lambda sd: W.convert_vae(sd),
    "clip_text": lambda sd: W.convert_clip_text(sd),
    "clip_vision": lambda sd: W.convert_clip_vision(sd),
    "srvgg": _convert_srvgg,
    "tracer": _convert_tracer,
    "lpips": _convert_lpips,
    "ip_adapter": _convert_ip_adapter,
    "inception": _convert_inception,
    "zero123plus_ramping": _convert_ramping,
    "clip_camera_projection": _convert_clip_camera_projection,
    "sam": _convert_sam,
}

# Reference model zoo -> (kind, target subdir under checkpoint_dir).
# Source names follow the HF repos the reference pulls
# (lib/apis/adapter3d.py:159-423, lib/pipelines/utils.py:191-305).
MANIFEST = {
    "stable-diffusion-v1-5/unet": ("unet", "unet"),
    "stable-diffusion-v1-5/vae": ("vae", "vae"),
    "stable-diffusion-v1-5/text_encoder": ("clip_text", "text_encoder"),
    "control_v11f1e_sd15_tile": ("controlnet", "controlnet_tile"),
    "control_v11f1p_sd15_depth": ("controlnet", "controlnet_depth"),
    "control_v11e_sd15_ip2p": ("controlnet", "controlnet_ip2p"),
    "zero123plus-v1.1/unet": ("unet", "zero123plus_unet"),
    "zero123plus-v1.1/vision_encoder": ("clip_vision",
                                        "zero123plus_vision"),
    "zero123plus-v1.2/unet": ("unet", "zero123plus_unet_v12"),
    "ip-adapter_sd15": ("ip_adapter", "ip_adapter"),
    "tracer_b7": ("tracer", "tracer"),
    "realesr-general-x4v3": ("srvgg", "image_enhancer"),
    "lpips_vgg": ("lpips", "lpips"),
    "pt_inception-2015-12-05": ("inception", "inception"),
    "omnidata_dpt_normal_v2": ("dpt", "omnidata"),
    "indoor_ds_new": ("loftr", "loftr"),
    # SAM ViT-H (ybelkada/segment-anything sam_vit_h_4b8939.pth,
    # adapter3d.py:363-380)
    "sam_vit_h_4b8939": ("sam", "sam"),
    # legacy Zero123 (kept-for-compat pipeline, lib/pipelines/zero123.py)
    "zero123/unet": ("unet", "zero123_unet"),
    "zero123/image_encoder": ("clip_vision", "zero123_vision"),
    "zero123/clip_camera_projection": ("clip_camera_projection",
                                       "zero123_ccp"),
}


def convert_one(kind, src, out):
    if os.path.isdir(src):
        for name in ("diffusion_pytorch_model.safetensors",
                     "model.safetensors", "diffusion_pytorch_model.bin",
                     "pytorch_model.bin"):
            p = os.path.join(src, name)
            if os.path.exists(p):
                src = p
                break
    sd = W.load_torch_state(src)
    tree, unmatched = CONVERTERS[kind](sd)
    flat = flatten(tree) if isinstance(tree, dict) else tree
    os.makedirs(os.path.dirname(os.path.abspath(out)), exist_ok=True)
    np.savez(out, **flat)
    print(f"wrote {out}: {len(flat)} tensors, "
          f"{sum(v.size for v in flat.values()) / 1e6:.1f}M params, "
          f"{len(unmatched)} unmatched keys")
    if unmatched:
        print("unmatched (first 10):", unmatched[:10])
    return unmatched


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", required=True,
                    help="checkpoint file/dir, or ckpt root with --all")
    ap.add_argument("--kind", choices=sorted(CONVERTERS))
    ap.add_argument("--out")
    ap.add_argument("--all", action="store_true",
                    help="walk MANIFEST entries under --src")
    ap.add_argument("--out-dir", default="checkpoints")
    args = ap.parse_args()

    if args.all:
        report = {}
        for name, (kind, subdir) in MANIFEST.items():
            src = os.path.join(args.src, name)
            if not os.path.exists(src):
                report[name] = "missing"
                continue
            out = os.path.join(args.out_dir, subdir, f"{subdir}.npz")
            try:
                um = convert_one(kind, src, out)
                report[name] = f"ok ({len(um)} unmatched)"
            except Exception as e:  # keep going; report at the end
                report[name] = f"FAILED: {e}"
        print(json.dumps(report, indent=2))
        return
    if not (args.kind and args.out):
        ap.error("--kind and --out required without --all")
    convert_one(args.kind, args.src, args.out)


if __name__ == "__main__":
    main()
