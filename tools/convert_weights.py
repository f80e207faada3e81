#!/usr/bin/env python
"""Convert reference torch checkpoints to mvedit_tpu param trees.

One conversion tool + manifest (SURVEY §7 hard-part 6). Usage:

  python tools/convert_weights.py --src /path/to/hf_model --kind unet \
      --out checkpoints/unet.npz

Supported kinds: unet, controlnet, vae, clip_text, clip_vision, srvgg.
Inputs: HF diffusers/transformers layout (.bin or .safetensors).
Outputs: .npz of flattened params ('/'-joined paths) loadable by
`load_params_npz`.
"""
import argparse
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


CONVERTERS = {
    "unet": W.convert_unet,
    "controlnet": W.convert_controlnet,
    "vae": W.convert_vae,
    "clip_text": W.convert_clip_text,
    "clip_vision": W.convert_clip_vision,
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", required=True,
                    help="checkpoint file or HF model dir")
    ap.add_argument("--kind", required=True, choices=list(CONVERTERS)
                    + ["srvgg"])
    ap.add_argument("--out", required=True)
    args = ap.parse_args()

    src = args.src
    if os.path.isdir(src):
        for name in ("diffusion_pytorch_model.safetensors",
                     "model.safetensors", "diffusion_pytorch_model.bin",
                     "pytorch_model.bin"):
            p = os.path.join(src, name)
            if os.path.exists(p):
                src = p
                break
    sd = W.load_torch_state(src)
    if args.kind == "srvgg":
        from mvedit_tpu.models.image_enhancer import convert_srvgg
        tree = convert_srvgg(sd)
        unmatched = []
    else:
        tree, unmatched = CONVERTERS[args.kind](sd)
    flat = flatten(tree)
    os.makedirs(os.path.dirname(os.path.abspath(args.out)), exist_ok=True)
    np.savez(args.out, **flat)
    print(f"wrote {args.out}: {len(flat)} tensors, "
          f"{sum(v.size for v in flat.values()) / 1e6:.1f}M params, "
          f"{len(unmatched)} unmatched keys")
    if unmatched:
        print("unmatched (first 10):", unmatched[:10])


if __name__ == "__main__":
    main()
