#!/usr/bin/env python
"""Walkthrough of every public endpoint (scripts/example_webui_api_local.py
analog). With converted checkpoints, pass --checkpoint-dir; without, models
run with seeded random weights (flow demo only).

Usage:
  python scripts/example_api_local.py --tiny          # fast flow demo
  python scripts/example_api_local.py --checkpoint-dir checkpoints/
"""
import argparse
import os
import sys
import tempfile

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--checkpoint-dir", default=None)
    ap.add_argument("--tiny", action="store_true")
    ap.add_argument("--out-dir", default="outputs")
    args = ap.parse_args()
    os.makedirs(args.out_dir, exist_ok=True)

    from mvedit_tpu.apis import Adapter3DRunner
    from mvedit_tpu.models.mesh import Mesh
    from mvedit_tpu.models.mesh.dmtet import build_grid_tets, marching_tets
    import jax.numpy as jnp

    runner = Adapter3DRunner(checkpoint_dir=args.checkpoint_dir,
                             tiny_models=args.tiny, seed=42)

    # --- make a demo sphere mesh -------------------------------------
    grid = build_grid_tets(16, crop_sphere=False)
    sdf = 0.55 - np.linalg.norm(grid.verts, axis=-1)
    mt = marching_tets(grid, jnp.asarray(sdf))
    fm = np.asarray(mt["face_mask"])
    f = np.asarray(mt["faces"])[fm]
    v = np.asarray(mt["verts"])
    used = np.unique(f)
    remap = np.full(len(v), -1, np.int64)
    remap[used] = np.arange(len(used))
    mesh = Mesh(v=v[used].astype(np.float32), f=remap[f].astype(np.int32))
    mesh.auto_normal()
    demo_mesh = os.path.join(args.out_dir, "demo_sphere.glb")
    mesh.write_glb(demo_mesh)
    print("demo mesh:", demo_mesh)

    # --- text-to-image ------------------------------------------------
    img = runner.run_text_to_img("a red sports car", steps=4)
    print("text_to_img:", img.shape)

    # --- segmentation ---------------------------------------------------
    masks = runner.run_segmentation(img[None])
    print("segmentation:", np.asarray(masks).shape)

    # --- mesh preproc ---------------------------------------------------
    pre = runner.run_mesh_preproc(demo_mesh)
    print("preproc: center", pre["center"], "scale", pre["scale"])

    # --- 3D-to-3D (MVEdit) ----------------------------------------------
    out = runner.run_3d_to_3d(demo_mesh, "a colorful beach ball",
                              out_path=os.path.join(args.out_dir,
                                                    "edited.glb"))
    print("3d_to_3d:", out["mesh"] is not None)

    # --- re-texturing -----------------------------------------------------
    out = runner.run_retex(demo_mesh, "wooden texture",
                           out_path=os.path.join(args.out_dir, "retex.glb"))
    print("retex:", out["mesh"].albedo.shape)

    # --- texture superres -------------------------------------------------
    out = runner.run_texture_superres(
        os.path.join(args.out_dir, "retex.glb"), "sharp detailed wood",
        out_path=os.path.join(args.out_dir, "retex_sr.glb"))
    print("superres:", out["mesh"].albedo.shape)

    # --- image-to-3D -------------------------------------------------------
    out = runner.run_zero123plus_to_mesh(
        img, passes=1, out_path=os.path.join(args.out_dir, "img23d.glb"))
    print("zero123plus_to_mesh:", out["mesh"] is not None)

    # --- text-to-3D (StableSSDNeRF) -----------------------------------------
    out = runner.run_stablessdnerf("a car", steps=4)
    print("stablessdnerf preview:", out["preview"].shape)

    # --- orbit video ---------------------------------------------------------
    path = runner.run_mesh_to_video(
        os.path.join(args.out_dir, "retex.glb"),
        out_path=os.path.join(args.out_dir, "orbit.mp4"), num_frames=12)
    print("video:", path)


if __name__ == "__main__":
    main()
