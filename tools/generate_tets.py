#!/usr/bin/env python
"""Generate and cache tetrahedral grids (tools/generate_tets.py analog).

The reference downloads quartet-generated grids (demo/tets/*.npz); this
produces our structured sphere-cropped grids in the same npz layout
(vertices, indices) so either source works.
"""
import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from mvedit_tpu.models.mesh.dmtet import build_grid_tets  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--resolution", type=int, default=128)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()
    out = args.out or f"demo/tets/{args.resolution}_tets.npz"
    os.makedirs(os.path.dirname(out), exist_ok=True)
    grid = build_grid_tets(args.resolution)
    np.savez_compressed(out, vertices=grid.verts, indices=grid.tets)
    print(f"wrote {out}: {len(grid.verts)} verts, {len(grid.tets)} tets, "
          f"{grid.num_edge_verts} unique edges")


if __name__ == "__main__":
    main()
