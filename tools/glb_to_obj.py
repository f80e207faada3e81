#!/usr/bin/env python
"""GLB -> OBJ converter (tools/glb_to_obj.py analog)."""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from mvedit_tpu.models.mesh import Mesh  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("src")
    ap.add_argument("dst", nargs="?")
    args = ap.parse_args()
    dst = args.dst or args.src.rsplit(".", 1)[0] + ".obj"
    mesh = Mesh.load(args.src)
    mesh.write(dst)
    print(f"wrote {dst}: {len(mesh.v)} verts, {len(mesh.f)} faces")


if __name__ == "__main__":
    main()
