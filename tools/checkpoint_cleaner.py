"""Remove all non-latest checkpoints under a workdir, optionally pruning
the kept ones to inference-only weights.

Counterpart of the reference's `tools/checkpoint_cleaner.py` for this
framework's checkpoint layouts:

- orbax step directories written by ``runner.trainer.CheckpointHook``
  (``<workdir>/ckpt_<step>/``) — all but the highest step are removed;
- flat ``.npz`` checkpoints — all but the lexicographically-latest (or a
  ``latest.npz`` symlink target) are removed; with ``--save-inf`` the
  non-latest ones are instead pruned in place to inference-only weights
  (optimizer state dropped, floats cast to ``--dtype``), matching the
  reference's behavior of stripping ``optimizer`` and casting
  ``state_dict`` to fp16 (``tools/checkpoint_cleaner.py:16-27``).
"""
import argparse
import os
import re
import shutil
import sys

import numpy as np


def parse_args():
    p = argparse.ArgumentParser(
        description="Remove all checkpoints except the latest")
    p.add_argument("workdir", help="directory of checkpoints")
    p.add_argument("--save-inf", action="store_true",
                   help="rewrite kept npz checkpoints as inference "
                        "weights (drop optimizer state, cast floats)")
    p.add_argument("--dtype", default="float16",
                   help="dtype of inference weights")
    p.add_argument("--yes", action="store_true",
                   help="skip the confirmation prompt")
    return p.parse_args()


def save_inference(path, dtype):
    d = dict(np.load(path, allow_pickle=True))
    opt_keys = [k for k in d if k.startswith(("opt_", "optimizer"))]
    if not opt_keys:
        print(f"Skipping {path} (no optimizer state)")
        return
    for k in opt_keys:
        del d[k]
    dt = np.dtype(dtype)
    for k, v in d.items():
        if isinstance(v, np.ndarray) and np.issubdtype(v.dtype,
                                                       np.floating):
            d[k] = v.astype(dt)
    np.savez(path, **d)
    print(f"Saved inference weights for {path}")


def main():
    args = parse_args()
    op = "prune" if args.save_inf else "remove"
    print(f"This will {op} all non-latest checkpoints in "
          f"{os.path.abspath(args.workdir)}")
    if not args.yes:
        ans = None
        while ans not in ("y", "n"):
            ans = input("continue? [y/n]")
        if ans == "n":
            sys.exit(0)

    for dirpath, dirnames, filenames in os.walk(args.workdir):
        # orbax/step checkpoint dirs: ckpt_<step> or <step>
        step_dirs = {}
        for d in list(dirnames):
            m = re.fullmatch(r"(?:ckpt_)?(\d+)", d)
            if m and os.path.exists(os.path.join(dirpath, d,
                                                 "_CHECKPOINT_METADATA")) \
                    or (m and any(os.scandir(os.path.join(dirpath, d)))):
                step_dirs[int(m.group(1))] = d
        if step_dirs:
            latest = step_dirs[max(step_dirs)]
            for step, d in sorted(step_dirs.items()):
                if d == latest:
                    continue
                shutil.rmtree(os.path.join(dirpath, d))
                dirnames.remove(d)
                print(f"Removed {os.path.join(dirpath, d)}")

        npzs = sorted(f for f in filenames if f.endswith(".npz"))
        if npzs:
            keep = "latest.npz" if "latest.npz" in npzs else npzs[-1]
            if os.path.islink(os.path.join(dirpath, keep)):
                tgt = os.path.basename(
                    os.path.realpath(os.path.join(dirpath, keep)))
                npzs = [f for f in npzs if f != tgt]
            npzs.remove(keep)
            for f in npzs:
                path = os.path.join(dirpath, f)
                if args.save_inf:
                    save_inference(path, args.dtype)
                else:
                    os.remove(path)
                    print(f"Removed {path}")


if __name__ == "__main__":
    main()
