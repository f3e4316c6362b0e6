"""Reassemble a denoiser val .npz from its shard directory (the assembled
files are transient; shards under weights/*.npz.shards are the durable,
bitwise-stable artifacts — models/train_denoiser.py:107-147).

Usage: python benchmarks/assemble_val.py out.npz shards_dir [shards_dir...]
"""

import sys

import numpy as np


def main():
    out, dirs = sys.argv[1], sys.argv[2:]
    import glob
    import os

    paths = []
    for d in dirs:
        paths += sorted(glob.glob(os.path.join(d, "*.npz")))
    if not paths:
        raise SystemExit(f"no shards under {dirs}")
    data = [dict(np.load(p)) for p in paths]
    np.savez_compressed(
        out, **{k: np.concatenate([d[k] for d in data]) for k in data[0]}
    )
    print(f"{out}: {len(paths)} shards, "
          f"{data[0]['noisy'].shape[1:]} x {sum(d['noisy'].shape[0] for d in data)}")


if __name__ == "__main__":
    main()
