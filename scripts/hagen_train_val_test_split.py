"""Split the raw Hagen actin/mito TIFF stacks into train/val/test files.

Script equivalent of /root/reference/notebooks/hagen_train_val_test.ipynb:
a seeded (955) permutation of frames, 80/10/10 split, written as
`{split}_{name}` TIFFs under `<out>/{train,val,test}/`.

Usage:
  python scripts/hagen_train_val_test_split.py \
      --actin actin-60x-noise2-highsnr.tif --mito mito-60x-noise2-highsnr.tif \
      --out dataset/diffsplit_hagen
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from diffsplitting_tpu.data.io import load_tiff_stack, save_tiff_stack


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--actin", required=True)
    ap.add_argument("--mito", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--train_frac", type=float, default=0.8)
    ap.add_argument("--val_frac", type=float, default=0.1)
    ap.add_argument("--seed", type=int, default=955)
    args = ap.parse_args()

    actin = load_tiff_stack(args.actin)
    mito = load_tiff_stack(args.mito)
    n = len(mito)
    assert n == len(actin)

    perm = np.random.RandomState(args.seed).permutation(n)
    n_train = int(args.train_frac * n)
    n_val = int((args.train_frac + args.val_frac) * n)
    splits = {
        "train": perm[:n_train],
        "val": perm[n_train:n_val],
        "test": perm[n_val:],
    }

    actin_name = os.path.basename(args.actin)
    mito_name = os.path.basename(args.mito)
    for split, idx in splits.items():
        os.makedirs(os.path.join(args.out, split), exist_ok=True)
        save_tiff_stack(
            os.path.join(args.out, split, f"{split}_{actin_name}"), actin[idx]
        )
        save_tiff_stack(
            os.path.join(args.out, split, f"{split}_{mito_name}"), mito[idx]
        )
        print(f"{split}: {len(idx)} frames")


if __name__ == "__main__":
    main()
