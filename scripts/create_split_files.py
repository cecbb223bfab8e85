#!/usr/bin/env python
"""Build a train/val/test split npz from a features directory
(reference: nerf_mae/create_split_files.py:1-36;
nerf_rpn/datasets.py:453-476 split_hypersim_dataset)."""

from __future__ import annotations

import argparse
import os

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--features_path", required=True)
    p.add_argument("--output", required=True)
    p.add_argument("--train_ratio", default=0.8, type=float)
    p.add_argument("--val_ratio", default=0.1, type=float)
    p.add_argument("--seed", default=0, type=int)
    args = p.parse_args()

    scenes = sorted(
        f[:-4] for f in os.listdir(args.features_path) if f.endswith(".npz")
    )
    rng = np.random.RandomState(args.seed)
    rng.shuffle(scenes)
    n_train = int(len(scenes) * args.train_ratio)
    n_val = int(len(scenes) * (args.train_ratio + args.val_ratio))
    np.savez(
        args.output,
        train_scenes=np.array(scenes[:n_train]),
        val_scenes=np.array(scenes[n_train:n_val]),
        test_scenes=np.array(scenes[n_val:]),
    )
    print(
        f"{len(scenes)} scenes -> train {n_train}, val {n_val - n_train}, "
        f"test {len(scenes) - n_val} ({args.output})"
    )


if __name__ == "__main__":
    main()
