#!/usr/bin/env python
"""Generate synthetic cine training/validation/test datasets in the
reference HDF5 format (see datasets/README.md)."""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dl_swin_gan_tpu.data.synthetic import write_synthetic_dataset


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--out", required=True)
    parser.add_argument("--train-files", type=int, default=8)
    parser.add_argument("--val-files", type=int, default=2)
    parser.add_argument("--test-files", type=int, default=2)
    parser.add_argument("--slices", type=int, default=4)
    parser.add_argument("--phases", type=int, default=20)
    parser.add_argument("--ny", type=int, default=180)
    parser.add_argument("--nx", type=int, default=128)
    parser.add_argument("--coils", type=int, default=8)
    parser.add_argument("--emaps", type=int, default=2)
    parser.add_argument("--noise", type=float, default=0.002)
    parser.add_argument("--seed", type=int, default=0)
    args = parser.parse_args()

    common = dict(slices=args.slices, T=args.phases, Y=args.ny, X=args.nx,
                  C=args.coils, E=args.emaps, noise=args.noise)
    for split, n, off in (("train", args.train_files, 0),
                          ("validate", args.val_files, 10_000),
                          ("test", args.test_files, 20_000)):
        paths = write_synthetic_dataset(os.path.join(args.out, split),
                                        num_files=n, seed=args.seed + off,
                                        **common)
        print(f"{split}: {len(paths)} files -> {os.path.join(args.out, split)}")


if __name__ == "__main__":
    main()
