#!/usr/bin/env python
"""Side-by-side acceleration matrix with x-t profiles. TPU-native
counterpart of reference `display_matrix.py`: for one exam, tile the
reconstructions at several accelerations next to the fully-sampled
reference, plus temporal (x-t) profiles through the image center.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--recon-directory", required=True)
    parser.add_argument("--name", required=True, help="exam basename")
    parser.add_argument("--accelerations", type=float, nargs="+",
                        default=[1, 12])
    parser.add_argument("--slice", type=int, default=0)
    parser.add_argument("--phase", type=int, default=0)
    parser.add_argument("--out", default=None)
    args = parser.parse_args(argv)

    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    from scripts.display_data import load_cfl_images

    def fmt(a):
        return str(int(a)) if float(a).is_integer() else str(a)

    vols = {}
    for a in args.accelerations:
        path = os.path.join(args.recon_directory,
                            f"{args.name}_{fmt(a)}accel.im")
        vols[a] = load_cfl_images(path)[args.slice, 0]  # [ph, y, x]

    n = len(vols)
    fig, axes = plt.subplots(2, n, figsize=(3 * n, 6), squeeze=False)
    for i, (a, v) in enumerate(sorted(vols.items())):
        mag = np.abs(v)
        axes[0, i].imshow(mag[args.phase], cmap="gray")
        axes[0, i].set_title(f"{fmt(a)}x")
        axes[0, i].axis("off")
        # x-t profile through the image center
        axes[1, i].imshow(mag[:, mag.shape[1] // 2, :], cmap="gray",
                          aspect="auto")
        axes[1, i].set_ylabel("phase" if i == 0 else "")
        axes[1, i].set_xticks([])
    fig.tight_layout()
    out = args.out or os.path.join(args.recon_directory,
                                   f"{args.name}_matrix.png")
    fig.savefig(out, dpi=120)
    print(out)


if __name__ == "__main__":
    main()
