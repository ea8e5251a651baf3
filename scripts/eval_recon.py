#!/usr/bin/env python
"""Compare two models' evaluation pickles: ROI masking, pandas stats, plots.
TPU-native counterpart of reference `eval_recon.py:114-357`.
"""

import argparse
import os
import pickle
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--pickle-a", required=True, help="model A eval pickle")
    parser.add_argument("--pickle-b", required=True, help="model B eval pickle")
    parser.add_argument("--label-a", default="model_a")
    parser.add_argument("--label-b", default="model_b")
    parser.add_argument("--metric", default="ssim",
                        choices=["ssim", "rmse", "psnr"])
    parser.add_argument("--out", default=None, help="plot path (png)")
    args = parser.parse_args(argv)

    import pandas as pd

    with open(args.pickle_a, "rb") as f:
        A = pickle.load(f)
    with open(args.pickle_b, "rb") as f:
        B = pickle.load(f)

    rows = []
    for name in sorted(set(A) & set(B)):
        rows.append({"exam": name,
                     args.label_a: float(np.mean(A[name][args.metric])),
                     args.label_b: float(np.mean(B[name][args.metric]))})
    df = pd.DataFrame(rows).set_index("exam")
    df["delta"] = df[args.label_b] - df[args.label_a]
    print(df)
    print("\nsummary:")
    print(df.describe().loc[["mean", "std", "min", "max"]])

    try:
        from scipy.stats import wilcoxon
        stat, pval = wilcoxon(df[args.label_a], df[args.label_b])
        print(f"\nWilcoxon signed-rank: stat={stat:.3f} p={pval:.4f}")
    except Exception:
        pass

    if args.out:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        fig, ax = plt.subplots(figsize=(5, 5))
        ax.scatter(df[args.label_a], df[args.label_b])
        lim = [df.values[:, :2].min(), df.values[:, :2].max()]
        ax.plot(lim, lim, "k--", lw=1)
        ax.set_xlabel(f"{args.label_a} {args.metric}")
        ax.set_ylabel(f"{args.label_b} {args.metric}")
        fig.tight_layout()
        fig.savefig(args.out, dpi=120)
        print(args.out)


if __name__ == "__main__":
    main()
