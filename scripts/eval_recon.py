#!/usr/bin/env python
"""Compare two models' evaluation pickles: ROI masking, pandas stats, plots.
TPU-native counterpart of reference `eval_recon.py:114-357`.

When records carry an `roi` mask (installed by `scripts/copy_mask.py`, the
counterpart of the reference's interactive segmentation loop,
eval_recon.py:143-177) and the per-pixel metric maps written by
`scripts/eval.py` (`ssim_image`/`rmse_image`), the comparison additionally
reports per-exam ROI-mean columns — the reference's SSIM_ROI / RMSE_ROI
(eval_recon.py:62-66,189-193 via mean_roi).
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

    from dl_swin_gan_tpu.infer.evaluate import mean_roi

    # ROI means use the per-pixel maps (reference eval_recon.py:189-193:
    # mean_roi over 'ssim_image'/'rmse_image'); psnr has no map — fall back
    # to the ssim map key only for metrics that have one.
    map_key = {"ssim": "ssim_image", "rmse": "rmse_image"}.get(args.metric)

    rows = []
    for name in sorted(set(A) & set(B)):
        row = {"exam": name,
               args.label_a: float(np.mean(A[name][args.metric])),
               args.label_b: float(np.mean(B[name][args.metric]))}
        roi = A[name].get("roi", B[name].get("roi"))
        if roi is not None and map_key is not None \
                and map_key in A[name] and map_key in B[name]:
            row[f"{args.label_a}_roi"] = mean_roi(A[name][map_key], roi)
            row[f"{args.label_b}_roi"] = mean_roi(B[name][map_key], roi)
        rows.append(row)
    df = pd.DataFrame(rows).set_index("exam")
    df["delta"] = df[args.label_b] - df[args.label_a]
    if f"{args.label_a}_roi" in df.columns:
        df["delta_roi"] = df[f"{args.label_b}_roi"] - df[f"{args.label_a}_roi"]
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
