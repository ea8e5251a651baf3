#!/usr/bin/env python
"""Aggregate quality-row eval CSVs into the README multi-R matrix.

Scans label=dir pairs for eval_{R}accel.csv files (written by
scripts/quality_row.py) and prints a markdown table of SSIM / PSNR as
mean +- half-range over the per-exam rows — the round-4 reporting
protocol (verdict #4: n-exam spread, not just the mean).

Usage:
  python scripts/quality_matrix.py zero-filled=runs/quality/zf_r4 \
      Latte-2u=runs/latteq4/recon20k ... [--accels 8,12,16] [--metric ssim]
"""

import argparse
import csv
import os
import sys


def load(path):
    with open(path) as f:
        rows = list(csv.DictReader(f))
    return rows


def cell(dirpath, R, metric):
    p = os.path.join(dirpath, f"eval_{R}accel.csv")
    if not os.path.exists(p):
        return None
    vals = [float(r[metric]) for r in load(p)]
    mean = sum(vals) / len(vals)
    half = (max(vals) - min(vals)) / 2
    return mean, half, len(vals)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("rows", nargs="+", metavar="label=dir")
    ap.add_argument("--accels", default="8,12,16")
    ap.add_argument("--metric", default="ssim", choices=["ssim", "psnr"])
    args = ap.parse_args(argv)

    accels = [int(a) for a in args.accels.split(",")]
    fmt = (lambda m, h: f"{m:.3f} ± {h:.3f}") if args.metric == "ssim" \
        else (lambda m, h: f"{m:.2f} ± {h:.2f}")

    print(f"| {args.metric.upper()} @ R | " +
          " | ".join(f"{R}×" for R in accels) + " |")
    print("|---" * (len(accels) + 1) + "|")
    for spec in args.rows:
        label, d = spec.split("=", 1)
        cells = []
        for R in accels:
            c = cell(d, R, args.metric)
            cells.append(fmt(c[0], c[1]) + f" (n={c[2]})" if c else "—")
        print(f"| {label} | " + " | ".join(cells) + " |")
    return 0


if __name__ == "__main__":
    sys.exit(main())
