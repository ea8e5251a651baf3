#!/usr/bin/env python
"""Copy ROI masks between evaluation result pickles.
TPU-native counterpart of reference `copy_mask.py`."""

import argparse
import pickle


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--source", required=True, help="pickle with 'roi' masks")
    parser.add_argument("--dest", required=True, help="pickle to receive them")
    args = parser.parse_args(argv)

    with open(args.source, "rb") as f:
        src = pickle.load(f)
    with open(args.dest, "rb") as f:
        dst = pickle.load(f)

    copied = 0
    for name, rec in src.items():
        if isinstance(rec, dict) and "roi" in rec and name in dst:
            dst[name]["roi"] = rec["roi"]
            copied += 1
    with open(args.dest, "wb") as f:
        pickle.dump(dst, f)
    print(f"copied {copied} ROI masks -> {args.dest}")


if __name__ == "__main__":
    main()
