#!/usr/bin/env python
"""Count reconstruction CFL files per acceleration in a results tree.
TPU-native counterpart of reference `im_count.py`."""

import argparse
import collections
import glob
import os
import re


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("directory")
    args = parser.parse_args(argv)

    counts = collections.Counter()
    for hdr in glob.glob(os.path.join(args.directory, "**", "*accel.im.hdr"),
                         recursive=True):
        m = re.search(r"_([\d.]+)accel\.im\.hdr$", hdr)
        if m:
            counts[m.group(1)] += 1
    for accel, n in sorted(counts.items(), key=lambda kv: float(kv[0])):
        print(f"{accel}x: {n} recon files")
    print(f"total: {sum(counts.values())}")


if __name__ == "__main__":
    main()
