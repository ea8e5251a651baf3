#!/usr/bin/env python
"""Batch-rename result files by pattern substitution.
TPU-native counterpart of reference `rename_file.py`."""

import argparse
import glob
import os


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("directory")
    parser.add_argument("--find", required=True)
    parser.add_argument("--replace", required=True)
    parser.add_argument("--dry-run", action="store_true")
    args = parser.parse_args(argv)

    for path in sorted(glob.glob(os.path.join(args.directory, "*"))):
        base = os.path.basename(path)
        if args.find in base:
            new = os.path.join(os.path.dirname(path),
                               base.replace(args.find, args.replace))
            print(f"{path} -> {new}")
            if not args.dry_run:
                os.rename(path, new)


if __name__ == "__main__":
    main()
