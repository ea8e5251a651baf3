#!/usr/bin/env python
"""Compare `<R>accel.im` reconstructions against the `1accel.im` reference:
per-slice/phase SSIM/RMSE/PSNR, written as CSV + printed summary. TPU-native
counterpart of reference `evaluate.py` / `eval.py`.
"""

import argparse
import glob
import logging
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

logging.basicConfig(level=logging.INFO)
logger = logging.getLogger(__name__)


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--recon-directory", required=True,
                        help="directory holding <name>_<R>accel.im CFLs")
    parser.add_argument("--acceleration", type=float, required=True)
    parser.add_argument("--output", default=None, help="CSV output path")
    args = parser.parse_args(argv)

    from dl_swin_gan_tpu.infer.evaluate import evaluate_cfl_pair

    def fmt(a):
        return int(a) if float(a) == int(a) else a

    recons = sorted(glob.glob(os.path.join(
        args.recon_directory, f"*_{fmt(args.acceleration)}accel.im.hdr")))
    rows = []
    for rpath in recons:
        base = rpath[:-len(".hdr")]
        name = os.path.basename(base).rsplit("_", 1)[0]
        ref = os.path.join(args.recon_directory, f"{name}_1accel.im")
        if not os.path.exists(ref + ".hdr"):
            logger.warning("no 1accel reference for %s; skipping", name)
            continue
        m = evaluate_cfl_pair(base, ref)
        m["name"] = name
        rows.append(m)
        logger.info("%s: ssim=%.4f rmse=%.5f psnr=%.2f", name,
                    m["ssim"], m["rmse"], m["psnr"])

    if not rows:
        logger.error("nothing evaluated")
        return 1
    import pandas as pd
    df = pd.DataFrame(rows)
    print(df.describe().loc[["mean", "std"]])
    out = args.output or os.path.join(
        args.recon_directory, f"eval_{fmt(args.acceleration)}accel.csv")
    df.to_csv(out, index=False)
    logger.info("wrote %s", out)
    return 0


if __name__ == "__main__":
    main()
