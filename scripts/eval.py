#!/usr/bin/env python
"""Per-slice/phase SSIM + RMSE tables -> pickle. TPU-native counterpart of
reference `eval.py:16-177` (skimage SSIM variant; here the shared
hand-rolled Gaussian SSIM from infer.evaluate).
"""

import argparse
import glob
import os
import pickle
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--recon-directory", required=True)
    parser.add_argument("--acceleration", type=float, required=True)
    parser.add_argument("--output", default=None)
    parser.add_argument("--no-maps", action="store_true",
                        help="omit per-pixel ssim_image/rmse_image maps "
                             "(reference eval.py always stores them; they "
                             "feed eval_recon.py's ROI-mean columns)")
    args = parser.parse_args(argv)

    from dl_swin_gan_tpu.data import cfl
    from dl_swin_gan_tpu.infer.evaluate import evaluate_volumes

    def fmt(a):
        return str(int(a)) if float(a).is_integer() else str(a)

    def load(path):
        im = cfl.read(path, order="F")
        im = im.reshape(im.shape[:5])
        return np.transpose(im, (2, 3, 4, 1, 0))  # [sl, emap, ph, y, x]

    results = {}
    for hdr in sorted(glob.glob(os.path.join(
            args.recon_directory, f"*_{fmt(args.acceleration)}accel.im.hdr"))):
        base = hdr[:-len(".hdr")]
        name = os.path.basename(base).rsplit("_", 1)[0]
        ref = os.path.join(args.recon_directory, f"{name}_1accel.im")
        if not os.path.exists(ref + ".hdr"):
            continue
        results[name] = evaluate_volumes(load(ref), load(base),
                                         return_maps=not args.no_maps)

    out = args.output or os.path.join(
        args.recon_directory, f"eval_{fmt(args.acceleration)}accel.pkl")
    with open(out, "wb") as f:
        pickle.dump(results, f)
    for name, m in results.items():
        print(f"{name}: ssim={m['ssim'].mean():.4f} rmse={m['rmse'].mean():.5f} "
              f"psnr={m['psnr'].mean():.2f}")
    print(out)


if __name__ == "__main__":
    main()
