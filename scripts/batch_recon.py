#!/usr/bin/env python
"""Loop reconstruct_h5 over every .h5 in a directory; output subfolder is
derived from the checkpoint's experiment-folder name. TPU-native counterpart
of reference `batch_recon.py:10-42`.
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
    parser.add_argument("--config-file", required=True)
    parser.add_argument("--ckpt", required=True)
    parser.add_argument("--data-directory", required=True)
    parser.add_argument("--out-directory", required=True)
    parser.add_argument("--acceleration", type=float, default=1)
    parser.add_argument("--batch-size", type=int, default=1)
    args = parser.parse_args(argv)

    from dl_swin_gan_tpu.config import load_cfg
    from dl_swin_gan_tpu.infer import load_checkpoint_params, reconstruct_h5_file
    from dl_swin_gan_tpu.utils import parameter_to_folder

    cfg = load_cfg(args.config_file)
    out_dir = os.path.join(args.out_directory, parameter_to_folder(cfg))
    params = (load_checkpoint_params(args.ckpt)
              if args.acceleration > 1 else None)

    files = sorted(glob.glob(os.path.join(args.data_directory, "*.h5")))
    logger.info("reconstructing %d files -> %s", len(files), out_dir)
    for f in files:
        reconstruct_h5_file(f, out_dir, cfg, params,
                            acceleration=args.acceleration,
                            batch_size=args.batch_size)


if __name__ == "__main__":
    main()
