#!/usr/bin/env python
"""Training entry point for unrolled MRI reconstruction (RES/SE/CBAM/SWIN).

TPU-native counterpart of reference `scripts/train.py` (and its clones
train_se.py / train_cbam.py / train_swin.py — here MODEL.MODEL_TYPE in the
config selects the denoiser instead of separate scripts).

Usage:
    python scripts/train.py --config-file configs/basic/example.yaml
    python scripts/train.py --config-file ... --resume
    python scripts/train.py --config-file ... --synthetic-data  # no scanner data
"""

import logging
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

logging.basicConfig(level=logging.INFO)


def main(argv=None):
    from dl_swin_gan_tpu.train import Trainer
    from dl_swin_gan_tpu.train.cli import run_training

    return run_training(lambda cfg: Trainer(cfg),
                        "Train unrolled MRI recon on TPU.", argv)


if __name__ == "__main__":
    main()
