#!/usr/bin/env python
"""Diffusion training entry point (DiT / Latte backbones, DDPM_X / DDPM_E).

TPU-native counterpart of reference `scripts/train_DiT.py` and
`scripts/train_Latte.py` (MODEL.MODEL_TYPE in the config picks the backbone).

Usage:
    python scripts/train_DiT.py --config-file configs/config_dit.yaml --synthetic-data
"""

import logging
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

logging.basicConfig(level=logging.INFO)


def main(argv=None):
    from dl_swin_gan_tpu.train.diffusion_trainer import DiffusionTrainer
    from dl_swin_gan_tpu.train.cli import run_training

    return run_training(lambda cfg: DiffusionTrainer(cfg),
                        "Train DiT/Latte diffusion recon on TPU.", argv)


if __name__ == "__main__":
    main()
