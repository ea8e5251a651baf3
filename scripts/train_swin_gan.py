#!/usr/bin/env python
"""Swin-GAN training entry point: unrolled Swin generator + PatchGAN
discriminator (LSGAN). Completes the trainer the reference's run_script.sh
dispatches (SWINGAN) but never shipped.

Usage:
    python scripts/train_swin_gan.py --config-file configs/config_swingan.yaml --synthetic-data
"""

import logging
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

logging.basicConfig(level=logging.INFO)


def main(argv=None):
    from dl_swin_gan_tpu.train.gan_trainer import GANTrainer
    from dl_swin_gan_tpu.train.cli import run_training

    return run_training(lambda cfg: GANTrainer(cfg),
                        "Train SwinGAN adversarial recon on TPU.", argv)


if __name__ == "__main__":
    main()
