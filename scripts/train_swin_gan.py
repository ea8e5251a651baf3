#!/usr/bin/env python
"""Swin-GAN training entry point: unrolled Swin generator + PatchGAN
discriminator (LSGAN). Completes the trainer the reference's run_script.sh
dispatches (SWINGAN) but never shipped.

Usage:
    python scripts/train_swin_gan.py --config-file configs/config_swingan.yaml --synthetic-data
"""

import argparse
import logging
import os
import random
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from dl_swin_gan_tpu.config import load_cfg

logging.basicConfig(level=logging.INFO)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--config-file", type=str, required=True)
    parser.add_argument("--resume", action="store_true")
    parser.add_argument("--max-epochs", type=int, default=None)
    parser.add_argument("--synthetic-data", action="store_true")
    parser.add_argument("opts", nargs="*")
    args = parser.parse_args()

    cfg = load_cfg(args.config_file, freeze=False)
    if args.opts:
        cfg.merge_from_list(args.opts)

    random.seed(cfg.SEED)
    np.random.seed(cfg.SEED)

    train_dir = cfg.DATASET.TRAIN[0] if cfg.DATASET.TRAIN else None
    val_dir = cfg.DATASET.VAL[0] if cfg.DATASET.VAL else None
    if args.synthetic_data:
        from dl_swin_gan_tpu.data.synthetic import write_synthetic_dataset
        train_dir = os.path.join(cfg.OUTPUT_DIR, "data", "train")
        val_dir = os.path.join(cfg.OUTPUT_DIR, "data", "val")
        if not os.path.isdir(train_dir) or not os.listdir(train_dir):
            write_synthetic_dataset(train_dir, num_files=4, slices=2, seed=cfg.SEED)
            write_synthetic_dataset(val_dir, num_files=1, slices=2,
                                    seed=cfg.SEED + 10_000)
        cfg.DATASET.TRAIN = (train_dir,)
        cfg.DATASET.VAL = (val_dir,)
    cfg.freeze()

    from dl_swin_gan_tpu.train.gan_trainer import GANTrainer
    trainer = GANTrainer(cfg)
    trainer.fit(train_dir, val_dir, max_epochs=args.max_epochs,
                resume=args.resume)


if __name__ == "__main__":
    main()
