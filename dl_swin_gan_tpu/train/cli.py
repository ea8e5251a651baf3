"""Shared training-script CLI.

The reference ships one ~250-line trainer script per model family, each a
whitespace clone of scripts/train.py (SURVEY §2.7); here the per-family
scripts are thin entry points over this one helper, so argument parsing,
seeding, synthetic-data bootstrap, and the freeze discipline cannot drift
between families.
"""

import argparse
import logging
import os
import random

import numpy as np

from dl_swin_gan_tpu.config import load_cfg

logger = logging.getLogger(__name__)


def _ensure_synthetic(directory: str, **kwargs) -> None:
    """Regenerate a synthetic split only when it is missing or empty —
    checked PER SPLIT: a run killed between the train and val writes must
    heal the val split on the rerun, not skip generation entirely."""
    from dl_swin_gan_tpu.data.synthetic import write_synthetic_dataset

    if not os.path.isdir(directory) or not os.listdir(directory):
        write_synthetic_dataset(directory, **kwargs)


def run_training(make_trainer, description: str, argv=None):
    """Parse the standard training CLI, build the trainer, fit.

    make_trainer: cfg -> trainer (must expose .fit(train_dir, val_dir,
    max_epochs=..., resume=...)).
    """
    parser = argparse.ArgumentParser(description=description)
    parser.add_argument("--config-file", type=str, required=True)
    parser.add_argument("--resume", action="store_true")
    parser.add_argument("--max-epochs", type=int, default=None)
    parser.add_argument("--synthetic-data", action="store_true",
                        help="generate a synthetic cine dataset under OUTPUT_DIR")
    parser.add_argument("opts", nargs="*", help="KEY VALUE config overrides")
    args = parser.parse_args(argv)

    # OUTPUT_DIR may come from the YAML or from a KEY VALUE override — the
    # requirement is checked after the merge, so one template config can fan
    # out to per-run output dirs on the command line
    cfg = load_cfg(args.config_file, require_output_dir=False, freeze=False)
    if args.opts:
        cfg.merge_from_list(args.opts)
    if not cfg.OUTPUT_DIR:
        parser.error("OUTPUT_DIR must be set (in the YAML or as a "
                     "'OUTPUT_DIR <path>' override)")

    random.seed(cfg.SEED)
    np.random.seed(cfg.SEED)

    train_dir = cfg.DATASET.TRAIN[0] if cfg.DATASET.TRAIN else None
    val_dir = cfg.DATASET.VAL[0] if cfg.DATASET.VAL else None
    if args.synthetic_data:
        train_dir = os.path.join(cfg.OUTPUT_DIR, "data", "train")
        val_dir = os.path.join(cfg.OUTPUT_DIR, "data", "val")
        _ensure_synthetic(train_dir, num_files=4, slices=2, seed=cfg.SEED)
        _ensure_synthetic(val_dir, num_files=1, slices=2,
                          seed=cfg.SEED + 10_000)
        cfg.DATASET.TRAIN = (train_dir,)
        cfg.DATASET.VAL = (val_dir,)
    cfg.freeze()

    trainer = make_trainer(cfg)
    return trainer.fit(train_dir, val_dir, max_epochs=args.max_epochs,
                       resume=args.resume)
