#!/usr/bin/env python
"""DSLR (deep subspace learning reconstruction) training entry point.

TPU-native counterpart of reference `scripts/train_lr.py`: unrolled
alternating-minimization models over locally-low-rank (L, R) factors.
META_ARCHITECTURE in {dslr-pgd, dslr-cg-v1, dslr-cg-v2, modslr-v1, modslr-v2}.
"""

import logging
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

logging.basicConfig(level=logging.INFO)


def main(argv=None):
    from dl_swin_gan_tpu.train.dslr_trainer import DSLRTrainer
    from dl_swin_gan_tpu.train.cli import run_training

    return run_training(lambda cfg: DSLRTrainer(cfg),
                        "Train DSLR low-rank recon on TPU.", argv)


if __name__ == "__main__":
    main()
