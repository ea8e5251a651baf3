#!/bin/bash
# Recipe for the synthetic cine "quality set" used by every row of the
# README quality table and by configs/quality/*.yaml. Deterministic
# (seeded); regenerate after any disk wipe with:
#   bash datasets/make_quality_set.sh
# Shape: 18 phases x 156 ky x 96 kx, 8 coils, 2 emaps, 4 slices/file,
# 8 train / 2 val / 6 test files, k-space noise 0.002.
# Round 4 widened the test split 2 -> 6 (verdict #4); per-file seeds are
# index-based (data/synthetic.py: seed + 97*f + s), so synthetic_000/001
# and every train/val file stay byte-identical — old rows remain comparable.
set -e
cd "$(dirname "$0")/.."
# PYTHONPATH stripped of the axon sitecustomize: this is pure numpy/h5py,
# and the TPU backend init hangs at interpreter startup when the pool is
# down — exactly the post-incident moment this recipe exists for
PYTHONPATH="$(pwd)" python datasets/prepare_synthetic.py --out runs/quality/data \
    --train-files 8 --val-files 2 --test-files 6 --slices 4 \
    --phases 18 --ny 156 --nx 96 --coils 8 --emaps 2 \
    --noise 0.002 --seed 0
