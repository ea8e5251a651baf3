#!/bin/bash
# Round-3 extension: trained 2-unroll (shared-weight) Latte quality run.
# Run AFTER round3_followup.sh (shared TPU: strictly sequential).
cd "$(dirname "$0")/.."
export PYTHONPATH=/root/repo:/root/.axon_site
stamp() { echo "[latte2 $(date +%H:%M:%S)] $*"; }

stamp "train: 2-unroll shared-weight Latte (target ~30k steps)"
timeout 12600 bash scripts/train_watchdog.sh scripts/train_Latte.py \
    configs/quality/latte2.yaml runs/latteq4.log 30 --max-epochs 940
stamp "eval"
timeout 3600 python scripts/quality_row.py --config-file configs/quality/latte2.yaml \
    --ckpt runs/latteq4/checkpoints --kind diffusion --batch-size 2 \
    --out runs/latteq4/recon > runs/latteq4.eval.log 2>&1
tail -3 runs/latteq4.eval.log
stamp "done"
