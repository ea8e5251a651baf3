#!/bin/bash
# Round-3 quality campaign: four training stages + evals, strictly
# sequential (the shared TPU starves concurrent processes). Each stage is
# watchdogged against pool crashes and bounded by a hard timeout.
cd "$(dirname "$0")/.."
export PYTHONPATH=/root/repo:/root/.axon_site
stamp() { echo "[campaign $(date +%H:%M:%S)] $*"; }

stamp "stage 1: Latte 12-layer quality run (32k steps)"
timeout 10800 bash scripts/train_watchdog.sh scripts/train_Latte.py \
    configs/quality/latte.yaml runs/latteq3.log 30
stamp "stage 1 eval (raw + EMA)"
timeout 3600 python scripts/quality_row.py --config-file configs/quality/latte.yaml \
    --ckpt runs/latteq3/checkpoints --kind diffusion --out runs/latteq3/recon \
    > runs/latteq3.eval.log 2>&1
timeout 3600 python scripts/quality_row.py --config-file configs/quality/latte.yaml \
    --ckpt runs/latteq3/checkpoints --kind diffusion --use-ema \
    --out runs/latteq3/recon_ema > runs/latteq3.evalema.log 2>&1

stamp "stage 2: DiT resume to 30k steps (EMA validation)"
timeout 14400 bash scripts/train_watchdog.sh scripts/train_DiT.py \
    configs/quality/dit.yaml runs/ditq4.log 30 \
    --max-epochs 940 DATALOADER.DEVICE_PIPELINE True EVAL.CKPT_EVERY_N_STEPS 64
stamp "stage 2 eval (raw + EMA)"
timeout 3600 python scripts/quality_row.py --config-file configs/quality/dit.yaml \
    --ckpt runs/ditq2/checkpoints --kind diffusion --out runs/ditq2/recon30k \
    > runs/ditq4.eval.log 2>&1
timeout 3600 python scripts/quality_row.py --config-file configs/quality/dit.yaml \
    --ckpt runs/ditq2/checkpoints --kind diffusion --use-ema \
    --out runs/ditq2/recon30k_ema > runs/ditq4.evalema.log 2>&1

stamp "stage 3: SwinGAN quality run"
timeout 10800 bash scripts/train_watchdog.sh scripts/train_swin_gan.py \
    configs/quality/swingan.yaml runs/sganq3.log 30
stamp "stage 3 eval"
timeout 2400 python scripts/quality_row.py --config-file configs/quality/swingan.yaml \
    --ckpt runs/sganq3/checkpoints --kind unrolled --out runs/sganq3/recon \
    > runs/sganq3.eval.log 2>&1

stamp "stage 4: bf16-trunk flagship quality run"
timeout 7200 bash scripts/train_watchdog.sh scripts/train.py \
    configs/quality/resnet_bf16.yaml runs/resbf16.log 30
stamp "stage 4 eval"
timeout 2400 python scripts/quality_row.py --config-file configs/quality/resnet_bf16.yaml \
    --ckpt runs/resbf16/checkpoints --kind unrolled --out runs/resbf16/recon \
    > runs/resbf16.eval.log 2>&1

stamp "campaign done"
