#!/bin/bash
# Round-3 follow-ups, run AFTER round3_campaign.sh exits (shared TPU:
# strictly sequential). Cheap measurements first:
#   1. Latte sampling-time unroll-reuse sweep on the converged latteq3
#      checkpoint (bisects the below-baseline row without retraining)
#   2. component profiles: headline train step + DSLR train step
#   3. DSLR bench baseline for this pool session (variant comparisons
#      must be in-session; BENCH_r02 came from another session)
cd "$(dirname "$0")/.."
export PYTHONPATH=/root/repo:/root/.axon_site
stamp() { echo "[followup $(date +%H:%M:%S)] $*"; }

stamp "1a: latte sampling with 2 shared-weight unroll reuses"
timeout 2400 python scripts/quality_row.py --config-file configs/quality/latte.yaml \
    --ckpt runs/latteq3/checkpoints --kind diffusion --batch-size 2 \
    --out runs/latteq3/recon_u2 \
    MODEL.PARAMETERS.NUM_UNROLLS 2 MODEL.PARAMETERS.SHARE_WEIGHTS True \
    > runs/latteq3.evalu2.log 2>&1
tail -3 runs/latteq3.evalu2.log

stamp "1b: latte sampling with 3 shared-weight unroll reuses"
timeout 2400 python scripts/quality_row.py --config-file configs/quality/latte.yaml \
    --ckpt runs/latteq3/checkpoints --kind diffusion --batch-size 2 \
    --out runs/latteq3/recon_u3 \
    MODEL.PARAMETERS.NUM_UNROLLS 3 MODEL.PARAMETERS.SHARE_WEIGHTS True \
    > runs/latteq3.evalu3.log 2>&1
tail -3 runs/latteq3.evalu3.log

stamp "2a: headline component profile (f32 bs=1 / bs=8 / bf16 bs=8)"
timeout 1800 python scripts/profile_headline.py 2>&1 | tail -12 | tee runs/profile_headline.log
BENCH_BATCH=8 PROFILE_REMAT=1 timeout 1800 python scripts/profile_headline.py 2>&1 \
    | tail -12 | tee -a runs/profile_headline.log
BENCH_BATCH=8 PROFILE_REMAT=1 PROFILE_DTYPE=bfloat16 timeout 1800 \
    python scripts/profile_headline.py 2>&1 | tail -12 | tee -a runs/profile_headline.log

stamp "2b: DSLR component profile"
timeout 1800 python scripts/profile_dslr.py 2>&1 | tail -12 | tee runs/profile_dslr.log

stamp "3: DSLR bench baseline (this pool session)"
BENCH_WORKLOAD=dslr timeout 1800 python bench.py 2>/dev/null | tail -1 | tee runs/dslr_bench_r3.log

stamp "followup done"

stamp "4: deployment-path e2e recon bench (host pipeline + transfer, prefetch-overlapped)"
BENCH_WORKLOAD=recon_e2e timeout 1800 python bench.py 2>/dev/null | tail -1 | tee runs/recon_e2e_r3.log

stamp "5: DSLR operating-point sweep (batched + trace-unrolled CG)"
BENCH_WORKLOAD=dslr BENCH_BATCH=4 timeout 1800 python bench.py 2>/dev/null | tail -1 | tee -a runs/dslr_bench_r3.log
BENCH_WORKLOAD=dslr DL_SWIN_GAN_CG_UNROLL=1 timeout 1800 python bench.py 2>/dev/null | tail -1 | tee -a runs/dslr_bench_r3.log
BENCH_WORKLOAD=dslr BENCH_BATCH=4 DL_SWIN_GAN_CG_UNROLL=1 timeout 1800 python bench.py 2>/dev/null | tail -1 | tee -a runs/dslr_bench_r3.log

stamp "6: headline batched scaling point (B=16, remat)"
BENCH_BATCH=16 BENCH_NO_BATCHED=1 timeout 1800 python bench.py 2>/dev/null | tail -1 | tee runs/headline_b16_r3.log
