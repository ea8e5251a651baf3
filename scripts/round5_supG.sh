#!/bin/bash
# Round-5 final-session supervisor: the cells still open after the disk
# wipe took every checkpoint (committed CSVs survived; see round5_sup.sh
# for stages A-D already landed).
#
# Stage order = evidentiary value x wall-clock risk on a slow pool
# (this session's trivial-jit probe took 329s):
#   G1  SwinGAN w=0.003 retrain + {12,8,16}x rows  (ceded in rounds 3+4)
#   G2  DSLR fast-mode retrain + {8,16,12}x rows   (verdict #7)
#   G3  LLR fused-kernel TPU A/B                   (verdict #5 close-out)
#   G4  DiT retrain in the leftover window + {12,8,16}x rows from ONE
#       snapshot (the ditema5 20.3k checkpoint died with the disk; a
#       shorter-budget row labeled with its step count is honest)
#
# Idempotent per-cell (skips when the CSV exists); relaunchable after a
# pool storm. Usage:
#   nohup bash scripts/round5_supG.sh <deadline-epoch> > /tmp/r5supG.out 2>&1 &
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
DEADLINE=${1:?usage: round5_supG.sh <deadline-epoch>}
LOG=runs/round5_supG.log
log() { echo "[r5supG $(date +%H:%M:%S)] $*" | tee -a "$LOG"; }
left() { echo $(( DEADLINE - $(date +%s) )); }

wait_pool() {
  local min_left=${1:-180} i=0
  while :; do
    [ "$(left)" -gt "$min_left" ] || { log "deadline while pool down"; return 1; }
    i=$((i+1))
    if timeout 400 python -c "import jax,numpy as np,jax.numpy as jnp; np.asarray(jax.jit(lambda: jnp.ones(())*2)())" >/dev/null 2>&1; then
      [ $i -gt 1 ] && log "pool up (attempt $i)"; return 0
    fi
    [ $((i % 5)) -eq 0 ] && log "pool still down (attempt $i)"
    sleep 20
  done
}

train() {  # train <script> <cfg> <log> <budget-s> [overrides...]
  local script=$1 cfg=$2 tlog=$3 budget=$4; shift 4
  local t=$budget
  [ "$t" -ge 300 ] || { log "no window for $tlog"; return 1; }
  log "train $script $cfg for up to ${t}s ($*)"
  timeout "$t" bash scripts/train_watchdog.sh "$script" "$cfg" "$tlog" 30 "$@"
  log "train window over for $tlog (rc=$?)"
  tail -2 "$tlog" 2>/dev/null | tee -a "$LOG" || true
}

evalrow() {  # evalrow <cfg> <ckpt> <kind> <out> <accel> [extra...]
  local cfg=$1 ckpt=$2 kind=$3 out=$4 accel=$5; shift 5
  [ -f "$out/eval_${accel}accel.csv" ] && { log "skip eval $out@$accel (done)"; return 0; }
  wait_pool 120 || return 1
  [ "$(left)" -gt 180 ] || { log "no eval window for $out@$accel"; return 1; }
  local t=$(( $(left) - 60 ))
  local ck=(); [ "$ckpt" != "-" ] && ck=(--ckpt "$ckpt")
  log "eval $kind $out @ ${accel}x"
  timeout "$t" python scripts/quality_row.py --config-file "$cfg" \
      "${ck[@]}" --kind "$kind" --out "$out" --acceleration "$accel" \
      --batch-size 4 "$@" >> "$LOG" 2>&1
  local rc=$?
  log "eval rc=$rc"; tail -1 "$out/eval_${accel}accel.csv" 2>/dev/null | tee -a "$LOG"
  return $rc
}

commit() {  # commit <msg> <paths...>
  local msg=$1 p; shift
  for p in "$@"; do [ -e "$p" ] && git add -f "$p" 2>/dev/null; done
  git commit -q -m "$msg" 2>/dev/null && log "committed: $msg" || true
}

# dataset must exist (disk wipe): make_quality_set.sh is idempotent/seeded
if [ ! -f runs/quality/data/test/synthetic_005.h5 ]; then
  log "regenerating quality dataset"
  bash datasets/make_quality_set.sh >> "$LOG" 2>&1
fi

# ---- G1: SwinGAN multi-R at the frontier winner w=0.003 ----------------
if [ ! -f runs/sganr5/recon_r5/eval_12accel.csv ]; then
  wait_pool 420 || exit 0
  T=$(( $(left) - 6000 )); [ "$T" -gt 3000 ] && T=3000
  train scripts/train_swin_gan.py configs/quality/swingan.yaml runs/sganr5.log "$T" \
      OUTPUT_DIR runs/sganr5 MODEL.GAN.ADV_WEIGHT 0.003
  evalrow configs/quality/swingan.yaml runs/sganr5/checkpoints unrolled \
      runs/sganr5/recon_r5 12 OUTPUT_DIR runs/sganr5
  commit "SwinGAN w=0.003 retrain (r5): 6-exam 12x row" \
      runs/sganr5/recon_r5/eval_12accel.csv runs/sganr5/metrics.jsonl runs/sganr5.log
fi
for R in 8 16; do
  evalrow configs/quality/swingan.yaml runs/sganr5/checkpoints unrolled \
      runs/sganr5/recon_r5 "$R" OUTPUT_DIR runs/sganr5 && \
  commit "SwinGAN w=0.003 ${R}x row — the ceded round-4 multi-R cells" \
      runs/sganr5/recon_r5/eval_${R}accel.csv
done

# ---- G2: DSLR fast-mode multi-R rows -----------------------------------
if [ ! -f runs/dslrfast5/recon_r5/eval_8accel.csv ]; then
  wait_pool 300 || exit 0
  T=$(( $(left) - 3600 )); [ "$T" -gt 2400 ] && T=2400
  train scripts/train_lr.py configs/quality/dslr_fast.yaml runs/dslrfast5.log "$T" \
      OUTPUT_DIR runs/dslrfast5
  evalrow configs/quality/dslr_fast.yaml runs/dslrfast5/checkpoints dslr \
      runs/dslrfast5/recon_r5 8 OUTPUT_DIR runs/dslrfast5
  commit "DSLR fast-mode 8x row (config-default jacobi/6)" \
      runs/dslrfast5/recon_r5/eval_8accel.csv runs/dslrfast5/metrics.jsonl runs/dslrfast5.log
fi
evalrow configs/quality/dslr_fast.yaml runs/dslrfast5/checkpoints dslr \
    runs/dslrfast5/recon_r5 16 OUTPUT_DIR runs/dslrfast5 && \
commit "DSLR fast-mode 16x row" runs/dslrfast5/recon_r5/eval_16accel.csv
evalrow configs/quality/dslr_fast.yaml runs/dslrfast5/checkpoints dslr \
    runs/dslrfast5/recon_r5 12 OUTPUT_DIR runs/dslrfast5 && \
commit "DSLR fast-mode 12x row (same-session cross-check vs runs/dslrfast6)" \
    runs/dslrfast5/recon_r5/eval_12accel.csv

# ---- G3: LLR fused-kernel TPU A/B (verdict #5) -------------------------
# Run on the jacobi paired config first (the mode the kernel batches into
# one S=2 launch; compile relay cache is warm from G2's training), then
# the parity cg-v1 config.
if [ ! -f runs/profile_llr_fused_r5.log ] && [ "$(left)" -gt 2400 ]; then
  wait_pool 300 || exit 0
  log "LLR fused A/B (jacobi paired config)"
  { echo "== LLR_AB_CONFIG=configs/quality/dslr_fast.yaml $(date)";
    timeout 2000 env LLR_AB_CONFIG=configs/quality/dslr_fast.yaml \
      python scripts/profile_llr_fused.py; } \
      > runs/profile_llr_fused_r5.log 2>&1
  tail -6 runs/profile_llr_fused_r5.log | tee -a "$LOG"
  if [ "$(left)" -gt 3600 ]; then
    log "LLR fused A/B (parity cg-v1 config)"
    { echo "== LLR_AB_CONFIG=configs/config_dslr.yaml $(date)";
      timeout 2000 python scripts/profile_llr_fused.py; } \
      >> runs/profile_llr_fused_r5.log 2>&1
    tail -6 runs/profile_llr_fused_r5.log | tee -a "$LOG"
  fi
  commit "LLR fused-kernel TPU A/B (r5): committed measurement log" \
      runs/profile_llr_fused_r5.log
fi

# ---- G4: DiT leftover-window retrain + multi-R from one snapshot -------
# The 20.3k ditema5 checkpoint is gone; train what fits and take ALL
# three R rows from the same snapshot (labeled by step count).
EVAL_S=1100
if [ "$(left)" -gt $(( 3*EVAL_S + 1200 )) ]; then
  if [ ! -f runs/ditr5/recon_r5/eval_12accel.csv ]; then
    wait_pool 420 || exit 0
    T=$(( $(left) - 3*EVAL_S - 600 ))
    [ "$T" -gt 5400 ] && T=5400
    train scripts/train_DiT.py configs/quality/dit_ema.yaml runs/ditr5.log "$T" \
        OUTPUT_DIR runs/ditr5
    commit "DiT r5 leftover-window retrain (multi-R snapshot)" \
        runs/ditr5/metrics.jsonl runs/ditr5.log
    evalrow configs/quality/dit_ema.yaml runs/ditr5/checkpoints diffusion \
        runs/ditr5/recon_r5 12 OUTPUT_DIR runs/ditr5
    commit "DiT r5: 6-exam 12x raw row (leftover-window snapshot)" \
        runs/ditr5/recon_r5/eval_12accel.csv
  fi
  for R in 8 16; do
    evalrow configs/quality/dit_ema.yaml runs/ditr5/checkpoints diffusion \
        runs/ditr5/recon_r5 "$R" OUTPUT_DIR runs/ditr5 && \
    commit "DiT r5 ${R}x row (6-exam multi-R matrix, same snapshot)" \
        runs/ditr5/recon_r5/eval_${R}accel.csv
  done
fi

log "round5 final-session campaign done ($(left)s before deadline)"
