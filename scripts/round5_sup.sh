#!/bin/bash
# Round-5 campaign supervisor (verdict r4 "next round" #1/#3/#6/#7).
#
# Close the quality matrix on CURRENT code with the 6-exam multi-R
# protocol: round 4 proved code drift invalidates old rows (DSLR
# same-config retrain 0.861 -> 0.956), so the round-2-era SE/CBAM/Swin
# 2-exam rows are refreshed here, budget-matched to the ResNet 40-epoch
# row (verdict weak #1/#6); the ceded SwinGAN cells land at the frontier
# winner w=0.003 (ROUND4 #4); the DiT EMA-crossover run (verdict #3)
# doubles as the DiT multi-R rows; DSLR fast-mode gets its 8x/16x
# generalization rows (verdict #7).
#
# Stage order is evidentiary value x wall-clock risk: the three cheap
# conv-family refreshes first (~30 min each incl. rows), then the DiT
# EMA run in a FIXED window so a slow pool cannot starve the stages
# behind it, then SwinGAN, then DSLR-fast with the remainder.
#
# Every stage is idempotent (skips when its CSV exists) so the script can
# be relaunched after a pool storm. Usage:
#   nohup bash scripts/round5_sup.sh <deadline-epoch> > /tmp/r5sup.out 2>&1 &
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
DEADLINE=${1:?usage: round5_sup.sh <deadline-epoch>}
LOG=runs/round5_sup.log
log() { echo "[r5sup $(date +%H:%M:%S)] $*" | tee -a "$LOG"; }
left() { echo $(( DEADLINE - $(date +%s) )); }

# Hold until the diffusion profiler (one-process TPU probe) releases the
# chip — two TPU processes starve each other on this pool.
if [ -f /tmp/profdiff.pid ]; then
  while kill -0 "$(cat /tmp/profdiff.pid)" 2>/dev/null; do
    log "waiting for profile_diffusion ($(left)s left)"; sleep 60
  done
fi

wait_pool() {
  local min_left=${1:-180} i=0
  while :; do
    [ "$(left)" -gt "$min_left" ] || { log "deadline while pool down"; return 1; }
    i=$((i+1))
    if timeout 100 python -c "import jax,numpy as np,jax.numpy as jnp; np.asarray(jax.jit(lambda: jnp.ones(())*2)())" >/dev/null 2>&1; then
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
  [ "$(left)" -gt 120 ] || { log "no eval window for $out@$accel"; return 1; }
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

# conv_refresh <tag> <cfg> <outdir> <label> — 40-epoch budget-matched
# retrain + {12,8,16}x rows for one unrolled conv-family model.
conv_refresh() {
  local tag=$1 cfg=$2 out=$3 label=$4 budget=$5
  if [ ! -f "$out/recon_r5/eval_12accel.csv" ]; then
    wait_pool 420 || return 1
    train scripts/train.py "$cfg" "runs/${tag}.log" "$budget" \
        OUTPUT_DIR "$out" OPTIMIZER.MAX_EPOCHS 40
    evalrow "$cfg" "$out/checkpoints" unrolled "$out/recon_r5" 12 \
        OUTPUT_DIR "$out" || return 1
    commit "$label retrained (40 epochs, current code): 6-exam 12x row" \
        "$out/recon_r5/eval_12accel.csv" "$out/metrics.jsonl" "runs/${tag}.log"
  fi
  for R in 8 16; do
    evalrow "$cfg" "$out/checkpoints" unrolled "$out/recon_r5" "$R" \
        OUTPUT_DIR "$out" && \
    commit "$label ${R}x row (6-exam multi-R matrix)" \
        "$out/recon_r5/eval_${R}accel.csv"
  done
}

# ---- Stage A/B/C: stale-row refresh (SE, CBAM, Swin budget-matched) ----
conv_refresh seq5   configs/quality/se.yaml   runs/seq5   "SE"   1800
conv_refresh cbamq5 configs/quality/cbam.yaml runs/cbamq5 "CBAM" 1800
conv_refresh swinq5 configs/quality/swin.yaml runs/swinq5 \
    "Swin (budget-matched to ResNet row)" 2400

# ---- Stage D: DiT EMA-crossover (fixed window so later stages survive) --
# Reserve for stages E+F+final evals: ~9600s. First diffusion eval pays
# the ~8-min sampling-loop compile; later evals hit the cache.
EVAL_S=1100
if [ "$(left)" -gt 4000 ]; then
  T=$(( $(left) - 9600 - 4*EVAL_S ))
  [ "$T" -gt 7200 ] && T=7200
  if [ ! -f runs/ditema5/recon_r5/eval_12accel.csv ]; then
    wait_pool 420 || exit 0
    [ "$T" -lt 300 ] && T=300
    train scripts/train_DiT.py configs/quality/dit_ema.yaml runs/ditema5.log "$T" \
        OUTPUT_DIR runs/ditema5
    commit "DiT EMA-crossover training: raw-vs-EMA SSIM monitor curve (r5)" \
        runs/ditema5/metrics.jsonl runs/ditema5.log
    evalrow configs/quality/dit_ema.yaml runs/ditema5/checkpoints diffusion \
        runs/ditema5/recon_r5 12 OUTPUT_DIR runs/ditema5
    commit "DiT EMA run: 6-exam 12x raw row" \
        runs/ditema5/recon_r5/eval_12accel.csv runs/ditema5/metrics.jsonl runs/ditema5.log
  fi
  if [ -f runs/ditema5/recon_r5/eval_12accel.csv ]; then
    evalrow configs/quality/dit_ema.yaml runs/ditema5/checkpoints diffusion \
        runs/ditema5/recon_r5_ema 12 --use-ema OUTPUT_DIR runs/ditema5 && \
    commit "DiT EMA row (12x) — EMA-vs-raw crossover check" \
        runs/ditema5/recon_r5_ema/eval_12accel.csv
    for R in 8 16; do
      evalrow configs/quality/dit_ema.yaml runs/ditema5/checkpoints diffusion \
          runs/ditema5/recon_r5 "$R" OUTPUT_DIR runs/ditema5 && \
      commit "DiT ${R}x row (6-exam multi-R matrix)" \
          runs/ditema5/recon_r5/eval_${R}accel.csv
    done
  fi
fi

# ---- Stage E: SwinGAN multi-R at the frontier winner w=0.003 ----------
if [ ! -f runs/sganr5/recon_r5/eval_12accel.csv ]; then
  wait_pool 420 || exit 0
  T=$(( $(left) - 4800 )); [ "$T" -gt 3600 ] && T=3600
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

# ---- Stage F: DSLR fast-mode 8x/16x generalization rows ----------------
if [ ! -f runs/dslrfast5/recon_r5/eval_8accel.csv ]; then
  wait_pool 300 || exit 0
  T=$(( $(left) - 1500 )); [ "$T" -gt 2700 ] && T=2700
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

log "round5 campaign done ($(left)s before deadline)"
