#!/bin/bash
# Round-5 final-session supervisor, rev I — the pool has now been down
# twice for 25+ min stretches; on each recovery run the highest-value
# pending item FIRST and give it a deadline-aware window:
#   I1  LLR fused-kernel TPU A/B (verdict #5 decision point)
#   I2  SwinGAN 16x row (last ceded multi-R cell)
#   I3  DSLR fast-mode retrain + {8,16,12}x rows (verdict #7)
#   I4  DiT leftover-window retrain + multi-R rows
# Usage: nohup bash scripts/round5_supI.sh <deadline-epoch> &
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
DEADLINE=${1:?usage: round5_supI.sh <deadline-epoch>}
LOG=runs/round5_supG.log
log() { echo "[r5supI $(date +%H:%M:%S)] $*" | tee -a "$LOG"; }
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

train() {
  local script=$1 cfg=$2 tlog=$3 budget=$4; shift 4
  local t=$budget
  [ "$t" -ge 300 ] || { log "no window for $tlog"; return 1; }
  log "train $script $cfg for up to ${t}s ($*)"
  timeout "$t" bash scripts/train_watchdog.sh "$script" "$cfg" "$tlog" 30 "$@"
  log "train window over for $tlog (rc=$?)"
  tail -2 "$tlog" 2>/dev/null | tee -a "$LOG" || true
}

evalrow() {
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

commit() {
  local msg=$1 p; shift
  for p in "$@"; do [ -e "$p" ] && git add -f "$p" 2>/dev/null; done
  git commit -q -m "$msg" 2>/dev/null && log "committed: $msg" || true
}

# ---- I1: LLR fused-kernel TPU A/B --------------------------------------
if [ ! -f runs/profile_llr_fused_r5.log ]; then
  wait_pool 600 || exit 0
  if [ "$(left)" -gt 1800 ]; then
    T=$(( $(left) - 1300 )); [ "$T" -gt 2200 ] && T=2200
    log "LLR fused A/B (jacobi paired config, ${T}s window)"
    { echo "== LLR_AB_CONFIG=configs/quality/dslr_fast.yaml $(date)";
      timeout "$T" env LLR_AB_CONFIG=configs/quality/dslr_fast.yaml \
        python scripts/profile_llr_fused.py; echo "rc=$?"; } \
        > runs/profile_llr_fused_r5.log 2>&1
    tail -8 runs/profile_llr_fused_r5.log | tee -a "$LOG"
    commit "LLR fused-kernel TPU A/B (r5): committed measurement log" \
        runs/profile_llr_fused_r5.log
  else
    log "window too small for A/B ($(left)s)"
  fi
fi

# ---- I2: the last SwinGAN cell -----------------------------------------
evalrow configs/quality/swingan.yaml runs/sganr5/checkpoints unrolled \
    runs/sganr5/recon_r5 16 OUTPUT_DIR runs/sganr5 && \
commit "SwinGAN w=0.003 16x row — the ceded round-4 multi-R cells" \
    runs/sganr5/recon_r5/eval_16accel.csv

# ---- I3: DSLR fast-mode retrain + multi-R rows -------------------------
if [ ! -f runs/dslrfast5/recon_r5/eval_8accel.csv ] && [ "$(left)" -gt 3300 ]; then
  wait_pool 300 || exit 0
  T=$(( $(left) - 3000 )); [ "$T" -gt 1800 ] && T=1800
  train scripts/train_lr.py configs/quality/dslr_fast.yaml runs/dslrfast5.log "$T" \
      OUTPUT_DIR runs/dslrfast5
  evalrow configs/quality/dslr_fast.yaml runs/dslrfast5/checkpoints dslr \
      runs/dslrfast5/recon_r5 8 OUTPUT_DIR runs/dslrfast5
  commit "DSLR fast-mode 8x row (config-default jacobi/6)" \
      runs/dslrfast5/recon_r5/eval_8accel.csv runs/dslrfast5/metrics.jsonl runs/dslrfast5.log
fi
if [ -d runs/dslrfast5/checkpoints ]; then
  evalrow configs/quality/dslr_fast.yaml runs/dslrfast5/checkpoints dslr \
      runs/dslrfast5/recon_r5 16 OUTPUT_DIR runs/dslrfast5 && \
  commit "DSLR fast-mode 16x row" runs/dslrfast5/recon_r5/eval_16accel.csv
  evalrow configs/quality/dslr_fast.yaml runs/dslrfast5/checkpoints dslr \
      runs/dslrfast5/recon_r5 12 OUTPUT_DIR runs/dslrfast5 && \
  commit "DSLR fast-mode 12x row (same-session cross-check vs runs/dslrfast6)" \
      runs/dslrfast5/recon_r5/eval_12accel.csv
fi

# ---- I4: DiT leftover-window retrain + multi-R from one snapshot -------
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

log "rev-I campaign done ($(left)s before deadline)"
