#!/bin/bash
# Round-5 final-session supervisor, rev J — DSLR fast-mode rows only, run
# after the foreground LLR A/B releases the chip. 8x and 16x are the
# verdict-#7 cells; 12x is a same-session cross-check and yields first.
# Usage: nohup bash scripts/round5_supJ.sh <deadline-epoch> &
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
DEADLINE=${1:?usage: round5_supJ.sh <deadline-epoch>}
LOG=runs/round5_supG.log
log() { echo "[r5supJ $(date +%H:%M:%S)] $*" | tee -a "$LOG"; }
left() { echo $(( DEADLINE - $(date +%s) )); }

# hold until the A/B pid exits (one TPU process at a time)
if [ -f /tmp/llr_ab.pid ]; then
  while kill -0 "$(cat /tmp/llr_ab.pid)" 2>/dev/null; do
    log "waiting for LLR A/B ($(left)s left)"; sleep 30
  done
fi

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

evalrow() {
  local cfg=$1 ckpt=$2 kind=$3 out=$4 accel=$5; shift 5
  [ -f "$out/eval_${accel}accel.csv" ] && { log "skip eval $out@$accel (done)"; return 0; }
  wait_pool 120 || return 1
  [ "$(left)" -gt 180 ] || { log "no eval window for $out@$accel"; return 1; }
  local t=$(( $(left) - 30 ))
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

if [ ! -d runs/dslrfast5/checkpoints ]; then
  wait_pool 300 || exit 0
  T=$(( $(left) - 2600 )); [ "$T" -gt 1800 ] && T=1800
  if [ "$T" -ge 300 ]; then
    log "train dslr_fast for up to ${T}s"
    timeout "$T" bash scripts/train_watchdog.sh scripts/train_lr.py \
        configs/quality/dslr_fast.yaml runs/dslrfast5.log 30 \
        OUTPUT_DIR runs/dslrfast5
    log "train window over (rc=$?)"
    tail -2 runs/dslrfast5.log 2>/dev/null | tee -a "$LOG" || true
    commit "DSLR fast-mode r5 retrain (final-session window)" \
        runs/dslrfast5/metrics.jsonl runs/dslrfast5.log
  else
    log "no training window left ($(left)s)"; exit 0
  fi
fi
for R in 8 16 12; do
  evalrow configs/quality/dslr_fast.yaml runs/dslrfast5/checkpoints dslr \
      runs/dslrfast5/recon_r5 "$R" OUTPUT_DIR runs/dslrfast5 && \
  commit "DSLR fast-mode ${R}x row (r5 snapshot)" \
      runs/dslrfast5/recon_r5/eval_${R}accel.csv
done
log "rev-J done ($(left)s before deadline)"
