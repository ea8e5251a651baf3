#!/bin/bash
# Round-4 campaign supervisor, revision F: stage B only.
#
# Fresh session after a disk wipe — every earlier stage (Z, A2, F/F6/P,
# D, E) already has its artifacts committed under runs/ (see
# docs/ROUND4.md); their checkpoints are gone, so the only stage that can
# still make progress in one session is B, the DiT EMA-crossover run
# (verdict #9) which doubles as the DiT row of the multi-R quality
# matrix (verdict #4). The SwinGAN multi-R cells would need a full
# retrain (~1h on their own) and are explicitly ceded to the next round.
#
# Eval order inside B is by evidentiary value: the 12x raw and 12x EMA
# rows are the crossover claim; 8x/16x are matrix fill. The
# EVAL.RECON_SSIM_EVERY_N_EPOCHS monitor writes the full raw-vs-EMA
# SSIM-vs-step curve into metrics.jsonl during training, so the curve
# survives even if the deadline eats the endpoint evals.
# Usage: nohup bash scripts/round4_supF.sh <deadline-epoch> > /tmp/r4supF.out 2>&1 &
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
DEADLINE=${1:?usage: round4_supF.sh <deadline-epoch>}
LOG=runs/round4_sup.log
log() { echo "[r4supF $(date +%H:%M:%S)] $*" | tee -a "$LOG"; }
left() { echo $(( DEADLINE - $(date +%s) )); }

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
  # -ge, not -gt: the caller floors a collapsed window to exactly 300s and
  # that floor must still train (ADVICE r4: -gt made the floor dead code)
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
  # don't launch an eval that can't finish before the deadline (ADVICE r4:
  # the old 60s clamp allowed a post-deadline launch)
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
  # one git add per path: a single multi-path add fatals on the first
  # missing path and silently drops the rest (ADVICE r4)
  local msg=$1 p; shift
  for p in "$@"; do [ -e "$p" ] && git add -f "$p" 2>/dev/null; done
  git commit -q -m "$msg" 2>/dev/null && log "committed: $msg" || true
}

# dataset must exist (disk wipe): make_quality_set.sh is idempotent/seeded —
# run it directly instead of spinning forever waiting for someone else to
# (ADVICE r4)
if [ ! -f runs/quality/data/test/synthetic_005.h5 ]; then
  log "regenerating quality dataset"
  bash datasets/make_quality_set.sh >> "$LOG" 2>&1
fi

# ---------------- Stage B: DiT EMA crossover (deadline-bounded) ----------------
# Reserve: first diffusion eval pays the sampling-loop compile (relay,
# worst case ~10 min); later evals reuse the cache. 12x raw + EMA are
# non-negotiable; 8x/16x run only if time remains. When a pool outage has
# eaten most of the window, training still gets a 300s floor (the DiT row
# needs SOME checkpoint; a ~5-7k-step run scored 0.912 on the old
# protocol, runs/ditq2) as long as at least one eval can follow.
EVAL_S=1100
if [ ! -f runs/ditema/recon_r4/eval_12accel.csv ]; then
  wait_pool 420 || exit 0
  T=$(( $(left) - EVAL_S - 120 )); [ "$T" -lt 300 ] && T=300
  train scripts/train_DiT.py configs/quality/dit_ema.yaml runs/ditema.log "$T"
  commit "DiT EMA-crossover training: raw-vs-EMA SSIM monitor curve" \
      runs/ditema/metrics.jsonl runs/ditema.log
  evalrow configs/quality/dit_ema.yaml runs/ditema/checkpoints diffusion \
      runs/ditema/recon_r4 12
  commit "DiT EMA-crossover run: 6-exam 12x raw row" \
      runs/ditema/recon_r4/eval_12accel.csv runs/ditema/metrics.jsonl runs/ditema.log
fi
if [ -f runs/ditema/recon_r4/eval_12accel.csv ]; then
  evalrow configs/quality/dit_ema.yaml runs/ditema/checkpoints diffusion \
      runs/ditema/recon_r4_ema 12 --use-ema
  commit "DiT EMA row (12x) — EMA-vs-raw crossover check" \
      runs/ditema/recon_r4_ema/eval_12accel.csv
  evalrow configs/quality/dit_ema.yaml runs/ditema/checkpoints diffusion \
      runs/ditema/recon_r4 8
  commit "DiT 8x row" runs/ditema/recon_r4/eval_8accel.csv
  evalrow configs/quality/dit_ema.yaml runs/ditema/checkpoints diffusion \
      runs/ditema/recon_r4 16
  commit "DiT 16x row" runs/ditema/recon_r4/eval_16accel.csv
fi

log "round4 campaign (rev F) done ($(left)s before deadline)"
