#!/bin/bash
# Round-3 session supervisor X: single-session Latte rescue with tight
# budgets. supW's per-phase gates assume multi-hour budgets (phase 1 alone
# wants >2.2h), so on a short session it would skip everything. supX fits
# the same top-priority work — the latteq4 rescue (VERDICT item 2) — into
# whatever wall clock remains: wait for the pool, train latteq4 under the
# watchdog until T-minus-eval-budget, then eval the newest checkpoint and
# commit the row. Any committed checkpoint/eval beats an empty queue.
# Usage: nohup bash scripts/round3_supX.sh <deadline-epoch> &
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
DEADLINE=${1:?usage: round3_supX.sh <deadline-epoch>}
log() { echo "[supX $(date +%H:%M:%S)] $*"; }
left() { echo $(( DEADLINE - $(date +%s) )); }

# Eval budget: diffusion quality_row needs compile + 100-step sampling.
EVAL_S=900

wait_pool() {
  # $1 (optional): minimum seconds that must remain for waiting to be
  # worthwhile. The pre-training call needs the full train+eval budget;
  # the post-training call only needs enough to attempt an eval — gating
  # it on EVAL_S+300 contradicted the train window (T = left-EVAL_S-120),
  # silently dropping the eval the window was reserved for (ADVICE r3).
  local min_left=${1:-$((EVAL_S + 300))}
  local i=0
  while :; do
    [ "$(left)" -gt "$min_left" ] || { log "deadline while pool down"; return 1; }
    i=$((i+1))
    if timeout 100 python -c "import jax,numpy as np,jax.numpy as jnp; np.asarray(jax.jit(lambda: jnp.ones(())*2)())" >/dev/null 2>&1; then
      log "pool up (attempt $i)"; return 0
    fi
    [ $((i % 5)) -eq 0 ] && log "pool still down (attempt $i)"
    sleep 30
  done
}

wait_pool || exit 0

# ---- train latteq4 until T-minus-eval ----
if [ ! -f runs/latteq4/recon/eval_12accel.csv ]; then
  T=$(( $(left) - EVAL_S - 120 ))
  if [ "$T" -gt 300 ]; then
    log "training latteq4 for up to ${T}s"
    timeout "$T" bash scripts/train_watchdog.sh scripts/train_Latte.py \
        configs/quality/latte2.yaml runs/latteq4.log 30 &
    WD=$!
    wait "$WD"
    log "training window over (rc=$?)"
    tail -2 runs/latteq4.log 2>/dev/null
  else
    log "no training window left (${T}s)"
  fi
  # eval whatever checkpoint exists
  if ls runs/latteq4/checkpoints/* >/dev/null 2>&1; then
    wait_pool 180 || exit 0
    log "evaluating newest latteq4 checkpoint ($(left)s left)"
    EVAL_T=$(( $(left) - 90 )); [ "$EVAL_T" -gt 60 ] || EVAL_T=60
    timeout "$EVAL_T" python scripts/quality_row.py \
        --config-file configs/quality/latte2.yaml \
        --ckpt runs/latteq4/checkpoints --kind diffusion --batch-size 2 \
        --out runs/latteq4/recon > runs/latteq4.eval.log 2>&1
    log "eval rc=$?"; tail -3 runs/latteq4.eval.log
    git add -f runs/latteq4/recon/eval_12accel.csv runs/latteq4.eval.log \
        runs/latteq4/metrics.jsonl 2>/dev/null
    git commit -q -m "Latte 2-shared-unroll rescue: partial-budget quality row (pool-outage session)" 2>/dev/null || true
  else
    log "no checkpoint produced; nothing to eval"
  fi
else
  log "latteq4 row already present"
fi
log "supX done ($(left)s before deadline)"
