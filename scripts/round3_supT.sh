#!/bin/bash
# Round-3 follow-on supervisor T: batched diffusion train-step bench rows.
# DiT sits at 5.8% MFU at the reference's bs=1 protocol point; the headline
# workload gained 2x MFU from batching slices — measure the same lever on
# the diffusion steps. Chains on supS's pidfile; shares the deadline.
# Usage: nohup bash scripts/round3_supT.sh <deadline-epoch> [<supS-pidfile>] &
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
DEADLINE=${1:?usage: round3_supT.sh <deadline-epoch> [pidfile]}
PIDFILE=${2:-/tmp/supS.pid}
log() { echo "[supT $(date +%H:%M:%S)] $*"; }
left() { echo $(( DEADLINE - $(date +%s) )); }
fits() { [ "$(left)" -gt "$1" ]; }

if [ -f "$PIDFILE" ]; then
  while kill -0 "$(cat "$PIDFILE")" 2>/dev/null; do
    fits 600 || { log "deadline while waiting for supS"; exit 0; }
    sleep 60
  done
fi
log "supS done; starting"

wait_pool() {
  while :; do
    fits 300 || { log "deadline reached while pool down"; exit 0; }
    if timeout 120 python -c "import jax,numpy as np,jax.numpy as jnp; np.asarray(jax.jit(lambda: jnp.ones(())*2)())" >/dev/null 2>&1; then
      return 0
    fi
    sleep 45
  done
}

row() {  # row <label> <timeout> [ENV=val ...]
  local LABEL=$1 T=$2; shift 2
  wait_pool
  log "row: $LABEL"
  env "$@" timeout "$T" python bench.py 2>/dev/null | tail -1 \
      | sed "s/^/[$LABEL] /" | tee -a runs/bench_diffusion_batched_r3.log
}

if fits 9000; then
  : > runs/bench_diffusion_batched_r3.log
  row dit_b4        2400 BENCH_WORKLOAD=dit   BENCH_BATCH=4
  row latte_b4      2400 BENCH_WORKLOAD=latte BENCH_BATCH=4
  row dit_b4_bf16   2400 BENCH_WORKLOAD=dit   BENCH_BATCH=4 BENCH_DTYPE=bfloat16
  row latte_b4_bf16 2400 BENCH_WORKLOAD=latte BENCH_BATCH=4 BENCH_DTYPE=bfloat16
  git add -f runs/bench_diffusion_batched_r3.log 2>/dev/null
  git commit -q -m "Measured: batched (B=4) DiT/Latte train-step bench rows, f32 + bf16" 2>/dev/null
else
  log "skip batched diffusion rows (deadline)"
fi
log "supervisor T done ($(left)s before deadline)"
