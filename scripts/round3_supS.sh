#!/bin/bash
# Round-3 follow-on supervisor S: runs AFTER round3_supR.sh exits (polls its
# pidfile), shares its absolute deadline. One in-session, mutually-comparable
# sweep of the per-workload bench rows so the README table can be refreshed
# from a single pool session, plus the bf16-trunk recon variant.
# Usage: nohup bash scripts/round3_supS.sh <deadline-epoch> [<supR-pidfile>] &
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
DEADLINE=${1:?usage: round3_supS.sh <deadline-epoch> [pidfile]}
PIDFILE=${2:-/tmp/supR2.pid}
log() { echo "[supS $(date +%H:%M:%S)] $*"; }
left() { echo $(( DEADLINE - $(date +%s) )); }
fits() { [ "$(left)" -gt "$1" ]; }

# wait for supR to finish (it owns the TPU until then)
if [ -f "$PIDFILE" ]; then
  while kill -0 "$(cat "$PIDFILE")" 2>/dev/null; do
    fits 600 || { log "deadline while waiting for supR"; exit 0; }
    sleep 60
  done
fi
log "supR done; starting"

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
      | sed "s/^/[$LABEL] /" | tee -a runs/bench_table_r3.log
}

if fits 10800; then
  : > runs/bench_table_r3.log
  row headline      2400
  row recon         1500 BENCH_WORKLOAD=recon
  row recon_b8      1500 BENCH_WORKLOAD=recon BENCH_BATCH=8
  row recon_bf16    1500 BENCH_WORKLOAD=recon BENCH_DTYPE=bfloat16
  row swin          2100 BENCH_WORKLOAD=swin
  row gan           2100 BENCH_WORKLOAD=gan
  row dit           2100 BENCH_WORKLOAD=dit
  row latte         2100 BENCH_WORKLOAD=latte
  row dslr          2100 BENCH_WORKLOAD=dslr
  git add -f runs/bench_table_r3.log 2>/dev/null
  git commit -q -m "Measured: one-session per-workload bench table sweep" 2>/dev/null
else
  log "skip table sweep (deadline)"
fi
log "supervisor S done ($(left)s before deadline)"
