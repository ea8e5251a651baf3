#!/bin/bash
# Round-3 renewal supervisor U: if the TPU pool outage outlives the current
# supR/supS/supT deadline (observed outages can exceed 14h), the whole queued
# measurement/rescue chain dies unexecuted. supU waits for supT to exit, then
# re-runs the same priority chain synchronously under a renewed deadline:
#   supR (Latte rescue + lowering verdict + final bench rows)
#   -> supS (per-workload bench table sweep)
#   -> supT (batched diffusion rows)
# Each stage keeps its own fits() guards, so nothing starts that cannot
# finish before the renewed deadline.
# Usage: nohup bash scripts/round3_supU.sh <deadline-epoch> [<supT-pidfile>] &
cd /root/repo
DEADLINE=${1:?usage: round3_supU.sh <deadline-epoch> [pidfile]}
PIDFILE=${2:-/tmp/supT.pid}
log() { echo "[supU $(date +%H:%M:%S)] $*"; }

if [ -f "$PIDFILE" ]; then
  while kill -0 "$(cat "$PIDFILE")" 2>/dev/null; do
    [ $(( DEADLINE - $(date +%s) )) -gt 600 ] || { log "deadline while waiting for supT"; exit 0; }
    sleep 60
  done
fi
log "supT done; relaunching unfinished stages with deadline $DEADLINE"

# Artifact-gated: only rerun a stage whose first run never produced its
# decision-critical output (i.e. it was skipped against the old deadline
# while the pool was down). Avoids double-training/benching if the pool
# came back in time for the original chain.
if [ ! -f runs/latteq4/recon/eval_12accel.csv ]; then
  bash scripts/round3_supR.sh "$DEADLINE" >> runs/supR3.log 2>&1
else
  log "supR artifacts present; skipping"
fi
if [ ! -s runs/bench_table_r3.log ]; then
  bash scripts/round3_supS.sh "$DEADLINE" /tmp/nonexistent.pid >> runs/supS2.log 2>&1
else
  log "supS artifacts present; skipping"
fi
if [ ! -s runs/bench_diffusion_batched_r3.log ]; then
  bash scripts/round3_supT.sh "$DEADLINE" /tmp/nonexistent.pid >> runs/supT2.log 2>&1
else
  log "supT artifacts present; skipping"
fi
log "renewed chain done"
