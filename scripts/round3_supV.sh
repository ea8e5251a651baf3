#!/bin/bash
# Round-3 renewal supervisor V: second renewal of the measurement chain.
# The pool outage that started ~15:14 Aug 18 may outlive supU's renewed
# deadline too (observed outages have exceeded 14h). supV waits for supU to
# exit, then re-runs any stage whose decision-critical artifact is still
# missing, under a further-renewed deadline. Identical artifact gating to
# round3_supU.sh — nothing is double-trained or double-benched if an earlier
# link of the chain already produced the output.
# Usage: nohup bash scripts/round3_supV.sh <deadline-epoch> [<supU-pidfile>] &
cd /root/repo
DEADLINE=${1:?usage: round3_supV.sh <deadline-epoch> [pidfile]}
PIDFILE=${2:-/tmp/supU.pid}
log() { echo "[supV $(date +%H:%M:%S)] $*"; }

if [ -f "$PIDFILE" ]; then
  while kill -0 "$(cat "$PIDFILE")" 2>/dev/null; do
    [ $(( DEADLINE - $(date +%s) )) -gt 600 ] || { log "deadline while waiting for supU"; exit 0; }
    sleep 60
  done
fi
log "supU done; relaunching unfinished stages with deadline $DEADLINE"

if [ ! -f runs/latteq4/recon/eval_12accel.csv ]; then
  bash scripts/round3_supR.sh "$DEADLINE" >> runs/supR4.log 2>&1
else
  log "supR artifacts present; skipping"
fi
if [ ! -s runs/bench_table_r3.log ]; then
  bash scripts/round3_supS.sh "$DEADLINE" /tmp/nonexistent.pid >> runs/supS3.log 2>&1
else
  log "supS artifacts present; skipping"
fi
if [ ! -s runs/bench_diffusion_batched_r3.log ]; then
  bash scripts/round3_supT.sh "$DEADLINE" /tmp/nonexistent.pid >> runs/supT3.log 2>&1
else
  log "supT artifacts present; skipping"
fi
log "renewed chain done"
