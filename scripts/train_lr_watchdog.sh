#!/bin/bash
# Auto-resume watchdog for the DSLR quality run: the shared-TPU pool's
# workers occasionally crash mid-run (observed repeatedly on long DSLR
# trainings); orbax resume makes restarts cheap. Mirrors the reference
# run_script.sh auto-resume loop.
cfg="${1:-configs/quality/dslr.yaml}"
log="${2:-runs/dslrq2.log}"
for i in $(seq 1 30); do
  PYTHONPATH=/root/repo:/root/.axon_site python scripts/train_lr.py \
    --config-file "$cfg" --resume >> "$log" 2>&1
  rc=$?
  if [ $rc -eq 0 ]; then
    echo "[watchdog] training completed" >> "$log"
    break
  fi
  echo "[watchdog] restart $i (rc=$rc)" >> "$log"
  sleep 15
done
