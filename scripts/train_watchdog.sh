#!/bin/bash
# Auto-resume watchdog for long quality runs on the shared TPU pool, whose
# workers occasionally crash mid-run; orbax resume makes restarts cheap.
# Mirrors the reference run_script.sh auto-resume loop.
#   scripts/train_watchdog.sh <train-script> <config> <log> [max restarts] \
#       [extra trainer args/config overrides...]
script="${1:?train script (e.g. scripts/train_Latte.py)}"
cfg="${2:?config yaml}"
log="${3:?log path}"
n="${4:-30}"
shift 4 2>/dev/null || shift $#
# When a campaign-level `timeout` SIGTERMs this watchdog, take the trainer
# child down too — an orphaned trainer starves everything that runs next on
# the shared TPU (and `timeout` only signals the watchdog process itself).
child=""
trap '[ -n "$child" ] && kill "$child" 2>/dev/null; exit 143' TERM INT
for i in $(seq 1 "$n"); do
  PYTHONPATH=/root/repo:/root/.axon_site python "$script" \
    --config-file "$cfg" --resume "$@" >> "$log" 2>&1 &
  child=$!
  wait "$child"
  rc=$?
  if [ $rc -eq 0 ]; then
    echo "[watchdog] training completed" >> "$log"
    break
  fi
  echo "[watchdog] restart $i (rc=$rc)" >> "$log"
  sleep 15
done
