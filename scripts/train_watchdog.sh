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

# Bench arbitration (see bench.py _tpu_arbitration): while a bench holds
# BENCH_LOCK, hold trainer (re)launches so the recorded number measures the
# framework, not pool contention. The trainer child pid is published in
# TRAINER_PIDFILE so the bench can SIGSTOP/SIGCONT an already-running
# trainer. Stale locks (dead owner, or older than 90 min) are cleared.
TRAINER_PIDFILE="${TRAINER_PIDFILE:-/tmp/dl_swin_gan_trainer.pid}"
BENCH_LOCK="${BENCH_LOCK:-/tmp/dl_swin_gan_bench.lock}"
wait_bench() {
  while [ -f "$BENCH_LOCK" ]; do
    lpid=$(cat "$BENCH_LOCK" 2>/dev/null)
    if [ -z "$lpid" ] || ! kill -0 "$lpid" 2>/dev/null; then
      rm -f "$BENCH_LOCK"; break
    fi
    if [ -n "$(find "$BENCH_LOCK" -mmin +90 2>/dev/null)" ]; then
      rm -f "$BENCH_LOCK"; break
    fi
    echo "[watchdog] bench lock held by $lpid, waiting" >> "$log"
    sleep "${BENCH_LOCK_POLL:-20}"
  done
}

# When a campaign-level `timeout` SIGTERMs this watchdog, take the trainer
# child down too — an orphaned trainer starves everything that runs next on
# the shared TPU (and `timeout` only signals the watchdog process itself).
child=""
# SIGCONT after the kill: a trainer SIGSTOPped by bench arbitration can't
# take the TERM until resumed — without it the child lingers as a stopped
# orphan holding the TPU until the bench exits.
trap '[ -n "$child" ] && { kill "$child" 2>/dev/null; kill -CONT "$child" 2>/dev/null; }; exit 143' TERM INT
for i in $(seq 1 "$n"); do
  wait_bench
  PYTHONPATH=/root/repo:/root/.axon_site python "$script" \
    --config-file "$cfg" --resume "$@" >> "$log" 2>&1 &
  child=$!
  echo "$child" > "$TRAINER_PIDFILE"
  wait "$child"
  rc=$?
  rm -f "$TRAINER_PIDFILE"
  if [ $rc -eq 0 ]; then
    echo "[watchdog] training completed" >> "$log"
    break
  fi
  echo "[watchdog] restart $i (rc=$rc)" >> "$log"
  sleep 15
done
