#!/bin/bash
# Round-3 renewal supervisor W (supersedes supV): per-artifact-gated rerun of
# EVERY remaining measurement/rescue stage. supV's gating was too coarse —
# it relaunched all of supR only when the latteq4 eval CSV was missing, so a
# partial supR pass (e.g. latteq4 done, deadline hit before phases 1b-6)
# would leave the Latte insurance run, the conv3d lowering verdict, the
# final bench rows, the extended lowering points, the diffusion dtype
# profiles, and the bf16 DiT row permanently unexecuted. Here each phase is
# gated on its own decision-critical artifact, so reruns never double-train
# and nothing queued is silently dropped.
# Usage: nohup bash scripts/round3_supW.sh <deadline-epoch> [<supU-pidfile>] &
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
DEADLINE=${1:?usage: round3_supW.sh <deadline-epoch> [pidfile]}
PIDFILE=${2:-/tmp/supU.pid}
log() { echo "[supW $(date +%H:%M:%S)] $*"; }
left() { echo $(( DEADLINE - $(date +%s) )); }
fits() { [ "$(left)" -gt "$1" ]; }

if [ -f "$PIDFILE" ]; then
  while kill -0 "$(cat "$PIDFILE")" 2>/dev/null; do
    [ "$(left)" -gt 600 ] || { log "deadline while waiting for $PIDFILE"; exit 0; }
    sleep 60
  done
fi
log "prior chain done; per-artifact rerun with deadline $DEADLINE"

wait_pool() {
  local i=0
  while :; do
    fits 300 || { log "deadline reached while pool down"; exit 0; }
    i=$((i+1))
    if timeout 120 python -c "import jax,numpy as np,jax.numpy as jnp; np.asarray(jax.jit(lambda: jnp.ones(())*2)())" >/dev/null 2>&1; then
      log "pool up (attempt $i)"; return 0
    fi
    [ $((i % 10)) -eq 0 ] && log "pool still down (attempt $i)"
    sleep 45
  done
}

# identical to round3_supR.sh train_stage (watchdog + stall reaper)
train_stage() {
  local T=$1 SCRIPT=$2 CFG=$3 LOG=$4; shift 4
  timeout "$T" bash scripts/train_watchdog.sh "$SCRIPT" "$CFG" "$LOG" 30 "$@" &
  local WD=$!
  (
    while kill -0 "$WD" 2>/dev/null; do
      m1=$(stat -c %Y "$LOG" 2>/dev/null); sleep 420
      m2=$(stat -c %Y "$LOG" 2>/dev/null)
      if [ "$m1" = "$m2" ] && kill -0 "$WD" 2>/dev/null; then
        sleep 420
        m3=$(stat -c %Y "$LOG" 2>/dev/null)
        if [ "$m2" = "$m3" ] && kill -0 "$WD" 2>/dev/null; then
          wdpid=$(ps --ppid "$WD" -o pid= | head -1 | tr -d ' ')
          tpid=$(ps --ppid "${wdpid:-0}" -o pid= | head -1 | tr -d ' ')
          [ -n "$tpid" ] || tpid="$wdpid"
          if [ -n "$tpid" ] && grep -q "${SCRIPT##*/}" "/proc/$tpid/cmdline" 2>/dev/null; then
            log "stall reaper: trainer $tpid silent 14 min, killing"
            kill "$tpid" 2>/dev/null
          fi
        fi
      fi
    done
  ) &
  local REAPER=$!
  wait "$WD"
  kill "$REAPER" 2>/dev/null
}

mean_ssim() {
  [ -f "$1" ] && awk -F, 'NR>1{s+=$1;n++} END{if(n)printf "%.4f", s/n}' "$1"
}

# ---- phase 1: latteq4 rescue (gate: its eval CSV) ----
if [ ! -f runs/latteq4/recon/eval_12accel.csv ]; then
  if fits 7800; then
    wait_pool
    log "phase 1: latteq4 top-up"
    train_stage 4500 scripts/train_Latte.py configs/quality/latte2.yaml \
        runs/latteq4.log --max-epochs 940
    wait_pool
    timeout 2700 python scripts/quality_row.py --config-file configs/quality/latte2.yaml \
        --ckpt runs/latteq4/checkpoints --kind diffusion --batch-size 2 \
        --out runs/latteq4/recon > runs/latteq4.eval.log 2>&1
    log "eval rc=$?"; tail -3 runs/latteq4.eval.log
    git add -f runs/latteq4/recon/eval_12accel.csv runs/latteq4.eval.log 2>/dev/null
    git commit -q -m "Latte 2-shared-unroll quality row artifacts (latteq4 top-up eval)" 2>/dev/null
  else
    log "skip phase 1 (deadline)"
  fi
else
  log "phase 1 artifact present; skipping"
fi

# ---- phase 1b: latteq5 insurance (gate: latteq4 below baseline AND no latteq5 row) ----
S4=$(mean_ssim runs/latteq4/recon/eval_12accel.csv)
log "latteq4 SSIM: ${S4:-none}"
if [ -n "$S4" ] && awk "BEGIN{exit !($S4 < 0.8405)}" \
   && [ ! -f runs/latteq5/recon/eval_12accel.csv ]; then
  if fits 14400; then
    wait_pool
    log "phase 1b: latteq5 insurance run (3h cap, DiT operating point)"
    train_stage 10800 scripts/train_Latte.py configs/quality/latte3.yaml \
        runs/latteq5.log
    wait_pool
    timeout 3600 python scripts/quality_row.py --config-file configs/quality/latte3.yaml \
        --ckpt runs/latteq5/checkpoints --kind diffusion --batch-size 2 \
        --out runs/latteq5/recon > runs/latteq5.eval.log 2>&1
    log "eval rc=$?"; tail -3 runs/latteq5.eval.log
    git add -f runs/latteq5/recon/eval_12accel.csv runs/latteq5.eval.log 2>/dev/null
    git commit -q -m "Latte quality row at the DiT operating point (latteq5 insurance run)" 2>/dev/null
    log "latteq5 SSIM: $(mean_ssim runs/latteq5/recon/eval_12accel.csv)"
  else
    log "skip phase 1b (deadline)"
  fi
fi

# ---- phase 2: conv3d lowering verdict (gate: its log) ----
if [ ! -s runs/profile_conv3d_b1.log ]; then
  if fits 4500; then
    wait_pool
    log "phase 2: conv3d lowering verdict (B=1 f32)"
    PROBE_MODES=xla,tap,tapc PROBE_BATCHES=1 timeout 4200 \
        python scripts/profile_conv3d.py 2>&1 | grep -v WARNING \
        | tee runs/profile_conv3d_b1.log
    git add -f runs/profile_conv3d_b1.log 2>/dev/null
    git commit -q -m "Measured: conv3d lowering comparison (xla vs tap vs tapc), headline train step at B=1" 2>/dev/null
  else
    log "skip phase 2 (deadline)"
  fi
else
  log "phase 2 artifact present; skipping"
fi

# ---- phase 3: final bench rows + deployment e2e (gate: the two logs) ----
if [ ! -s runs/bench_r3_final.log ] || [ ! -s runs/recon_e2e_compact_r3.log ]; then
  if fits 5400; then
    wait_pool
    log "phase 3: final bench rows"
    timeout 2400 python bench.py 2>/dev/null | tail -1 | tee runs/bench_r3_final.log
    DL_SWIN_GAN_CONV3D=tap timeout 2400 python bench.py 2>/dev/null | tail -1 \
        | tee -a runs/bench_r3_final.log
    BENCH_WORKLOAD=recon_e2e timeout 1800 python bench.py 2>/dev/null \
        | tail -1 | tee runs/recon_e2e_compact_r3.log
    BENCH_WORKLOAD=recon_e2e_compact timeout 1800 python bench.py 2>/dev/null \
        | tail -1 | tee -a runs/recon_e2e_compact_r3.log
    git add -f runs/bench_r3_final.log runs/recon_e2e_compact_r3.log 2>/dev/null
    git commit -q -m "Measured: final bench rows + deployment e2e dense vs compact wire format" 2>/dev/null
  else
    log "skip phase 3 (deadline)"
  fi
else
  log "phase 3 artifacts present; skipping"
fi

# ---- phase S: per-workload bench table (gate: its log) ----
if [ ! -s runs/bench_table_r3.log ]; then
  bash scripts/round3_supS.sh "$DEADLINE" /tmp/nonexistent.pid >> runs/supS4.log 2>&1
else
  log "phase S artifact present; skipping"
fi

# ---- phase T: batched diffusion rows (gate: its log) ----
if [ ! -s runs/bench_diffusion_batched_r3.log ]; then
  bash scripts/round3_supT.sh "$DEADLINE" /tmp/nonexistent.pid >> runs/supT4.log 2>&1
else
  log "phase T artifact present; skipping"
fi

# ---- phase 4: extended lowering points (gate: the two logs) ----
if [ ! -s runs/profile_conv3d_b8.log ] || [ ! -s runs/profile_conv3d_bf16.log ]; then
  if fits 5400; then
    wait_pool
    log "phase 4: extended lowering points (B=8 + bf16 cross)"
    PROBE_MODES=xla,tap,tapc PROBE_BATCHES=8 timeout 2700 \
        python scripts/profile_conv3d.py 2>&1 | grep -v WARNING \
        | tee runs/profile_conv3d_b8.log
    PROFILE_DTYPE=bfloat16 PROBE_MODES=xla,tap PROBE_BATCHES=8 timeout 2100 \
        python scripts/profile_conv3d.py 2>&1 | grep -v WARNING \
        | tee runs/profile_conv3d_bf16.log
    git add -f runs/profile_conv3d_b8.log runs/profile_conv3d_bf16.log 2>/dev/null
    git commit -q -m "Measured: conv3d lowering at B=8 + bf16 cross" 2>/dev/null
  else
    log "skip phase 4 (deadline)"
  fi
else
  log "phase 4 artifacts present; skipping"
fi

# ---- phase 5: diffusion dtype profiles (gate: the two logs) ----
if [ ! -s runs/profile_diffusion_dit.log ] || [ ! -s runs/profile_diffusion_latte.log ]; then
  if fits 6600; then
    wait_pool
    log "phase 5: diffusion train-step dtype profiles"
    timeout 3000 python scripts/profile_diffusion.py 2>&1 | grep -v WARNING \
        | tee runs/profile_diffusion_dit.log
    PROFILE_MODEL=latte timeout 3000 python scripts/profile_diffusion.py 2>&1 \
        | grep -v WARNING | tee runs/profile_diffusion_latte.log
    git add -f runs/profile_diffusion_dit.log runs/profile_diffusion_latte.log 2>/dev/null
    git commit -q -m "Measured: DiT/Latte train-step dtype profiles" 2>/dev/null
  else
    log "skip phase 5 (deadline)"
  fi
else
  log "phase 5 artifacts present; skipping"
fi

# ---- phase 6: bf16 DiT quality row (gate: its eval CSV; lowest priority) ----
if [ ! -f runs/ditbf16/recon/eval_12accel.csv ]; then
  if fits 11400; then
    wait_pool
    log "phase 6: bf16 DiT quality row (2h cap)"
    train_stage 7200 scripts/train_DiT.py configs/quality/dit_bf16.yaml runs/ditbf16.log
    wait_pool
    timeout 2700 python scripts/quality_row.py --config-file configs/quality/dit_bf16.yaml \
        --ckpt runs/ditbf16/checkpoints --kind diffusion --batch-size 2 \
        --out runs/ditbf16/recon > runs/ditbf16.eval.log 2>&1
    log "bf16 DiT eval rc=$?"; tail -3 runs/ditbf16.eval.log
    git add -f runs/ditbf16/recon/eval_12accel.csv runs/ditbf16.eval.log 2>/dev/null
    git commit -q -m "bf16-trunk DiT quality row artifacts" 2>/dev/null
  else
    log "skip phase 6 (deadline)"
  fi
else
  log "phase 6 artifact present; skipping"
fi

log "supervisor W done ($(left)s before deadline)"
