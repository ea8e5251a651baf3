#!/bin/bash
# Round-4 training/eval campaign supervisor. Serializes every TPU job
# (hazard 4: one process at a time) with artifact gates so crash/restart
# skips completed stages, and commits each artifact as it lands.
#
# Stages (verdict-directive order):
#   A  resume latteq4 7.3k -> 20k steps; eval raw+EMA at 12x and raw at
#      8x/16x on the widened 6-exam test set          (verdict #3, #4)
#   Z  zero-filled baselines at R in {8,12,16}        (matrix baseline)
#   B  DiT EMA-crossover run to ~51k steps (5 tau); eval R12 raw+EMA,
#      R8/R16 raw                                     (verdict #9, #4)
#   E  SwinGAN adv-weight sweep {0.003, 0.01, 0.03}; eval at 12x,
#      w=0.01 also at 8x/16x                          (verdict #7, #4)
#   D  ResNet row retrain; eval R in {8,12,16}        (verdict #4)
#   F  DSLR fast-mode probe + quality row; parity retrain if time allows
#                                                     (verdict #8)
# Usage: nohup bash scripts/round4_sup.sh <deadline-epoch> > /tmp/r4sup.out 2>&1 &
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
DEADLINE=${1:?usage: round4_sup.sh <deadline-epoch>}
LOG=runs/round4_sup.log
log() { echo "[r4sup $(date +%H:%M:%S)] $*" | tee -a "$LOG"; }
left() { echo $(( DEADLINE - $(date +%s) )); }

wait_pool() {
  local min_left=${1:-300} i=0
  while :; do
    [ "$(left)" -gt "$min_left" ] || { log "deadline while pool down"; return 1; }
    i=$((i+1))
    if timeout 100 python -c "import jax,numpy as np,jax.numpy as jnp; np.asarray(jax.jit(lambda: jnp.ones(())*2)())" >/dev/null 2>&1; then
      [ $i -gt 1 ] && log "pool up (attempt $i)"; return 0
    fi
    [ $((i % 5)) -eq 0 ] && log "pool still down (attempt $i)"
    sleep 30
  done
}

# serialize behind the conv3d probe if it is still measuring
while [ -f /tmp/probe.pid ] && kill -0 "$(cat /tmp/probe.pid)" 2>/dev/null; do
  log "conv3d probe still running; waiting"
  sleep 60
done

train() {  # train <script> <cfg> <log> <budget-s> [overrides...]
  local script=$1 cfg=$2 tlog=$3 budget=$4; shift 4
  local t=$budget
  [ "$t" -gt "$(( $(left) - 600 ))" ] && t=$(( $(left) - 600 ))
  [ "$t" -gt 300 ] || { log "no window for $tlog"; return 1; }
  log "train $script $cfg for up to ${t}s ($* )"
  timeout "$t" bash scripts/train_watchdog.sh "$script" "$cfg" "$tlog" 30 "$@"
  log "train window over for $tlog (rc=$?)"
  tail -2 "$tlog" 2>/dev/null | tee -a "$LOG" || true
}

evalrow() {  # evalrow <cfg> <ckpt> <kind> <out> <accel> [extra...]
  local cfg=$1 ckpt=$2 kind=$3 out=$4 accel=$5; shift 5
  [ -f "$out/eval_${accel}accel.csv" ] && { log "skip eval $out@$accel (done)"; return 0; }
  wait_pool 180 || return 1
  local t=$(( $(left) - 90 )); [ "$t" -gt 60 ] || t=60
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
  local msg=$1; shift
  git add -f "$@" 2>/dev/null
  git commit -q -m "$msg" 2>/dev/null && log "committed: $msg" || true
}

# ---------------- Stage A: Latte 20k ----------------
if [ ! -f runs/latteq4/recon20k/eval_12accel.csv ]; then
  wait_pool || exit 0
  if ! ls runs/latteq4/checkpoints/ 2>/dev/null | grep -qE '^(19[0-9]{3}|[2-9][0-9]{4})$'; then
    train scripts/train_Latte.py configs/quality/latte2.yaml runs/latteq4.log \
        5400 OPTIMIZER.MAX_EPOCHS 625
  fi
  evalrow configs/quality/latte2.yaml runs/latteq4/checkpoints diffusion \
      runs/latteq4/recon20k 12
  commit "Latte-2u extended to ~20k steps: 6-exam 12x row" \
      runs/latteq4/recon20k/eval_12accel.csv runs/latteq4/metrics.jsonl runs/latteq4.log
fi
if [ -f runs/latteq4/recon20k/eval_12accel.csv ]; then
  evalrow configs/quality/latte2.yaml runs/latteq4/checkpoints diffusion \
      runs/latteq4/recon20k_ema 12 --use-ema
  commit "Latte-2u 20k EMA row (12x)" runs/latteq4/recon20k_ema/eval_12accel.csv
  evalrow configs/quality/latte2.yaml runs/latteq4/checkpoints diffusion \
      runs/latteq4/recon20k 8
  evalrow configs/quality/latte2.yaml runs/latteq4/checkpoints diffusion \
      runs/latteq4/recon20k 16
  commit "Latte-2u 20k multi-R rows (8x/16x)" \
      runs/latteq4/recon20k/eval_8accel.csv runs/latteq4/recon20k/eval_16accel.csv
fi

# ---------------- Stage Z: zero-filled baselines ----------------
for R in 8 12 16; do
  evalrow configs/quality/resnet.yaml - zerofilled runs/quality/zf_r4 "$R"
done
commit "Zero-filled baselines at 8x/12x/16x on the 6-exam quality set" \
    runs/quality/zf_r4/eval_8accel.csv runs/quality/zf_r4/eval_12accel.csv \
    runs/quality/zf_r4/eval_16accel.csv

# ---------------- Stage B: DiT EMA crossover ----------------
if [ ! -f runs/ditema/recon_r4/eval_12accel.csv ]; then
  wait_pool || exit 0
  train scripts/train_DiT.py configs/quality/dit_ema.yaml runs/ditema.log 10800
  evalrow configs/quality/dit_ema.yaml runs/ditema/checkpoints diffusion \
      runs/ditema/recon_r4 12
  commit "DiT EMA-crossover run: ~51k steps, 6-exam 12x raw row" \
      runs/ditema/recon_r4/eval_12accel.csv runs/ditema/metrics.jsonl runs/ditema.log
fi
if [ -f runs/ditema/recon_r4/eval_12accel.csv ]; then
  evalrow configs/quality/dit_ema.yaml runs/ditema/checkpoints diffusion \
      runs/ditema/recon_r4_ema 12 --use-ema
  commit "DiT 51k EMA row (12x) — EMA-vs-raw crossover check" \
      runs/ditema/recon_r4_ema/eval_12accel.csv
  evalrow configs/quality/dit_ema.yaml runs/ditema/checkpoints diffusion \
      runs/ditema/recon_r4 8
  evalrow configs/quality/dit_ema.yaml runs/ditema/checkpoints diffusion \
      runs/ditema/recon_r4 16
  commit "DiT 51k multi-R rows (8x/16x)" \
      runs/ditema/recon_r4/eval_8accel.csv runs/ditema/recon_r4/eval_16accel.csv
fi

# ---------------- Stage E: SwinGAN adv-weight sweep ----------------
for W in 003 010 030; do
  w="0.$W"; run="runs/sganw$W"
  if [ ! -f "$run/recon_r4/eval_12accel.csv" ]; then
    wait_pool || exit 0
    if [ ! -d "$run/checkpoints" ] || [ -z "$(ls "$run/checkpoints" 2>/dev/null)" ] || [ -f "$run/.training" ]; then
      touch "$run/.training" 2>/dev/null || { mkdir -p "$run"; touch "$run/.training"; }
      train scripts/train_swin_gan.py configs/quality/swingan.yaml "$run.log" 3600 \
          MODEL.GAN.ADV_WEIGHT "$w" OUTPUT_DIR "$run"
      rm -f "$run/.training"
    fi
    evalrow configs/quality/swingan.yaml "$run/checkpoints" unrolled \
        "$run/recon_r4" 12 MODEL.GAN.ADV_WEIGHT "$w" OUTPUT_DIR "$run"
    commit "SwinGAN adv-weight sweep: w=$w 12x row" \
        "$run/recon_r4/eval_12accel.csv" "$run/metrics.jsonl" "$run.log"
  fi
done
evalrow configs/quality/swingan.yaml runs/sganw010/checkpoints unrolled \
    runs/sganw010/recon_r4 8 OUTPUT_DIR runs/sganw010
evalrow configs/quality/swingan.yaml runs/sganw010/checkpoints unrolled \
    runs/sganw010/recon_r4 16 OUTPUT_DIR runs/sganw010
commit "SwinGAN w=0.01 multi-R rows (8x/16x)" \
    runs/sganw010/recon_r4/eval_8accel.csv runs/sganw010/recon_r4/eval_16accel.csv

# ---------------- Stage D: ResNet matrix row ----------------
if [ ! -f runs/resq4/recon_r4/eval_12accel.csv ]; then
  wait_pool || exit 0
  if [ ! -d runs/resq4/checkpoints ] || [ -z "$(ls runs/resq4/checkpoints 2>/dev/null)" ]; then
    train scripts/train.py configs/quality/resnet.yaml runs/resq4.log 2400 \
        OUTPUT_DIR runs/resq4
  fi
  for R in 12 8 16; do
    evalrow configs/quality/resnet.yaml runs/resq4/checkpoints unrolled \
        runs/resq4/recon_r4 "$R" OUTPUT_DIR runs/resq4
  done
  commit "ResNet retrained: multi-R rows (8x/12x/16x) on the 6-exam set" \
      runs/resq4/recon_r4/eval_8accel.csv runs/resq4/recon_r4/eval_12accel.csv \
      runs/resq4/recon_r4/eval_16accel.csv runs/resq4/metrics.jsonl runs/resq4.log
fi

# ---------------- Stage F: DSLR fast mode ----------------
if [ ! -f runs/profile_dslr_fast_r4.log ]; then
  wait_pool || exit 0
  log "DSLR fast-mode A/B probe"
  timeout 3600 env PROBE_CG_STEPS=10,6 python scripts/profile_dslr_fast.py \
      2>&1 | grep -v experimental > runs/profile_dslr_fast_r4.log
  tail -4 runs/profile_dslr_fast_r4.log | tee -a "$LOG"
  commit "DSLR fast-mode A/B probe (cg-v1 vs jacobi, interleaved)" \
      runs/profile_dslr_fast_r4.log
fi
if [ ! -f runs/dslrfast/recon_r4/eval_12accel.csv ]; then
  wait_pool || exit 0
  if [ ! -d runs/dslrfast/checkpoints ] || [ -z "$(ls runs/dslrfast/checkpoints 2>/dev/null)" ]; then
    train scripts/train_lr.py configs/quality/dslr_fast.yaml runs/dslrfast.log 3300 \
        OPTIMIZER.MAX_EPOCHS 190
  fi
  evalrow configs/quality/dslr_fast.yaml runs/dslrfast/checkpoints dslr \
      runs/dslrfast/recon_r4 12
  commit "DSLR fast-mode (jacobi) quality row at 12x" \
      runs/dslrfast/recon_r4/eval_12accel.csv runs/dslrfast/metrics.jsonl runs/dslrfast.log
fi
# parity retrain for a same-session comparison, only with >=1.5h left
if [ "$(left)" -gt 5400 ] && [ ! -f runs/dslrq4/recon_r4/eval_12accel.csv ]; then
  wait_pool || exit 0
  if [ ! -d runs/dslrq4/checkpoints ] || [ -z "$(ls runs/dslrq4/checkpoints 2>/dev/null)" ]; then
    train scripts/train_lr.py configs/quality/dslr.yaml runs/dslrq4.log 3600 \
        OUTPUT_DIR runs/dslrq4 OPTIMIZER.MAX_EPOCHS 190
  fi
  evalrow configs/quality/dslr.yaml runs/dslrq4/checkpoints dslr \
      runs/dslrq4/recon_r4 12 OUTPUT_DIR runs/dslrq4
  commit "DSLR parity retrain: same-budget 12x row for the fast-mode A/B" \
      runs/dslrq4/recon_r4/eval_12accel.csv runs/dslrq4/metrics.jsonl runs/dslrq4.log
fi

log "round4 campaign done ($(left)s before deadline)"
