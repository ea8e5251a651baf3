#!/bin/bash
# Round-4 measurement chain (verdict directives #1, #6, #2), run serially
# in one TPU session so every number shares pool conditions:
#   1. recon_e2e_compact  — the packed-wire deployment path (the one metric
#      losing to the reference; fix built+tested in r3, never measured)
#   2. recon bs=8         — re-commit the north-star artifact
#   3. recon_e2e (dense)  — same-session dense point so compact-vs-dense is
#      a clean in-session comparison, not r3-log archaeology
#   4. conv3d lowering probe — xla/tap/tapc x f32/bf16 x B in ONE process,
#      interleaved (closes the contaminated bf16 A/B from r3)
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH=/root/repo:/root/.axon_site
RUNS=runs
mkdir -p "$RUNS"

echo "=== round4 measurement chain start $(date -u +%FT%TZ) ==="

echo "--- [1/4] BENCH_WORKLOAD=recon_e2e_compact"
timeout 2400 env BENCH_WORKLOAD=recon_e2e_compact python bench.py \
    2>&1 | grep -v "experimental" | tee "$RUNS/recon_e2e_compact_r4.log"

echo "--- [2/4] BENCH_WORKLOAD=recon BENCH_BATCH=8"
timeout 2400 env BENCH_WORKLOAD=recon BENCH_BATCH=8 python bench.py \
    2>&1 | grep -v "experimental" | tee "$RUNS/recon_r4.log"

echo "--- [3/4] BENCH_WORKLOAD=recon_e2e (dense, same session)"
timeout 2400 env BENCH_WORKLOAD=recon_e2e python bench.py \
    2>&1 | grep -v "experimental" | tee "$RUNS/recon_e2e_r4.log"

echo "--- [4/4] conv3d lowering probe (interleaved)"
timeout 10800 env PROBE_BATCHES=16,8,1 PROBE_MODES=xla,tap,tapc \
    PROBE_DTYPES=float32,bfloat16 BENCH_ITERS=10 BENCH_REPEATS=5 \
    python scripts/profile_conv3d.py \
    2>&1 | grep -v "experimental" | tee "$RUNS/profile_conv3d_r4.log"

echo "=== round4 measurement chain done $(date -u +%FT%TZ) ==="
