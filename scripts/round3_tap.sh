#!/bin/bash
# Round-3 conv-lowering + deployment measurements. Run AFTER round3_latte2.sh
# (shared TPU: strictly sequential). Ordered decision-critical-first: a
# wall-clock cutoff mid-stage should still leave the tap-vs-xla verdict and
# the compact-transfer e2e number on disk.
cd "$(dirname "$0")/.."
export PYTHONPATH=/root/repo:/root/.axon_site
stamp() { echo "[tap $(date +%H:%M:%S)] $*"; }

stamp "1: conv3d lowering (xla vs tap vs tapc), full headline train step"
PROBE_MODES=xla,tap,tapc PROBE_BATCHES=1,8 timeout 4800 \
    python scripts/profile_conv3d.py 2>&1 \
    | grep -v WARNING | tee runs/profile_conv3d.log

stamp "2: deployment-path e2e recon, compact wire format vs dense (one session)"
BENCH_WORKLOAD=recon_e2e timeout 1500 python bench.py 2>/dev/null \
    | tail -1 | tee runs/recon_e2e_compact_r3.log
BENCH_WORKLOAD=recon_e2e_compact timeout 1500 python bench.py 2>/dev/null \
    | tail -1 | tee -a runs/recon_e2e_compact_r3.log

stamp "3: bf16 trunk x conv lowering at the batched operating point"
PROFILE_DTYPE=bfloat16 PROBE_MODES=xla,tap PROBE_BATCHES=8 timeout 1800 \
    python scripts/profile_conv3d.py 2>&1 \
    | grep -v WARNING | tee runs/profile_conv3d_bf16.log

stamp "4: bare conv-stack probe (fwd / grad_x / grad_p, conv3d vs tap)"
timeout 1800 python scripts/profile_backward.py 2>&1 \
    | grep -v WARNING | tee runs/profile_backward.log

stamp "5: component breakdown under the tap lowering (B=1 and B=8)"
DL_SWIN_GAN_CONV3D=tap timeout 1500 python scripts/profile_headline.py 2>&1 \
    | tail -10 | tee runs/profile_headline_tap.log
DL_SWIN_GAN_CONV3D=tap BENCH_BATCH=8 PROFILE_REMAT=1 timeout 1500 \
    python scripts/profile_headline.py 2>&1 | tail -10 \
    | tee -a runs/profile_headline_tap.log

stamp "done"
