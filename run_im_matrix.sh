#!/usr/bin/env bash
# Batch figure driver: acceleration-matrix figures for a list of exams.
# TPU-native counterpart of reference run_im_matrix.sh.
set -euo pipefail
recon_dir="${1:?usage: run_im_matrix.sh <recon_dir> [accels...]}"
shift
accels=("${@:-1 12}")

repo="$(cd "$(dirname "$0")" && pwd)"
export PYTHONPATH="$repo:${PYTHONPATH:-}"

for hdr in "$recon_dir"/*_1accel.im.hdr; do
  [ -e "$hdr" ] || continue
  name=$(basename "$hdr" _1accel.im.hdr)
  python "$repo/scripts/display_matrix.py" --recon-directory "$recon_dir" \
      --name "$name" --accelerations ${accels[@]}
done
