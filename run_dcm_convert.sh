#!/usr/bin/env bash
# Batch DICOM conversion over reconstruction CFLs.
# TPU-native counterpart of reference run_dcm_convert.sh.
set -euo pipefail
recon_dir="${1:?usage: run_dcm_convert.sh <recon_dir> <out_root>}"
out_root="${2:?out root}"

repo="$(cd "$(dirname "$0")" && pwd)"
export PYTHONPATH="$repo:${PYTHONPATH:-}"

for hdr in "$recon_dir"/*accel.im.hdr; do
  [ -e "$hdr" ] || continue
  base="${hdr%.hdr}"
  name=$(basename "$base" .im)
  python "$repo/scripts/write_dcm.py" "$base" --out-directory "$out_root/$name"
done
