#!/usr/bin/env bash
# Master train/recon dispatcher — TPU-native counterpart of reference
# run_script.sh:29-197: model_type selects config + trainer; train mode
# auto-resumes from the latest checkpoint; recon mode drives
# reconstruct_h5/batch_recon.
#
# Usage:
#   ./run_script.sh train  RES|SE|CBAM|SWIN|DIT|Latte|DSLR [extra cfg overrides...]
#   ./run_script.sh recon  RES|SE|CBAM|SWIN <ckpt_dir> <data_dir> <out_dir> <accel>
set -euo pipefail

mode="${1:?usage: run_script.sh train|recon model_type ...}"
model_type="${2:?model type required}"
shift 2

repo="$(cd "$(dirname "$0")" && pwd)"
export PYTHONPATH="$repo:${PYTHONPATH:-}"

case "$model_type" in
  RES)   config="$repo/configs/basic/example.yaml"; trainer="train.py" ;;
  SE)    config="$repo/configs/config_se.yaml";     trainer="train.py" ;;
  CBAM)  config="$repo/configs/config_se.yaml";     trainer="train.py" ;;
  SWIN)  config="$repo/configs/config_swin.yaml";   trainer="train.py" ;;
  DIT)   config="$repo/configs/config_dit.yaml";    trainer="train_DiT.py" ;;
  Latte) config="$repo/configs/config_latte.yaml";  trainer="train_Latte.py" ;;
  DSLR)  config="$repo/configs/config_dslr.yaml";   trainer="train_lr.py" ;;
  SWINGAN) config="$repo/configs/config_swingan.yaml"; trainer="train_swin_gan.py" ;;
  *) echo "unknown model type: $model_type" >&2; exit 1 ;;
esac

if [ "$mode" = "train" ]; then
  extra=()
  [ "$model_type" = "CBAM" ] && extra+=(MODEL.MODEL_TYPE CBAM)
  # auto-resume when a checkpoint exists (reference run_script.sh:58-71)
  outdir=$(python -c "
from dl_swin_gan_tpu.config import load_cfg
print(load_cfg('$config', require_output_dir=False).OUTPUT_DIR)")
  resume=()
  if [ -d "$outdir/checkpoints" ] && [ -n "$(ls -A "$outdir/checkpoints" 2>/dev/null)" ]; then
    resume=(--resume)
    echo "resuming from $outdir/checkpoints"
  fi
  exec python "$repo/scripts/$trainer" --config-file "$config" \
       "${resume[@]}" "${extra[@]}" "$@"
elif [ "$mode" = "recon" ]; then
  ckpt="${1:?ckpt dir}"; data="${2:?data dir}"; out="${3:?out dir}"; accel="${4:-12}"
  exec python "$repo/scripts/batch_recon.py" --config-file "$config" \
       --ckpt "$ckpt" --data-directory "$data" --out-directory "$out" \
       --acceleration "$accel"
else
  echo "unknown mode: $mode" >&2; exit 1
fi
