#!/usr/bin/env bash
# UNet segmentation finetune (reference slurm_scripts/slurm_fine_tune_seg.sh:
# 200 epochs, blr 1e-2, smoothing 0, decoder probe then epoch-50 unfreeze).
set -euo pipefail

CKPT=${CKPT:?set CKPT to the pretrain checkpoint}
OUT=${OUT:-./ckpts}

for ds in m-cashew-plant m-SA-crop-type; do
  python main_finetune.py \
      --model "${MODEL:-convnextv2_unet_atto}" --input_size 56 --patch_size 8 \
      --data_set "$ds" --finetune "$CKPT" \
      --linear_probe True \
      --batch_size 16 --epochs 200 --blr 1e-2 --smoothing 0 \
      --output_dir "$OUT/seg-${ds}" "$@"
done
