#!/usr/bin/env bash
# Low-data partition sweep (reference slurm_scripts/slurm_fine_tune_subsample.sh:
# 0.01x / 0.05x / 0.50x train partitions).
set -euo pipefail

CKPT=${CKPT:?set CKPT to the pretrain checkpoint}
DS=${DS:-m-bigearthnet}
OUT=${OUT:-./ckpts}

for part in 0.01x_train 0.05x_train 0.50x_train; do
  python main_finetune.py \
      --model "${MODEL:-convnextv2_atto}" --input_size 56 --patch_size 8 \
      --data_set "$DS" --partition "$part" --finetune "$CKPT" \
      --linear_probe "${LP:-True}" --blr "${BLR:-1e-2}" \
      --batch_size 32 --epochs 100 --smoothing 0.2 \
      --output_dir "$OUT/sub-${part}-${DS}" "$@"
done
