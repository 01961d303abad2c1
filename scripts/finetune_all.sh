#!/usr/bin/env bash
# Finetune + linear-probe sweep over the GEO-Bench classification datasets
# (reference slurm_scripts/slurm_fine_tune_all.sh recipe).
set -euo pipefail

CKPT=${CKPT:?set CKPT to the pretrain checkpoint (.pth or orbax dir)}
OUT=${OUT:-./ckpts}
DATASETS=${DATASETS:-"m-eurosat m-so2sat m-bigearthnet m-brick-kiln"}

for ds in $DATASETS; do
  for mode in ft lp; do
    if [ "$mode" = "lp" ]; then
      extra="--linear_probe True --blr 1e-2"
    else
      extra="--linear_probe False --blr 2e-4 --layer_decay 0.9"
    fi
    python main_finetune.py \
        --model "${MODEL:-convnextv2_atto}" --input_size 56 --patch_size 8 \
        --data_set "$ds" --finetune "$CKPT" \
        --batch_size 32 --epochs 100 \
        --weight_decay 0.3 --drop_path 0.1 --smoothing 0.2 \
        $extra \
        --output_dir "$OUT/${mode}-${ds}" "$@"
  done
done
