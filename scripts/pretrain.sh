#!/usr/bin/env bash
# MP-MAE pretraining launch (reference slurm_scripts/slurm_pretrain.sh recipe:
# atto, effective batch 4096, 200 epochs, uncertainty loss, MMEarth64).
# Run once per TPU host; jax.distributed picks up the coordinator env.
set -euo pipefail

MODEL=${MODEL:-convnextv2_atto}
DATA_DIR=${MMEARTH_DIR:?set MMEARTH_DIR to the MMEarth directory}
OUT=${OUT:-./ckpts/pretrain-${MODEL}}
N_CHIPS=${N_CHIPS:-8}
BATCH_PER_CHIP=$((4096 / N_CHIPS))

python main_pretrain.py \
    --model "$MODEL" \
    --input_size 56 --patch_size 8 \
    --batch_size "$BATCH_PER_CHIP" --update_freq 1 \
    --epochs 200 --warmup_epochs 40 \
    --blr 1.5e-4 --weight_decay 0.05 --mask_ratio 0.6 \
    --loss_aggr uncertainty \
    --data_dir "$DATA_DIR" --processed_dir "${PROCESSED_DIR:-$DATA_DIR}" \
    --output_dir "$OUT" --auto_resume True "$@"
