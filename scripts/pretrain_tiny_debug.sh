#!/usr/bin/env bash
# Tiny CPU-runnable debug pretrain on synthetic data (the reference's
# tests/pretrain_test.py config, slurm_fine_tune_tiny.sh scale).
set -euo pipefail

SYNTH=${SYNTH:-/tmp/mmearth_synth}
[ -f "$SYNTH"/data_synth.h5 ] || python -m mmearth_tpu.data.synthetic --out "$SYNTH" --n 64 --tile 64

python main_pretrain.py \
    --model convnextv2_atto --input_size 56 --patch_size 8 \
    --batch_size 4 --epochs 2 --warmup_epochs 1 \
    --loss_aggr uncertainty --use_bf16 False \
    --data_dir "$SYNTH" --processed_dir "${SYNTH}_proc" \
    --output_dir "${OUT:-/tmp/mm_debug}" "$@"
