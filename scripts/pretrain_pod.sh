#!/usr/bin/env bash
# Multi-host MP-MAE pretraining on a TPU pod slice (the TPU equivalent of the
# reference's multi-GPU slurm_pretrain.sh, scaled past one host).
#
# Run THIS SAME command on every host of the slice (e.g. via
# `gcloud compute tpus tpu-vm ssh $TPU --worker=all --command=...`).
# jax.distributed.initialize() inside the driver picks up the TPU pod
# metadata automatically (no MASTER_ADDR plumbing — parallel/mesh.py); each
# host loads its own shard of the packed data (PackedLoader shard=
# (process_index, process_count)) and the jitted step all-reduces gradients
# over ICI.
#
# Effective batch = batch_size * update_freq * total chip count; the driver
# scales the LR from --blr exactly like the reference (blr * eff_batch/256).
set -euo pipefail

DATA_DIR=${DATA_DIR:-/data/mmearth}
OUT=${OUT:-/data/checkpoints/mpmae_atto_64}

python main_pretrain.py \
  --data_dir "$DATA_DIR" \
  --output_dir "$OUT" \
  --model convnextv2_atto \
  --input_size 56 --patch_size 8 \
  --batch_size 256 \
  --update_freq 1 \
  --epochs 200 --warmup_epochs 40 \
  --blr 1.5e-4 \
  --loss_aggr uncertainty \
  --use_bf16 True \
  --steps_per_dispatch 4 \
  --auto_resume True \
  --save_ckpt_freq 1 --save_ckpt_num 3 \
  "$@"
