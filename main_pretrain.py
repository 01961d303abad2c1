#!/usr/bin/env python
"""FCMAE pre-training CLI.

Flag-compatible façade over mmearth_tpu (reference main_pretrain.py:30-162);
flags that only exist for CUDA/DDP plumbing (--device, --dist_url, ...) are
accepted and ignored with a note.
"""
from __future__ import annotations

import argparse

from mmearth_tpu.configs import modalities as M
from mmearth_tpu.configs.config import DataConfig, ModelConfig, OptimConfig, PretrainConfig, RunConfig


def str2bool(v):
    return str(v).lower() in ("yes", "true", "t", "1")


def get_args_parser():
    p = argparse.ArgumentParser("FCMAE pre-training (TPU)", add_help=False)
    p.add_argument("--wandb", type=str2bool, default=False)
    p.add_argument("--wandb_project", type=str, default="global-lr")
    p.add_argument("--wandb_run_name", type=str, default=None)

    p.add_argument("--batch_size", default=64, type=int, help="Per-chip batch size")
    p.add_argument("--epochs", default=800, type=int)
    p.add_argument("--warmup_epochs", type=int, default=40)
    p.add_argument("--update_freq", default=1, type=int, help="gradient accumulation steps")

    p.add_argument("--loss_aggr", choices=["uncertainty", "unweighted"], default="uncertainty")
    p.add_argument("--loss_full", type=str2bool, default=False)

    p.add_argument("--model", default="convnextv2_pico", type=str)
    p.add_argument("--input_size", default=112, type=int)
    p.add_argument("--mask_ratio", default=0.6, type=float)
    p.add_argument("--norm_pix_loss", type=str2bool, default=False)
    p.add_argument("--decoder_depth", type=int, default=1)
    p.add_argument("--decoder_embed_dim", type=int, default=512)
    p.add_argument("--patch_size", type=int, default=16)
    p.add_argument("--use_orig_stem", type=str2bool, default=False)

    p.add_argument("--weight_decay", type=float, default=0.05)
    p.add_argument("--lr", type=float, default=None)
    p.add_argument("--blr", type=float, default=1.5e-4)
    p.add_argument("--min_lr", type=float, default=0.0)

    p.add_argument("--data_dir", default=str(M.mmearth_dir()), type=str)
    p.add_argument("--processed_dir", default=None, type=str)
    p.add_argument("--random_crop", type=str2bool, default=True)
    p.add_argument("--output_dir", default="")
    p.add_argument("--log_dir", default=None)
    p.add_argument("--seed", default=0, type=int)
    p.add_argument("--resume", default="")
    p.add_argument("--auto_resume", type=str2bool, default=True)
    p.add_argument("--save_ckpt", type=str2bool, default=True)
    p.add_argument("--save_ckpt_freq", default=1, type=int)
    p.add_argument("--save_ckpt_num", default=3, type=int)
    p.add_argument("--start_epoch", default=0, type=int)
    p.add_argument("--num_workers", default=10, type=int)
    p.add_argument("--debug", type=str2bool, default=False)
    p.add_argument("--use_bf16", type=str2bool, default=True,
                   help="bf16 compute policy (TPU-native replacement for --use_mixed)")
    p.add_argument("--steps_per_dispatch", type=int, default=1,
                   help="chain k optimizer steps per device dispatch (hides dispatch latency)")
    p.add_argument("--block_impl",
                   choices=["auto", "xla", "fused", "spillg", "remat",
                            "folded", "dwg", "wholeblock"], default="auto",
                   help="masked-encoder block implementation ('fused' = opt-in "
                        "Pallas kernel)")
    p.add_argument("--sparse_impl", choices=["gathered", "masked_dense"], default="gathered",
                   help="sparse encoder execution: compute on visible patches "
                        "only (gathered) or the full re-masked grid")
    p.add_argument("--grn_scope", choices=["global", "per_device"], default="per_device",
                   help="MaskedGRN statistic scope: per_device (default) "
                        "reproduces the reference's per-GPU DDP stats and "
                        "avoids one cross-chip all-reduce per block per step "
                        "(tests/test_collective_audit.py); global computes "
                        "the statistic over the full cross-device batch")
    p.add_argument("--gelu_approx", type=str2bool, default=False,
                   help="tanh-approximate GELU (~1e-3-relative deviation from "
                        "the reference's exact erf GELU; measured NOT a v5e "
                        "perf win — see ROADMAP.md)")
    p.add_argument("--loader", choices=["mmpack", "grain", "hdf5"], default="mmpack",
                   help="input pipeline: mmpack = memory-mapped local tensors; "
                        "grain = Grain/ArrayRecord (cloud-storage-friendly, "
                        "checkpointable iterator); hdf5 = stream straight from "
                        "the HDF5, no packing step (the reference no_ffcv path; "
                        "slower, but no second on-disk copy)")
    p.add_argument("--order", choices=["random", "quasi_random", "sequential"],
                   default=None,
                   help="mmpack train sampling order (FFCV OrderOption parity; "
                        "quasi_random = locality-aware windowed shuffle)")

    # accepted for reference compatibility; no-ops on TPU
    for flag, default in [
        ("--device", "tpu"), ("--dist_url", "env://"), ("--crop_pct", None),
        ("--world_size", 1),
    ]:
        p.add_argument(flag, default=default)
    # torch.distributed.launch injects --local-rank (torch>=2) or --local_rank
    p.add_argument("--local_rank", "--local-rank", default=-1, type=int)
    p.add_argument("--dist_on_itp", type=str2bool, default=False)
    p.add_argument("--use_mixed", type=str2bool, default=False)
    p.add_argument("--sparse", type=str2bool, default=True)
    p.add_argument("--distributed", type=str2bool, default=False)
    p.add_argument("--no_ffcv", type=str2bool, default=True)
    return p


def config_from_args(args) -> PretrainConfig:
    return PretrainConfig(
        model=ModelConfig(
            model=args.model, img_size=args.input_size, patch_size=args.patch_size,
            mask_ratio=args.mask_ratio, decoder_depth=args.decoder_depth,
            decoder_embed_dim=args.decoder_embed_dim, norm_pix_loss=args.norm_pix_loss,
            use_orig_stem=args.use_orig_stem, sparse=args.sparse,
            grn_scope=args.grn_scope, block_impl=args.block_impl,
            sparse_impl=args.sparse_impl, gelu_approx=args.gelu_approx,
        ),
        optim=OptimConfig(
            blr=args.blr, lr=args.lr, min_lr=args.min_lr, weight_decay=args.weight_decay,
            warmup_epochs=args.warmup_epochs, update_freq=args.update_freq,
        ),
        data=DataConfig(
            data_dir=args.data_dir, processed_dir=args.processed_dir,
            batch_size=args.batch_size, num_workers=args.num_workers,
            random_crop=args.random_crop, debug=args.debug,
            loader=args.loader, order=args.order,
        ),
        run=RunConfig(
            epochs=args.epochs, start_epoch=args.start_epoch, seed=args.seed,
            output_dir=args.output_dir, log_dir=args.log_dir, resume=args.resume,
            auto_resume=args.auto_resume, save_ckpt=args.save_ckpt,
            save_ckpt_freq=args.save_ckpt_freq, save_ckpt_num=args.save_ckpt_num,
            loss_aggr=args.loss_aggr, loss_full=args.loss_full,
            use_bf16=args.use_bf16, steps_per_dispatch=args.steps_per_dispatch,
            wandb=args.wandb, wandb_project=args.wandb_project,
            wandb_run_name=args.wandb_run_name,
        ),
    )


def main(args):
    from mmearth_tpu.train.pretrain import run_pretrain

    cfg = config_from_args(args)
    return run_pretrain(cfg)


if __name__ == "__main__":
    parser = argparse.ArgumentParser("FCMAE pre-training (TPU)", parents=[get_args_parser()])
    main(parser.parse_args())
