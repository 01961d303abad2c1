"""Typed configuration tree.

Replaces the reference's argparse grab-bag (main_pretrain.py:30-162,
main_finetune.py:59-424) with dataclasses.  The CLI façades in
``main_pretrain.py`` / ``main_finetune.py`` keep the reference flag names and
populate these configs.
"""
from __future__ import annotations

import dataclasses
from pathlib import Path
from typing import Any, Mapping

from . import modalities as M

# Model size table (reference models/fcmae.py:459-496, convnextv2.py:210-247).
MODEL_SIZES: dict[str, tuple[tuple[int, ...], tuple[int, ...]]] = {
    "atto": ((2, 2, 6, 2), (40, 80, 160, 320)),
    "femto": ((2, 2, 6, 2), (48, 96, 192, 384)),
    "pico": ((2, 2, 6, 2), (64, 128, 256, 512)),
    "nano": ((2, 2, 8, 2), (80, 160, 320, 640)),
    "tiny": ((3, 3, 9, 3), (96, 192, 384, 768)),
    "base": ((3, 3, 27, 3), (128, 256, 512, 1024)),
    "large": ((3, 3, 27, 3), (192, 384, 768, 1536)),
    "huge": ((3, 3, 27, 3), (352, 704, 1408, 2816)),
}


def model_size(name: str) -> tuple[tuple[int, ...], tuple[int, ...]]:
    """Look up (depths, dims) from any reference model name, e.g.
    ``convnextv2_atto`` / ``convnextv2_unet_tiny``."""
    key = name.split("_")[-1]
    if key not in MODEL_SIZES:
        raise ValueError(f"unknown model size in {name!r}; options: {sorted(MODEL_SIZES)}")
    return MODEL_SIZES[key]


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    """FCMAE / ConvNeXtV2 architecture config."""

    model: str = "convnextv2_pico"
    img_size: int = 112
    patch_size: int = 16
    mask_ratio: float = 0.6
    decoder_depth: int = 1
    decoder_embed_dim: int = 512
    norm_pix_loss: bool = False
    use_orig_stem: bool = False
    # sparse=True reproduces the MinkowskiEngine semantics exactly via the
    # dense masked path; sparse=False reproduces the reference's "leaky" dense
    # path (mask applied to the input only: convnextv2.py:185-203).
    sparse: bool = True
    # "same" keeps the mask grid aligned at every geometry; "reference"
    # reproduces the reference dense model's exact padding (VALID initial_conv
    # + stride//2-padded stem, convnextv2.py:109,114-124) for bit-faithful
    # eval of released dense-path checkpoints at 112-16.  Measured deviation
    # between the two on identical weights: ~10% relative feature norm (see
    # tests/test_reference_parity.py::test_padding_deviation_quantified).
    padding_mode: str = "same"
    # MaskedGRN statistic scope during sparse pretraining: "global" computes
    # the L2 over the full (cross-device) batch; "per_device" over each
    # device's batch only — the reference's DDP behavior (each MinkowskiGRN
    # sees one GPU's batch, sparse_norm_layers.py:28-33).  Default per_device:
    # reference-faithful AND collective-free — global costs one all-reduce
    # per sparse block per step on a multi-chip mesh (measured on the
    # 8-device sim, tests/test_collective_audit.py: 2 vs 26 all-reduces at
    # (8,1)); the loss divergence between scopes is 9.7e-5 (PARITY.md).
    # Identical on a single device.
    grn_scope: str = "per_device"
    # masked-block implementation: "auto"/"xla" composed ops, "fused" the
    # opt-in Pallas kernel (see models/convnextv2.Block)
    block_impl: str = "auto"
    # sparse-encoder execution: "gathered" computes site-local ops on visible
    # patches only (~2.6x less encoder work at mask 0.6, numerically
    # identical); "masked_dense" runs the full grid with re-masking
    sparse_impl: str = "gathered"
    # tanh-approximate GELU everywhere (opt-in; ~1e-3-relative deviation from
    # the reference's exact erf GELU, cheaper VPU transcendentals)
    gelu_approx: bool = False
    drop_path_rate: float = 0.0

    @property
    def depths(self) -> tuple[int, ...]:
        return model_size(self.model)[0]

    @property
    def dims(self) -> tuple[int, ...]:
        return model_size(self.model)[1]

    @property
    def grid(self) -> int:
        return self.img_size // self.patch_size

    @property
    def num_patches(self) -> int:
        return self.grid ** 2


@dataclasses.dataclass(frozen=True)
class OptimConfig:
    blr: float = 1.5e-4
    lr: float | None = None  # absolute lr; derived from blr if None
    min_lr: float = 0.0
    weight_decay: float = 0.05
    warmup_epochs: int = 40
    betas: tuple[float, float] = (0.9, 0.95)
    update_freq: int = 1  # gradient accumulation steps
    layer_decay: float = 1.0
    layer_decay_type: str = "single"  # or "group"
    clip_grad: float | None = None
    # reference --opt family (optim_factory.py:149-252); finetune only —
    # pretrain hard-codes AdamW like the reference (main_pretrain.py:320)
    opt: str = "adamw"
    opt_eps: float = 1e-8
    momentum: float = 0.9

    def absolute_lr(self, eff_batch_size: int) -> float:
        # reference main_pretrain.py:297-298
        return self.lr if self.lr is not None else self.blr * eff_batch_size / 256


@dataclasses.dataclass(frozen=True)
class DataConfig:
    data_dir: str = ""
    processed_dir: str | None = None
    batch_size: int = 64  # per-process (global divided over local devices)
    num_workers: int = 10
    random_crop: bool = True
    inp_modalities: Mapping[str, Any] = dataclasses.field(default_factory=lambda: dict(M.INP_MODALITIES))
    out_modalities: Mapping[str, Any] = dataclasses.field(default_factory=lambda: dict(M.OUT_MODALITIES))
    debug: bool = False  # 10-sample subset, mirrors reference --debug
    # input pipeline backend: "mmpack" = memory-mapped flat tensors + native
    # gather (local disk); "grain" = Grain over ArrayRecord shards
    # (cloud-storage-friendly, checkpointable iterator; data/grain_pipeline.py)
    loader: str = "mmpack"
    # train-split sampling order for mmpack: random | quasi_random | sequential
    # (reference FFCV OrderOption, mmearth_dataset.py:301-310 — it hardcodes
    # RANDOM for train; quasi_random is our locality-aware extension)
    order: str | None = None

    @property
    def modalities(self) -> dict[str, Any]:
        """Union of input and output modalities, input first (reference
        main_pretrain.py:175-181)."""
        merged = dict(self.inp_modalities)
        merged.update(self.out_modalities)
        return merged


@dataclasses.dataclass(frozen=True)
class RunConfig:
    epochs: int = 800
    start_epoch: int = 0
    seed: int = 0
    output_dir: str = ""
    log_dir: str | None = None
    resume: str = ""
    auto_resume: bool = True
    save_ckpt: bool = True
    save_ckpt_freq: int = 1
    save_ckpt_num: int = 3
    loss_aggr: str = "uncertainty"  # or "unweighted"
    loss_full: bool = False  # compute recon loss on all patches, not just masked
    use_bf16: bool = True  # TPU-native replacement for --use_mixed/AMP
    # chain k optimizer steps per device dispatch (hides dispatch latency;
    # the loader supplies k batches at once)
    steps_per_dispatch: int = 1
    wandb: bool = False
    wandb_project: str = "global-lr"
    wandb_run_name: str | None = None


@dataclasses.dataclass(frozen=True)
class PretrainConfig:
    model: ModelConfig = dataclasses.field(default_factory=ModelConfig)
    optim: OptimConfig = dataclasses.field(default_factory=OptimConfig)
    data: DataConfig = dataclasses.field(default_factory=DataConfig)
    run: RunConfig = dataclasses.field(default_factory=RunConfig)


@dataclasses.dataclass(frozen=True)
class FinetuneConfig:
    model: ModelConfig = dataclasses.field(default_factory=ModelConfig)
    optim: OptimConfig = dataclasses.field(
        default_factory=lambda: OptimConfig(blr=2e-4, weight_decay=0.3, warmup_epochs=0, betas=(0.9, 0.999), layer_decay=0.9)
    )
    run: RunConfig = dataclasses.field(default_factory=lambda: RunConfig(epochs=100, loss_aggr="unweighted"))
    data_set: str = "m-eurosat"
    partition: str = "default"
    geobench_bands_type: str = "full"
    processed_dir: str | None = None
    nb_classes: int = 10
    in_channels: int = 12
    finetune: str = ""  # path to pretrain checkpoint
    # imnet-pretrained baseline weights: swap bgr geobench bands to rgb in the
    # step (reference --use_imnet_weights + engine_finetune.py:92-95)
    use_imnet_weights: bool = False
    linear_probe: bool = False
    smoothing: float = 0.2
    drop_path: float = 0.1
    head_init_scale: float = 0.001
    batch_size: int = 32
    num_workers: int = 10
    # segmentation staged unfreeze (reference main_finetune.py:598-619)
    unfreeze_epoch: int = 50
    # model EMA (reference --model_ema / --model_ema_decay / --model_ema_eval,
    # main_finetune.py:96-101; defined but unused by the published recipes)
    model_ema: bool = False
    model_ema_decay: float = 0.9999
    model_ema_eval: bool = False
