"""GEO-Bench finetuning driver (reference main_finetune.py:427-806 +
engine_finetune.py:56-300).

Covers: classification finetune, linear probe, and UNet segmentation with the
staged decoder-probe -> full-finetune unfreeze at epoch 50
(main_finetune.py:598-619).  Eval metrics are dataset-overall, computed from
device-side sufficient statistics.  Best-val checkpoint is tracked and the
final test evaluation runs on the last-epoch weights, as the reference does
(checkpoint-{epochs-1} reload, main_finetune.py:712-758).

Deviation (documented): at the epoch-50 unfreeze the optimizer state is
rebuilt fresh for all params, whereas torch's ``add_param_group`` keeps the
old groups' Adam moments.  Moments re-warm within a few steps.
"""
from __future__ import annotations

import json
import time
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..checkpoints import load_pretrained as lp
from ..checkpoints.orbax_io import CheckpointIO, save_params
from ..configs.config import FinetuneConfig, model_size
from ..data.geobench import NUM_CLASSES, TASK_CLASS, get_geobench_dataloaders
from ..eval.metrics import batch_stats_fn, metric_for
from ..losses.finetune import criterion_fn
from ..models import convnextv2 as cnx
from ..models import unet as unet_lib
from ..parallel import mesh as mesh_lib
from ..utils.compile_cache import enable_compilation_cache
from ..utils.logging import MetricLogger, TensorboardWriter, maybe_wandb
from . import optim as optim_lib
from .schedule import warmup_cosine
from .step import TrainState


def build_finetune_model(cfg: FinetuneConfig, in_channels: int, nb_classes: int):
    if cfg.model.model.startswith("resnet"):
        from ..models import resnet as resnet_lib

        builder = {
            "resnet18": resnet_lib.resnet18, "resnet50": resnet_lib.resnet50,
            # smp.Unet ResNet-encoder seg baselines (main_finetune.py:480-489)
            "resnet18_unet": resnet_lib.resnet18_unet, "resnet50_unet": resnet_lib.resnet50_unet,
        }[cfg.model.model]
        return builder(
            num_classes=nb_classes, in_chans=in_channels,
            dtype=jnp.bfloat16 if cfg.run.use_bf16 else jnp.float32,
        )
    depths, dims = model_size(cfg.model.model)
    common = dict(
        patch_size=cfg.model.patch_size,
        img_size=cfg.model.img_size,
        in_chans=in_channels,
        num_classes=nb_classes,
        depths=depths,
        dims=dims,
        drop_path_rate=cfg.drop_path,
        head_init_scale=cfg.head_init_scale,
        use_orig_stem=cfg.model.use_orig_stem,
        dtype=jnp.bfloat16 if cfg.run.use_bf16 else jnp.float32,
    )
    if "unet" in cfg.model.model:
        return unet_lib.ConvNeXtV2Unet(**common)
    return cnx.ConvNeXtV2(**common, sparse=False, padding_mode=cfg.model.padding_mode)


def make_finetune_step(model, criterion, is_seg: bool, has_batch_stats: bool = False,
                       bgr_to_rgb: bool = False, ema_decay: float | None = None,
                       update_freq: int = 1):
    from .ema import update_ema

    def step(state: TrainState, batch, rng):
        x = batch["input"]
        y = batch["label"]
        if bgr_to_rgb:
            # imnet-pretrained weights expect RGB; geobench bgr bands are
            # reordered per batch (reference engine_finetune.py:92-95)
            x = x[..., [2, 1, 0]]

        if has_batch_stats:
            def loss_fn(params):
                logits, mutated = model.apply(
                    {"params": params, **state.model_state}, x,
                    train=True, mutable=["batch_stats"],
                )
                return criterion(logits, y), mutated

            (loss, mutated), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
            new_state = state.apply_gradients(grads, model_state=mutated)
        else:
            def loss_fn(params):
                logits = model.apply(
                    {"params": params}, x, deterministic=False,
                    rngs={"droppath": jax.random.fold_in(rng, state.step)},
                )
                return criterion(logits, y)

            loss, grads = jax.value_and_grad(loss_fn)(state.params)
            new_state = state.apply_gradients(grads)
        if ema_decay is not None:
            # model EMA (reference --model_ema, main_finetune.py:96-101).
            # With gradient accumulation the optimizer applies an update only
            # every ``update_freq`` micro-steps (optax.MultiSteps); the
            # reference's engine likewise calls model_ema.update once per
            # real update, so decay 1.0 (identity) on accumulation-only steps.
            applied = (new_state.step % update_freq) == 0
            decay = jnp.where(applied, ema_decay, 1.0)
            new_state = new_state.replace(
                ema_params=update_ema(new_state.ema_params, new_state.params, decay)
            )
        return new_state, {"loss": loss}

    return step


def make_eval_step(model, stats_fn, has_batch_stats: bool = False, bgr_to_rgb: bool = False):
    def eval_step(params, batch, model_state=None):
        variables = {"params": params, **(model_state or {})}
        x = batch["input"]
        if bgr_to_rgb:
            x = x[..., [2, 1, 0]]
        if has_batch_stats:
            logits = model.apply(variables, x, train=False)
        else:
            logits = model.apply(variables, x)
        return stats_fn(logits.astype(jnp.float32), batch["label"])

    return eval_step


def evaluate(params, loader, eval_step, metric, model_state=None):
    metric.reset()
    for batch in loader:
        stats = eval_step(params, {k: jnp.asarray(v) for k, v in batch.items()}, model_state)
        metric.update_stats(jax.tree_util.tree_map(np.asarray, stats))
    return metric.compute()


def run_finetune(cfg: FinetuneConfig, loaders=None, task=None):
    enable_compilation_cache()
    mesh_lib.init_distributed()
    mesh = mesh_lib.create_mesh()
    is_main = jax.process_index() == 0
    is_seg = TASK_CLASS[cfg.data_set] == "segmentation"

    if loaders is None:
        if cfg.processed_dir:
            processed = Path(cfg.processed_dir)
        elif cfg.run.output_dir:
            processed = Path(cfg.run.output_dir) / "geobench_proc"
        else:
            processed = Path(cfg.finetune).parent / "geobench_proc"
        loaders, task = get_geobench_dataloaders(
            cfg.data_set, processed, cfg.num_workers,
            cfg.batch_size * jax.local_device_count(),  # batch_size is per-chip (reference per-GPU)
            splits=("train", "val", "test"), partition=cfg.partition,
            geobench_bands_type=cfg.geobench_bands_type, seed=cfg.run.seed,
            shard=(jax.process_index(), jax.process_count()),
        )
    train_loader, val_loader, test_loader = loaders

    sample = next(iter(train_loader))
    in_channels = sample["input"].shape[-1]
    nb_classes = task.num_classes if task is not None else NUM_CLASSES[cfg.data_set]

    is_resnet = cfg.model.model.startswith("resnet")
    is_resnet_unet = is_resnet and "unet" in cfg.model.model
    model = build_finetune_model(cfg, in_channels, nb_classes)
    variables = jax.jit(model.init)(jax.random.PRNGKey(cfg.run.seed), jnp.asarray(sample["input"][:2]))
    params = variables["params"]
    model_state = {"batch_stats": variables["batch_stats"]} if is_resnet else None

    # --- checkpoint bootstrap + freezing (helpers.py:799-1002)
    depths = model_size(cfg.model.model)[0] if not is_resnet else (2, 2, 2, 2)
    if cfg.finetune and not is_resnet:
        if (str(cfg.finetune).endswith((".pth", ".pt"))
                and cfg.model.padding_mode == "same"
                and "unet" not in cfg.model.model and is_main):
            # reference-trained weights + our SAME padding = a different
            # border geometry than the checkpoint was evaluated with
            # (reference convnextv2.py:109,114-124).  Measured deviation on
            # identical weights: see PARITY.md "Padding".
            print(
                "WARNING: finetuning from a torch .pth with padding_mode='same'.\n"
                "  The reference's dense model uses VALID initial_conv + stride//2 stem\n"
                "  padding; to replicate its published finetune geometry exactly, pass\n"
                "  --padding_mode reference.  (SAME is self-consistent for checkpoints\n"
                "  pretrained by this framework.)"
            )
        enc = lp.encoder_tree_from_checkpoint(cfg.finetune, depths, cfg.model.use_orig_stem)
        params = lp.load_encoder_into(params, enc)
        params = lp.reinit_head(params, cfg.run.seed)
        params = jax.tree_util.tree_map(jnp.asarray, params)
    elif cfg.finetune and is_resnet:
        # seco/gassl/satlas/imagenet baselines (helpers.py:824-933)
        from ..checkpoints.foreign import load_foreign_resnet
        from ..models.resnet import resnet_spec

        stage_sizes, bottleneck = resnet_spec(cfg.model.model)
        fparams, fstats = load_foreign_resnet(cfg.finetune, stage_sizes, bottleneck)
        fparams.pop("fc", None)
        if is_resnet_unet:
            params = lp.load_encoder_into(params, fparams, where="encoder")
            stats = lp.load_encoder_into(model_state["batch_stats"], fstats, where="encoder")
        else:
            params = lp.load_encoder_into(params, fparams)
            stats = lp.load_encoder_into(model_state["batch_stats"], fstats)
            params = lp.reinit_head(params, cfg.run.seed)  # fc re-init std 2e-5
        params = jax.tree_util.tree_map(jnp.asarray, params)
        model_state = {"batch_stats": jax.tree_util.tree_map(jnp.asarray, stats)}
    if cfg.linear_probe:
        if is_resnet_unet:
            # freeze encoder, train decoder + segmentation head (helpers.py:957-966)
            trainable = lambda path: not path.startswith("encoder")
        elif is_resnet:
            trainable = lambda path: path.startswith("fc")  # helpers.py:968-983
        elif "unet" in cfg.model.model:
            trainable = lp.unet_probe_trainable
        else:
            trainable = lp.classifier_probe_trainable
    else:
        if "unet" in cfg.model.model:
            raise ValueError("unet runs use --linear_probe True (staged unfreeze); see helpers.py:800-804")
        trainable = lp.all_trainable

    eff_batch = cfg.batch_size * cfg.optim.update_freq * jax.device_count()
    updates_per_epoch = max(len(train_loader.dataset) // eff_batch, 1)
    lr = cfg.optim.absolute_lr(eff_batch)
    schedule = warmup_cosine(lr, cfg.optim.min_lr, cfg.run.epochs, cfg.optim.warmup_epochs, updates_per_epoch)

    def build_tx(trainable_fn):
        mask = optim_lib.zero_grads_mask(params, trainable_fn)
        return optim_lib.make_finetune_optimizer(
            params, schedule, cfg.optim.weight_decay, cfg.optim.betas,
            cfg.optim.layer_decay, cfg.optim.layer_decay_type, depths,
            trainable_mask=mask, update_freq=cfg.optim.update_freq,
            clip_grad=cfg.optim.clip_grad, opt=cfg.optim.opt,
            opt_eps=cfg.optim.opt_eps, momentum=cfg.optim.momentum,
        )

    ema_decay = cfg.model_ema_decay if cfg.model_ema else None
    state = TrainState.create(
        params, build_tx(trainable), model_state=model_state,
        ema_params=jax.tree_util.tree_map(jnp.asarray, params) if cfg.model_ema else None,
    )
    criterion = criterion_fn(cfg.data_set, cfg.smoothing)
    stats_fn = batch_stats_fn(cfg.data_set, nb_classes)
    metric_name, metric = metric_for(cfg.data_set, nb_classes)

    # experiment logging (reference main_finetune.py:680-704,796-804: wandb
    # per-epoch log_stats + log.txt JSON lines in output_dir; log_writer is
    # always None there — our --log_dir TensorBoard channel is a superset).
    # --test_scores_dir stays a documented no-op: the reference's writer is
    # commented out (main_finetune.py:774-781).
    n_parameters = sum(
        leaf.size
        for leaf, t in zip(
            jax.tree_util.tree_leaves(params),
            jax.tree_util.tree_leaves(optim_lib.zero_grads_mask(params, trainable)),
        )
        if t
    )
    tb = TensorboardWriter(cfg.run.log_dir) if (cfg.run.log_dir and is_main) else None
    wandb = (
        maybe_wandb(cfg.run.wandb, cfg.run.wandb_project, cfg.run.wandb_run_name,
                    {"data_set": cfg.data_set, "model": cfg.model.model,
                     "linear_probe": cfg.linear_probe, **vars(cfg.run)})
        if is_main else None
    )
    log_file = Path(cfg.run.output_dir) / "log.txt" if (cfg.run.output_dir and is_main) else None
    if is_main:
        print(f"number of params (trainable): {n_parameters}")

    bgr_to_rgb = cfg.use_imnet_weights and cfg.geobench_bands_type == "bgr"
    step_fn = jax.jit(make_finetune_step(model, criterion, is_seg, is_resnet, bgr_to_rgb, ema_decay,
                                         update_freq=cfg.optim.update_freq), donate_argnums=(0,))
    eval_fn = jax.jit(make_eval_step(model, stats_fn, is_resnet, bgr_to_rgb))
    rng = jax.random.PRNGKey(cfg.run.seed)

    ckpt = CheckpointIO(cfg.run.output_dir, cfg.run.save_ckpt_num) if (cfg.run.output_dir and cfg.run.save_ckpt) else None
    start_epoch = cfg.run.start_epoch
    if cfg.run.resume:
        from ..checkpoints.orbax_io import restore_explicit

        state, resumed = restore_explicit(state, cfg.run.resume)
        state = mesh_lib.place_state(state, mesh)
        start_epoch = resumed + 1
        if is_main:
            print(f"resumed from {cfg.run.resume} (epoch {resumed})")
    elif ckpt is not None and cfg.run.auto_resume:
        state, resumed = ckpt.restore(state)
        if resumed is not None:
            state = mesh_lib.place_state(state, mesh)
            start_epoch = resumed + 1
            if is_main:
                print(f"auto-resumed from epoch {resumed}")

    best_val = -float("inf")
    best_params = None
    history = []
    unfrozen = False
    for epoch in range(start_epoch, cfg.run.epochs):
        if is_seg and cfg.linear_probe and not unfrozen and epoch >= cfg.unfreeze_epoch:
            unfrozen = True
            if is_main:
                print(f"epoch {epoch}: unfreezing the full model (main_finetune.py:598-619)")
            state = TrainState.create(state.params, build_tx(lp.all_trainable),
                                      model_state=state.model_state, ema_params=state.ema_params)
            step_fn = jax.jit(make_finetune_step(model, criterion, is_seg, is_resnet, bgr_to_rgb, ema_decay,
                                         update_freq=cfg.optim.update_freq), donate_argnums=(0,))

        train_loader.set_epoch(epoch)
        logger = MetricLogger(header=f"Epoch: [{epoch}]")
        last_metrics = None
        for i, batch in logger.log_every(iter(train_loader), total=len(train_loader)):
            device_batch = mesh_lib.shard_batch(batch, mesh)
            state, m = step_fn(state, device_batch, rng)
            if last_metrics is not None:
                logger.update(loss=float(last_metrics["loss"]))
            last_metrics = m
        if last_metrics is not None:
            logger.update(loss=float(last_metrics["loss"]))

        eval_params = state.ema_params if (cfg.model_ema and cfg.model_ema_eval) else state.params
        val_score = evaluate(eval_params, val_loader, eval_fn, metric, state.model_state) if val_loader is not None else float("nan")
        stats = logger.averages()
        history.append({"epoch": epoch, **stats, f"val_{metric_name}": val_score})
        if is_main:
            print(f"epoch {epoch}  loss {stats.get('loss', float('nan')):.4f}  val {metric_name} {val_score:.4f}")
        # per-epoch experiment record (reference log_stats keys,
        # main_finetune.py:680-704): train_* meters + test_<metric> (the
        # reference calls its val pass "test_stats") + epoch + n_parameters
        log_stats = {
            **{f"train_{k}": v for k, v in stats.items()},
            "train_lr": float(schedule(int(state.step) // max(cfg.optim.update_freq, 1))),
            f"test_{metric_name}": val_score,
            "epoch": epoch,
            "n_parameters": n_parameters,
        }
        if wandb is not None:
            wandb.log(log_stats)
        if tb is not None:
            tb.log(log_stats, epoch + 1)
            tb.flush()
        if log_file is not None:
            with open(log_file, "a", encoding="utf-8") as f:
                f.write(json.dumps(log_stats) + "\n")
        if val_score >= best_val:
            best_val = val_score
            best_params = jax.tree_util.tree_map(np.asarray, state.params)
        if ckpt is not None:
            ckpt.save(epoch, state)

    # Final test eval reloads the last-epoch checkpoint from DISK, as the
    # reference does (checkpoint-{epochs-1} reload, main_finetune.py:712-758)
    # — this also validates the saved artifact end-to-end.  Without an output
    # dir the in-memory params are scored instead (documented deviation).
    if ckpt is not None:
        ckpt.wait()
    eval_state = state
    test_from = "memory"
    if ckpt is not None and ckpt.latest_epoch() is not None:
        eval_state, restored_epoch = ckpt.restore(state)
        test_from = f"disk (epoch {restored_epoch})"
    test_params = eval_state.ema_params if (cfg.model_ema and cfg.model_ema_eval) else eval_state.params
    test_score = evaluate(test_params, test_loader, eval_fn, metric, eval_state.model_state) if test_loader is not None else None
    if is_main:
        print(f"final test {metric_name}: {test_score}  (params from {test_from})")
        print(f"best val {metric_name}: {best_val}")
    if cfg.run.output_dir and best_params is not None:
        save_params(Path(cfg.run.output_dir) / "checkpoint-best", best_params)
    if wandb is not None:
        wandb.finish()
    return {
        "history": history,
        f"best_val_{metric_name}": best_val,
        f"test_{metric_name}": test_score,
        "test_params_from": test_from,
        "state": state,
    }
