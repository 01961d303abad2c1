"""Pretraining driver: the TPU-native main_pretrain (reference
main_pretrain.py:165-391 + engine_pretrain.py:21-122).

One jitted step over a `data` mesh subsumes the reference's engine loop, DDP,
AMP scaler and NCCL collectives; the loader feeds mmpack batches with
per-host sharding; Orbax handles rolling checkpoints + auto-resume.
"""
from __future__ import annotations

import math
import sys
import time
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from ..checkpoints.orbax_io import CheckpointIO
from ..configs.config import PretrainConfig, model_size
from ..data.loader import PackedDataset, PackedLoader
from ..data.pack import pack_mmearth
from ..models import fcmae as fcmae_lib
from ..parallel import mesh as mesh_lib
from ..utils.compile_cache import enable_compilation_cache
from ..utils.logging import MetricLogger, TensorboardWriter, maybe_wandb
from . import optim as optim_lib
from .schedule import warmup_cosine
from .step import TrainState, init_fcmae, make_chained_step, make_pretrain_step


def _chunked_batches(it, k: int):
    """Group k host batches into one stacked dict (leading axis k) for
    chained dispatch; tail batches are yielded unstacked."""
    buf = []
    for b in it:
        buf.append(b)
        if len(buf) == k:
            yield {key: np.stack([bb[key] for bb in buf]) for key in buf[0]}
            buf = []
    for b in buf:
        yield b


def build_model(cfg: PretrainConfig, dtype=None) -> fcmae_lib.FCMAE:
    depths, dims = model_size(cfg.model.model)
    return fcmae_lib.FCMAE(
        img_size=cfg.model.img_size,
        patch_size=cfg.model.patch_size,
        depths=depths,
        dims=dims,
        decoder_depth=cfg.model.decoder_depth,
        decoder_embed_dim=cfg.model.decoder_embed_dim,
        mask_ratio=cfg.model.mask_ratio,
        norm_pix_loss=cfg.model.norm_pix_loss,
        sparse=cfg.model.sparse,
        use_orig_stem=cfg.model.use_orig_stem,
        grn_group=cfg.data.batch_size if cfg.model.grn_scope == "per_device" else 0,
        block_impl=cfg.model.block_impl,
        sparse_impl=cfg.model.sparse_impl,
        gelu_approx=cfg.model.gelu_approx,
        loss_aggr=cfg.run.loss_aggr,
        loss_full=cfg.run.loss_full,
        inp_modalities=cfg.data.inp_modalities,
        out_modalities=cfg.data.out_modalities,
        dtype=dtype if dtype is not None else (jnp.bfloat16 if cfg.run.use_bf16 else jnp.float32),
    )


def get_dataloader(cfg: PretrainConfig, split: str = "train"):
    processed = Path(cfg.data.processed_dir or cfg.data.data_dir)
    indices = [list(range(10))] if cfg.data.debug else None  # reference --debug (main_pretrain.py:219-221)
    is_train = split == "train"
    if cfg.data.loader == "grain":
        from ..data.grain_pipeline import GrainLoader, pack_arrayrecord
        from ..data.mmearth import MMEarthDataset

        dest = processed / (split + "_arrayrecord" + ("_subset" if indices else ""))
        if not (dest / "meta.json").exists():
            src = MMEarthDataset(cfg.data.data_dir, cfg.data.modalities, split=split)
            print(f"packing split {split!r} -> {dest}")
            pack_arrayrecord(src, dest, indices=indices[0] if indices else None)
        loader = GrainLoader(
            dest,
            batch_size=cfg.data.batch_size * jax.local_device_count(),
            shuffle=is_train,
            drop_last=is_train,
            seed=cfg.run.seed,
            shard=(jax.process_index(), jax.process_count()),
            worker_count=0 if cfg.data.num_workers <= 1 else cfg.data.num_workers,
        )
        class _Count:  # len(ds) = global sample count (PackedDataset parity)
            def __len__(self_inner):
                return loader.count

        return _Count(), loader

    if cfg.data.loader == "hdf5":
        from ..data.mmearth import HDF5StreamLoader, MMEarthDataset

        ds = MMEarthDataset(cfg.data.data_dir, cfg.data.modalities, split=split)
        loader = HDF5StreamLoader(
            ds,
            batch_size=cfg.data.batch_size * jax.local_device_count(),
            shuffle=is_train,
            drop_last=is_train,
            seed=cfg.run.seed,
            shard=(jax.process_index(), jax.process_count()),
            indices=indices[0] if indices else None,
        )
        if indices:  # --debug: len(ds) must reflect the subset (LR schedule)
            class _Sub:
                def __len__(self_inner):
                    return len(indices[0])

            return _Sub(), loader
        return ds, loader

    packed = pack_mmearth(
        cfg.data.data_dir, processed, cfg.data.modalities, splits=(split,), indices=indices
    )[0]
    ds = PackedDataset(packed)
    loader = PackedLoader(
        ds,
        batch_size=cfg.data.batch_size * jax.local_device_count(),
        shuffle=is_train,
        drop_last=is_train,
        seed=cfg.run.seed,
        shard=(jax.process_index(), jax.process_count()),
        num_workers=cfg.data.num_workers,
        order=cfg.data.order if is_train else "sequential",
    )
    return ds, loader


def run_pretrain(cfg: PretrainConfig):
    enable_compilation_cache()
    mesh_lib.init_distributed()
    mesh = mesh_lib.create_mesh()
    is_main = jax.process_index() == 0

    model = build_model(cfg)
    ds, loader = get_dataloader(cfg)

    eff_batch = cfg.data.batch_size * cfg.optim.update_freq * jax.device_count()
    updates_per_epoch = max(len(ds) // eff_batch, 1)  # len(ds) is the global count; the loader shards it
    lr = cfg.optim.absolute_lr(eff_batch)
    if is_main:
        print(f"effective batch size: {eff_batch}  actual lr: {lr:.2e}  updates/epoch: {updates_per_epoch}")

    schedule = warmup_cosine(lr, cfg.optim.min_lr, cfg.run.epochs, cfg.optim.warmup_epochs, updates_per_epoch)

    sample = next(iter(loader))
    sample = {k: jnp.asarray(v[: max(2, jax.local_device_count())]) for k, v in sample.items()}
    params = init_fcmae(model, cfg.run.seed, sample)
    n_params = sum(x.size for x in jax.tree_util.tree_leaves(params))
    n_params_enc = sum(
        x.size for x in jax.tree_util.tree_leaves(params.get("encoder", {}))
    )
    if is_main:
        print(f"number of params: {n_params} (encoder: {n_params_enc})")

    tx = optim_lib.make_pretrain_optimizer(
        params, schedule, cfg.optim.weight_decay, cfg.optim.betas, cfg.optim.update_freq,
        clip_grad=cfg.optim.clip_grad,
    )
    params = mesh_lib.shard_params(params, mesh)
    state = TrainState.create(params, tx)

    # Grain runs train off the continuous checkpointable iterator: the stream
    # position is saved with each checkpoint and restored on resume, so a
    # killed run continues on exactly the next sample (the reference restarts
    # the epoch instead, helpers.py:568-610).
    grain_stream = cfg.data.loader == "grain" and hasattr(loader, "iterator")
    restored_loader_state = None

    ckpt = CheckpointIO(cfg.run.output_dir, cfg.run.save_ckpt_num, cfg.run.save_ckpt_freq) if cfg.run.output_dir and cfg.run.save_ckpt else None
    start_epoch = cfg.run.start_epoch
    if cfg.run.resume:
        # explicit --resume <path> (reference helpers.py:568-610 honors
        # args.resume over the auto-resume glob)
        rp = Path(cfg.run.resume)
        if rp.suffix in (".pth", ".pt"):
            # torch checkpoint: params only (optimizer moments don't map);
            # epoch comes from --start_epoch
            from ..checkpoints import torch_convert as tc

            sd = tc.load_pth(rp)
            restored = tc.torch_fcmae_to_flax(
                sd, cfg.model.depths, cfg.data.out_modalities,
                cfg.model.decoder_depth, cfg.model.use_orig_stem,
            )
            state = state.replace(params=jax.tree_util.tree_map(
                lambda cur, new: jnp.asarray(new, cur.dtype), state.params, restored
            ))
            if is_main:
                print(f"resumed params from torch checkpoint {rp}")
        else:
            from ..checkpoints.orbax_io import find_loader_state, restore_explicit

            state, resumed = restore_explicit(state, rp)
            start_epoch = resumed + 1
            if grain_stream:
                restored_loader_state = find_loader_state(rp, resumed)
            if is_main:
                print(f"resumed from {rp} (epoch {resumed})")
        state = mesh_lib.place_state(state, mesh)
    elif ckpt is not None and cfg.run.auto_resume:
        state, resumed = ckpt.restore(state)
        if resumed is not None:
            state = mesh_lib.place_state(state, mesh)
            start_epoch = resumed + 1
            if grain_stream:
                restored_loader_state = ckpt.loader_state(resumed)
            print(f"auto-resumed from epoch {resumed}")

    if grain_stream and restored_loader_state is not None:
        loader.set_state(restored_loader_state)
        if is_main:
            print("restored grain loader position (mid-stream resume)")

    step_fn = jax.jit(make_pretrain_step(model, cfg.data.random_crop), donate_argnums=(0,))
    k = max(cfg.run.steps_per_dispatch, 1)
    chained_fn = (
        jax.jit(make_chained_step(make_pretrain_step(model, cfg.data.random_crop), k), donate_argnums=(0,))
        if k > 1 else None
    )
    rng = jax.random.PRNGKey(cfg.run.seed)

    tb = TensorboardWriter(cfg.run.log_dir) if (cfg.run.log_dir and is_main) else None
    wandb = maybe_wandb(cfg.run.wandb and is_main, cfg.run.wandb_project, cfg.run.wandb_run_name, vars(cfg.run)) if is_main else None

    history = []
    t_start = time.time()
    for epoch in range(start_epoch, cfg.run.epochs):
        logger = MetricLogger(header=f"Epoch: [{epoch}]")
        pending = None
        # exact epoch mean: reset the on-device loss accumulator; every step
        # adds its loss to state.loss_sum (step.py), fetched ONCE at epoch end
        # — all steps weighted equally, like the reference's per-iteration
        # meter (engine_pretrain.py:104-113), without per-step syncs
        state = state.replace(loss_sum=jnp.zeros((), jnp.float32))
        steps_done = 0
        niter = len(loader)
        if grain_stream:
            # continuous stream: len(loader) batches per "epoch"; the sampler
            # reshuffles internally at epoch boundaries; position persists
            import itertools

            epoch_iter = itertools.islice(loader.iterator(), niter)
        else:
            loader.set_epoch(epoch)
            epoch_iter = iter(loader)
        batch_iter = epoch_iter if k == 1 else _chunked_batches(epoch_iter, k)
        niter = niter if k == 1 else -(-niter // k)
        for i, host_batch in logger.log_every(batch_iter, total=niter):
            if k == 1 or host_batch["sentinel2"].ndim == 4:
                # single step (tail groups smaller than k come through unstacked)
                batch = mesh_lib.shard_batch(host_batch, mesh)
                state, metrics = step_fn(state, batch, rng)
                steps_done += 1
            else:
                # stacked (k, B, ...) superbatch: shard B (axis 1) over 'data'
                batch = mesh_lib.shard_batch(host_batch, mesh, axis=1)
                state, metrics = chained_fn(state, batch, rng)
                steps_done += int(host_batch["sentinel2"].shape[0])
            # Materialize metrics only at print boundaries: every device->host
            # fetch costs a full dispatch round trip, so per-step fetches
            # (reference loss.item(), engine_pretrain.py:78) would serialize
            # the pipeline.  The non-finite check runs at the same cadence.
            if pending is not None and i % logger.print_freq == 0:
                loss_v = float(pending["loss"])
                if not math.isfinite(loss_v):
                    print(f"Loss is {loss_v}, stopping training")  # engine_pretrain.py:83-85
                    sys.exit(1)
                logger.update(n=logger.print_freq, loss=loss_v,
                              lr=float(schedule(state.step // max(cfg.optim.update_freq, 1))))
            pending = metrics
        if pending is not None:
            logger.update(loss=float(pending["loss"]))

        stats = logger.averages()
        if steps_done > 0:
            # the meter's loss is a print-cadence subsample (kept for live
            # display + the non-finite window); the logged/reported epoch
            # loss is the exact all-steps mean from the device accumulator
            stats["loss"] = float(state.loss_sum) / steps_done
        loss_dict = {k[5:]: float(v) for k, v in pending.items() if k.startswith("loss_")}
        log_vars = np.asarray(pending["log_vars"]).tolist() if "log_vars" in pending else None
        history.append({"epoch": epoch, **stats})
        if is_main:
            sps = eff_batch * updates_per_epoch / max(time.time() - t_start, 1e-9)
            print(f"epoch {epoch} done  avg loss {stats.get('loss', float('nan')):.4f}  ~{sps:.0f} samples/s")
            t_start = time.time()
        if tb is not None:
            tb.log({**stats, **{f"loss_{k}": v for k, v in loss_dict.items()}}, epoch + 1)
            tb.flush()
        if wandb is not None:
            payload = {**{f"train_{k}": v for k, v in stats.items()}, "epoch": epoch}
            payload.update({f"train_loss_{k}": v for k, v in loss_dict.items()})
            if log_vars is not None:
                payload.update({f"log_var_{i}": v for i, v in enumerate(log_vars)})
            wandb.log(payload)
        if ckpt is not None and ((epoch + 1) % cfg.run.save_ckpt_freq == 0 or epoch + 1 == cfg.run.epochs):
            ckpt.save(epoch, state,
                      loader_state=loader.get_state() if grain_stream else None)

    if ckpt is not None:
        ckpt.wait()
    return state, history
