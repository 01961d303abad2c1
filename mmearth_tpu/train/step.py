"""The jitted pretraining step.

One `jit`-compiled function does everything the reference's per-iteration hot
loop did (engine_pretrain.py:21-122 + FCMAE.forward): aligned random crop,
NaN zeroing, masked forward, multi-pretext loss, backward, optimizer update.
Under a `data`-sharded batch with replicated params, XLA inserts the gradient
all-reduce over ICI (the DDP/NCCL equivalent).  bf16 compute replaces AMP —
no loss scaler is needed on TPU (params/grads stay f32).
"""
from __future__ import annotations

from typing import Any, Mapping

import jax
import jax.numpy as jnp
import optax
from flax import struct

from ..models import fcmae as fcmae_lib


class TrainState(struct.PyTreeNode):
    step: jax.Array
    params: Any
    opt_state: Any
    tx: optax.GradientTransformation = struct.field(pytree_node=False)
    # non-gradient model collections (e.g. BatchNorm running stats for the
    # ResNet baselines); empty for the ConvNeXt family
    model_state: Any = None
    # optional EMA of params (reference --model_ema, main_finetune.py:96-101)
    ema_params: Any = None
    # on-device running loss sum: the driver fetches metrics only at print
    # cadence (dispatch latency), but the epoch average must weight EVERY
    # step like the reference's per-iteration meter (engine_pretrain.py:
    # 104-113).  The pretrain step adds each step's loss here; the driver
    # resets it at epoch start and fetches it once at epoch end, giving the
    # exact mean with zero extra per-step syncs.
    loss_sum: jax.Array | None = None

    def apply_gradients(self, grads, model_state=...):
        updates, new_opt = self.tx.update(grads, self.opt_state, self.params)
        return self.replace(
            step=self.step + 1,
            params=optax.apply_updates(self.params, updates),
            opt_state=new_opt,
            model_state=self.model_state if model_state is ... else model_state,
        )

    @classmethod
    def create(cls, params, tx, model_state=None, ema_params=None):
        return cls(
            step=jnp.zeros((), jnp.int32), params=params, opt_state=tx.init(params),
            tx=tx, model_state=model_state, ema_params=ema_params,
        )


def make_pretrain_step(model: "fcmae_lib.FCMAE", random_crop: bool = True):
    """Returns step(state, batch, rng) -> (state, metrics).

    ``batch``: modality dict, pixel-wise entries NHWC at tile resolution.
    ``rng``: a per-run key; the per-step key is folded in from state.step so
    resume is deterministic.
    """

    def step(state: TrainState, batch: Mapping[str, jax.Array], rng: jax.Array):
        step_rng = jax.random.fold_in(rng, state.step)
        crop_rng, mask_rng = jax.random.split(step_rng)

        tile = batch["sentinel2"].shape[1]
        if random_crop and tile > model.img_size:
            batch = fcmae_lib.aligned_random_crop(crop_rng, batch, model.img_size)
        batch = fcmae_lib.zero_nan_inputs(batch)

        def loss_fn(params):
            loss, _preds, _mask, loss_dict, log_vars, weighted = model.apply(
                {"params": params}, batch, rngs={"mask": mask_rng}, deterministic=False
            )
            return loss, (loss_dict, log_vars, weighted)

        (loss, (loss_dict, log_vars, weighted)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)
        new_state = state.apply_gradients(grads)
        if state.loss_sum is not None:
            new_state = new_state.replace(
                loss_sum=state.loss_sum + loss.astype(jnp.float32)
            )

        metrics = {"loss": loss, "grad_norm": optax.global_norm(grads)}
        metrics.update({f"loss_{k}": v for k, v in loss_dict.items()})
        if log_vars is not None:
            metrics["log_vars"] = log_vars
            metrics["normalized_loss"] = jnp.sum(weighted)
        return new_state, metrics

    return step


def make_chained_step(step_fn, k: int):
    """Run k training steps in one dispatch via lax.scan over a stacked batch
    dict (leading axis k).  Hides per-dispatch latency (high on relay-attached
    chips; see utils/profiling.py) and returns the last step's metrics."""

    def chained(state, batches: Mapping[str, jax.Array], rng):
        def body(st, i):
            batch = jax.tree_util.tree_map(lambda x: x[i], batches)
            # pass rng through unchanged: step_fn folds in state.step, which
            # advances across the scan, so k chained steps consume exactly the
            # same per-step keys as k separate dispatches (bit-identical
            # training regardless of steps_per_dispatch)
            st, metrics = step_fn(st, batch, rng)
            return st, metrics

        state, metrics = jax.lax.scan(body, state, jnp.arange(k))
        return state, jax.tree_util.tree_map(lambda m: m[-1], metrics)

    return chained


def init_fcmae(model: "fcmae_lib.FCMAE", seed: int, sample_batch: Mapping[str, jax.Array]):
    """Initialize FCMAE params from a sample batch (cropped to img_size)."""

    def crop_center(v):
        if v.ndim == 4 and v.shape[1] > model.img_size:
            return v[:, : model.img_size, : model.img_size]
        return v

    sample = {k: crop_center(v) for k, v in sample_batch.items()}
    sample = fcmae_lib.zero_nan_inputs(sample)
    variables = jax.jit(model.init, static_argnames=())(
        {"params": jax.random.PRNGKey(seed), "mask": jax.random.PRNGKey(seed + 1)}, sample
    )
    return variables["params"]
