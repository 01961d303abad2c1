"""Finetuning criteria (reference main_finetune.py:40-57, custom_loss.py:33-63).

  m-eurosat / m-so2sat / m-brick-kiln: label-smoothing cross-entropy (timm's
    LabelSmoothingCrossEntropy: (1-s)*nll + s*mean(-logp)).
  m-bigearthnet: label-smoothing binary cross-entropy (custom_loss.py:33-51).
  m-cashew-plant / m-SA-crop-type: plain CE over pixels, logits reshaped
    NHWC -> (N*H*W, C) (engine_finetune.py:104-119).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def smoothed_cross_entropy(logits: jax.Array, labels: jax.Array, smoothing: float = 0.0) -> jax.Array:
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    labels = labels.astype(jnp.int32)
    # one-hot select instead of take_along_axis (class-dim gathers serialize on TPU)
    onehot = labels[..., None] == jnp.arange(logits.shape[-1], dtype=jnp.int32)
    nll = -jnp.sum(jnp.where(onehot, logp, 0.0), axis=-1)
    smooth = -jnp.mean(logp, axis=-1)
    return jnp.mean((1.0 - smoothing) * nll + smoothing * smooth)


def smoothed_binary_cross_entropy(logits: jax.Array, targets: jax.Array, smoothing: float = 0.0) -> jax.Array:
    t = targets.astype(jnp.float32)
    if smoothing > 0:
        t = t * (1.0 - smoothing) + (1.0 - t) * smoothing
    x = logits.astype(jnp.float32)
    # numerically-stable BCEWithLogits
    loss = jnp.maximum(x, 0) - x * t + jnp.log1p(jnp.exp(-jnp.abs(x)))
    return jnp.mean(loss)


def segmentation_cross_entropy(logits: jax.Array, labels: jax.Array) -> jax.Array:
    """logits: (N, H, W, C); labels: (N, H, W) or (N, 1, H, W) int."""
    labels = labels.reshape(logits.shape[0], logits.shape[1], logits.shape[2])
    return smoothed_cross_entropy(
        logits.reshape(-1, logits.shape[-1]), labels.reshape(-1), smoothing=0.0
    )


def dice_loss(logits: jax.Array, target: jax.Array, num_classes: int) -> jax.Array:
    """1 - macro Dice over hard (argmax) predictions — the reference's
    ``DiceLoss`` (custom_loss.py:54-63: softmax -> argmax -> torchmetrics
    ``Dice(average="macro")``).  Unused by the reference mains, ported for
    surface parity.

    Like the reference, the argmax makes this non-differentiable (zero
    gradient); it is an eval-style criterion, not a training loss.  The
    softmax is dropped (argmax-invariant).  Per class c over the flattened
    predictions: dice_c = 2 TP_c / (2 TP_c + FP_c + FN_c); the macro mean
    runs over classes with nonzero denominator (classes absent from both
    predictions and targets are excluded, torchmetrics' macro reduction)."""
    pred = jnp.argmax(logits.astype(jnp.float32), axis=-1).reshape(-1)
    t = target.reshape(-1).astype(jnp.int32)
    classes = jnp.arange(num_classes, dtype=jnp.int32)
    p1 = pred[:, None].astype(jnp.int32) == classes[None, :]
    t1 = t[:, None] == classes[None, :]
    tp = jnp.sum(p1 & t1, axis=0).astype(jnp.float32)
    fp = jnp.sum(p1 & ~t1, axis=0).astype(jnp.float32)
    fn = jnp.sum(~p1 & t1, axis=0).astype(jnp.float32)
    denom = 2.0 * tp + fp + fn
    support = denom > 0
    score = jnp.where(support, 2.0 * tp / jnp.where(support, denom, 1.0), 0.0)
    dice = jnp.sum(score) / jnp.maximum(jnp.sum(support.astype(jnp.float32)), 1.0)
    return 1.0 - dice


def criterion_fn(dataset: str, smoothing: float):
    """Per-dataset criterion (main_finetune.py:40-57)."""
    if dataset == "m-bigearthnet":
        return lambda logits, target: smoothed_binary_cross_entropy(logits, target, smoothing)
    if dataset in ("m-cashew-plant", "m-SA-crop-type"):
        return segmentation_cross_entropy
    return lambda logits, target: smoothed_cross_entropy(logits, target, smoothing)
