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


def criterion_fn(dataset: str, smoothing: float):
    """Per-dataset criterion (main_finetune.py:40-57)."""
    if dataset == "m-bigearthnet":
        return lambda logits, target: smoothed_binary_cross_entropy(logits, target, smoothing)
    if dataset in ("m-cashew-plant", "m-SA-crop-type"):
        return segmentation_cross_entropy
    return lambda logits, target: smoothed_cross_entropy(logits, target, smoothing)
