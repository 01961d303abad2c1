"""LR schedule: per-iteration linear warmup + half-cosine decay.

Exactly the reference's ``adjust_learning_rate`` (helpers.py:647-665), which
is called every iteration with a fractional epoch = epoch + step/niter
(engine_pretrain.py:53-56) — i.e. a continuous per-step schedule.
"""
from __future__ import annotations

import jax.numpy as jnp


def warmup_cosine(
    base_lr: float,
    min_lr: float,
    epochs: int,
    warmup_epochs: int,
    steps_per_epoch: int,
):
    """Returns an optax-style ``schedule(step) -> lr``.  ``step`` counts
    optimizer updates; with gradient accumulation pass
    steps_per_epoch = updates per epoch."""

    def schedule(step):
        e = step / steps_per_epoch  # fractional epoch
        warm = base_lr * e / max(warmup_epochs, 1e-8)
        progress = (e - warmup_epochs) / max(epochs - warmup_epochs, 1e-8)
        cos = min_lr + (base_lr - min_lr) * 0.5 * (1.0 + jnp.cos(jnp.pi * progress))
        return jnp.where(e < warmup_epochs, warm, cos)

    return schedule
