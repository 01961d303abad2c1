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


def cosine_scheduler_array(
    base_value: float,
    final_value: float,
    epochs: int,
    niter_per_ep: int,
    warmup_epochs: int = 0,
    start_warmup_value: float = 0.0,
    warmup_steps: int = -1,
):
    """Precomputed per-iteration schedule array (the reference's second,
    array-based scheduler, helpers.py:613-644): linear warmup then half-cosine
    from base to final value; len == epochs * niter_per_ep."""
    import numpy as np

    warmup_iters = warmup_steps if warmup_steps > 0 else warmup_epochs * niter_per_ep
    warmup = np.linspace(start_warmup_value, base_value, warmup_iters) if warmup_iters > 0 else np.array([])
    iters = np.arange(epochs * niter_per_ep - warmup_iters)
    decay = final_value + 0.5 * (base_value - final_value) * (
        1.0 + np.cos(np.pi * iters / max(len(iters), 1))
    )
    schedule = np.concatenate([warmup, decay])
    assert len(schedule) == epochs * niter_per_ep
    return schedule
