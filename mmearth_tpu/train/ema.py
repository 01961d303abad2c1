"""Model EMA (reference --model_ema machinery, main_finetune.py:96-101,
helpers.py auto_load_model EMA restore; never enabled in the published
recipes but part of the API surface)."""
from __future__ import annotations

import jax
import jax.numpy as jnp


def init_ema(params):
    return jax.tree_util.tree_map(lambda x: x.astype(jnp.float32), params)


def update_ema(ema, params, decay: float = 0.9999):
    return jax.tree_util.tree_map(
        lambda e, p: e * decay + p.astype(jnp.float32) * (1.0 - decay), ema, params
    )
