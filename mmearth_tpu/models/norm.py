"""Normalization layers for NHWC ConvNeXtV2.

Numerics match the reference exactly:
  * ``LayerNorm`` — torch ``F.layer_norm`` over the channel axis, eps 1e-6
    (reference models/norm_layers.py:7-31; the channels_first branch there is
    the same math on NCHW — we are NHWC-only so one variant suffices).
  * ``GRN`` — dense Global Response Normalization: per-sample L2 over the
    spatial axes, eps 1e-4 (reference models/norm_layers.py:33-44).
  * ``MaskedGRN`` — the MinkowskiGRN semantics: the L2 statistic runs over
    *all active (unmasked) sites in the batch* with eps 1e-6 (reference
    models/sparse_norm_layers.py:16-33, norm over dim=0 of the sparse feature
    matrix).  This is the sparse-encoder-equivalent used during pretraining.

All statistics are computed in float32 regardless of the compute dtype.
"""
from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn


def _safe_l2(sum_sq: jnp.ndarray) -> jnp.ndarray:
    """sqrt with a defined (zero) gradient at sum_sq == 0.

    The GRN statistic is an L2 norm; when an entire channel's activations are
    exactly zero (a dead channel — gelu underflows to 0 once pre-activations
    drop below ~-15, observed in practice during tiny-batch overfits), the
    derivative of sqrt at 0 is +inf and one backward pass NaNs every upstream
    parameter.  torch has the same hazard (``torch.norm`` backward at 0) and
    the reference would ``sys.exit(1)`` on the resulting non-finite loss
    (engine_pretrain.py:83-85); we instead take the standard subgradient 0 via
    the double-``where`` trick — the forward value is bit-identical.
    """
    safe = jnp.where(sum_sq > 0, sum_sq, 1.0)
    return jnp.where(sum_sq > 0, jnp.sqrt(safe), 0.0)


class LayerNorm(nn.Module):
    """LayerNorm over the trailing (channel) axis, biased variance, eps 1e-6."""

    dim: int
    eps: float = 1e-6
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        scale = self.param("scale", nn.initializers.ones, (self.dim,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (self.dim,), jnp.float32)
        xf = x.astype(jnp.float32)
        mean = jnp.mean(xf, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
        y = (xf - mean) / jnp.sqrt(var + self.eps)
        y = y * scale + bias
        return y.astype(self.dtype)


class GRN(nn.Module):
    """Dense GRN: per-sample spatial L2 statistic (NHWC), eps 1e-4."""

    dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        gamma = self.param("gamma", nn.initializers.zeros, (self.dim,), jnp.float32)
        beta = self.param("beta", nn.initializers.zeros, (self.dim,), jnp.float32)
        xf = x.astype(jnp.float32)
        gx = _safe_l2(jnp.sum(jnp.square(xf), axis=(1, 2), keepdims=True))  # (N,1,1,C)
        nx = gx / (jnp.mean(gx, axis=-1, keepdims=True) + 1e-4)
        y = gamma * (xf * nx) + beta + xf
        return y.astype(self.dtype)


class MaskedGRN(nn.Module):
    """Sparse-equivalent GRN: batch L2 over unmasked sites, eps 1e-6.

    ``keep`` is an (N,H,W,1) float mask with 1 at visible (active) sites.  The
    statistic Gx[c] = ||x[:, :, :, c] restricted to active sites||_2 matches
    MinkowskiGRN's ``torch.norm(x.F, p=2, dim=0)`` where x.F stacks the active
    sites of the batch.  Output values at masked sites are *not* zeroed here;
    the caller re-masks once at the end of each block.

    ``group``: the batch scope of the statistic.  0 = the whole (global)
    batch.  >0 = independent stats per consecutive group of ``group`` samples;
    set to the per-device batch to (a) reproduce the reference's DDP
    semantics, where each MinkowskiGRN sees only its GPU's batch
    (sparse_norm_layers.py:28-33 under DDP), and (b) keep the reduction local
    to each device under data sharding — no cross-chip all-reduce per block.
    """

    dim: int
    dtype: jnp.dtype = jnp.float32
    group: int = 0

    @nn.compact
    def __call__(self, x, keep):
        gamma = self.param("gamma", nn.initializers.zeros, (self.dim,), jnp.float32)
        beta = self.param("beta", nn.initializers.zeros, (self.dim,), jnp.float32)
        xf = x.astype(jnp.float32)
        masked = xf * keep.astype(jnp.float32)
        n = xf.shape[0]
        if self.group > 0 and n % self.group:
            # A mismatched batch (e.g. changed device count) would silently
            # change normalization semantics; fall back to global stats but
            # say so.  (Tiny init/trace batches hit this benignly, hence a
            # warning rather than an error.)
            import warnings

            warnings.warn(
                f"MaskedGRN: batch {n} is not divisible by group {self.group}; "
                "falling back to global-batch statistics for this call",
                stacklevel=2,
            )
        g = n if self.group <= 0 or n % self.group else min(self.group, n)
        xg = xf.reshape(n // g, g, *xf.shape[1:])
        mg = masked.reshape(n // g, g, *masked.shape[1:])
        # L2 over every axis of the group except the channel one (works for
        # (N,H,W,C) dense layouts and flattened (rows, C) gathered layouts)
        axes = tuple(range(1, mg.ndim - 1))
        gx = _safe_l2(jnp.sum(jnp.square(mg), axis=axes, keepdims=True))
        nx = gx / (jnp.mean(gx, axis=-1, keepdims=True) + 1e-6)
        y = gamma * (xg * nx) + beta + xg
        return y.reshape(xf.shape).astype(self.dtype)
