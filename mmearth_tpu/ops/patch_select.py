"""Pallas patch gather/scatter between a dense NHWC grid and visible rows.

The gathered sparse encoder (models/convnextv2.py) moves activations between
the dense (N, H, W, C) grid (depthwise conv) and the gathered (N, K, p*p, C)
visible-patch rows (all site-local ops) once per block.  Expressed as one-hot
selection matmuls that costs ~9 ms/step at atto/256 (4.2 ms of (N,K,L) dot
_generals + 4.6 ms of patch-major transposes).  These kernels do the same
selection as pure data movement: the per-sample dense grid is DMA'd through
VMEM (auto-pipelined by the BlockSpec grid) and patches are copied with
dynamically-indexed VMEM slices — no MXU/VPU math, bit-exact.

Measured result (negative; kept as a documented alternative, selected by
``gather_impl="pallas"``): at atto/256 on v5e the full train step runs 64.8
ms with these kernels vs 48.0 ms with the one-hot matmuls.  The ~19 sub-tile
(p, p, C) copies per sample per call run as masked vector moves whose
per-grid-step overhead dominates, while XLA fuses the selection matmuls into
neighboring ops and runs them on an otherwise-idle MXU.  Standalone (one
scatter+gather round trip fwd+bwd, stage-0 shapes) the two are equal (1.80 vs
1.95 ms); in-model fusion tips the balance to the matmuls.

Layout trick: the dense side is viewed as (N, H, grid, p, C) — a free reshape
splitting W into (patch column, within-patch column) — so patch selection
indexes an *untiled* axis; the tiled (sublane, lane) = (p, C) dims never see a
dynamic offset (Mosaic requires provable 8-alignment there, which fails for
p < 8).

The adjoints are each other: d(gather)/dx = scatter of the cotangent and
vice versa (each dense site receives at most one gathered row), wired up via
``jax.custom_vjp`` below.

Reference semantics: MinkowskiEngine sparse tensor gather/scatter around each
sparse conv (reference models/convnextv2_sparse.py:191-220); the mask keeps
exactly ``K = len_keep`` patches per sample (reference fcmae.py:61-77).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _use_pallas() -> bool:
    return jax.default_backend() == "tpu"


# ---------------------------------------------------------------------------
# kernels (grid over samples; ids are scalar-prefetched)
# ---------------------------------------------------------------------------
def _gather_kernel(ids_ref, x_ref, out_ref, *, p: int, grid: int):
    """x_ref: (1, H, grid, p, C) dense sample; out_ref: (1, K, p, p, C)."""
    n = pl.program_id(0)
    k = out_ref.shape[1]
    for j in range(k):
        pid = ids_ref[n, j]
        r = (pid // grid) * p
        cg = pid % grid
        out_ref[0, j] = x_ref[0, pl.ds(r, p), cg]


def _scatter_kernel(ids_ref, xg_ref, out_ref, *, p: int, grid: int):
    """xg_ref: (1, K, p, p, C) gathered; out_ref: (1, H, grid, p, C) dense,
    zero at patches not listed in ids."""
    n = pl.program_id(0)
    k = xg_ref.shape[1]
    out_ref[...] = jnp.zeros_like(out_ref)
    for j in range(k):
        pid = ids_ref[n, j]
        r = (pid // grid) * p
        cg = pid % grid
        out_ref[0, pl.ds(r, p), cg] = xg_ref[0, j]


def _gather_call(x, kept_ids, p: int, grid: int):
    n, h, w, c = x.shape
    k = kept_ids.shape[1]
    xv = x.reshape(n, h, grid, p, c)  # free view: W -> (patch col, in-patch col)
    return pl.pallas_call(
        functools.partial(_gather_kernel, p=p, grid=grid),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(n,),
            in_specs=[pl.BlockSpec((1, h, grid, p, c), lambda i, ids: (i, 0, 0, 0, 0))],
            out_specs=pl.BlockSpec((1, k, p, p, c), lambda i, ids: (i, 0, 0, 0, 0)),
        ),
        out_shape=jax.ShapeDtypeStruct((n, k, p, p, c), x.dtype),
    )(kept_ids, xv)


def _scatter_call(xg, kept_ids, p: int, grid: int, h: int):
    n, k = xg.shape[0], xg.shape[1]
    c = xg.shape[-1]
    xg = xg.reshape(n, k, p, p, c)
    out = pl.pallas_call(
        functools.partial(_scatter_kernel, p=p, grid=grid),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(n,),
            in_specs=[pl.BlockSpec((1, k, p, p, c), lambda i, ids: (i, 0, 0, 0, 0))],
            out_specs=pl.BlockSpec((1, h, grid, p, c), lambda i, ids: (i, 0, 0, 0, 0)),
        ),
        out_shape=jax.ShapeDtypeStruct((n, h, grid, p, c), xg.dtype),
    )(kept_ids, xg)
    return out.reshape(n, h, h, c)


# ---------------------------------------------------------------------------
# jnp fallback (CPU tests / non-TPU backends).  _to_patches/_from_patches are
# the canonical patch-major layout helpers — models/convnextv2.py imports
# them, so the one-hot and pallas paths can never disagree on the ordering.
# ---------------------------------------------------------------------------
def _to_patches(x, grid: int):
    n, h, w, c = x.shape
    p = h // grid
    x = x.reshape(n, grid, p, grid, p, c).transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(n, grid * grid, p * p, c)


def _from_patches(xp, grid: int, h: int):
    n, l, pp, c = xp.shape
    p = h // grid
    x = xp.reshape(n, grid, grid, p, p, c).transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(n, h, h, c)


def _gather_jnp(x, kept_ids, p: int, grid: int):
    xp = _to_patches(x, grid)
    idx = kept_ids[:, :, None, None]
    out = jnp.take_along_axis(xp, idx, axis=1)
    n, k = kept_ids.shape
    return out.reshape(n, k, p, p, x.shape[-1])


def _scatter_jnp(xg, kept_ids, p: int, grid: int, h: int):
    n, k = xg.shape[0], xg.shape[1]
    c = xg.shape[-1]
    l = grid * grid
    flat = xg.reshape(n, k, p * p * c)
    dense = jnp.zeros((n, l, p * p * c), xg.dtype)
    dense = jax.vmap(lambda d, i, v: d.at[i].set(v))(dense, kept_ids, flat)
    return _from_patches(dense.reshape(n, l, p * p, c), grid, h)


# ---------------------------------------------------------------------------
# public API with custom VJPs (gather <-> scatter are exact adjoints)
# ---------------------------------------------------------------------------
@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def gather_patches(x, kept_ids, p: int, grid: int):
    """Dense (N, H, W, C) -> (N, K, p, p, C) rows of the ``kept_ids`` patches."""
    if _use_pallas():
        return _gather_call(x, kept_ids, p, grid)
    return _gather_jnp(x, kept_ids, p, grid)


def _gather_fwd(x, kept_ids, p, grid):
    return gather_patches(x, kept_ids, p, grid), (kept_ids, x.shape[1])


def _gather_bwd(p, grid, res, dy):
    kept_ids, h = res
    return scatter_patches(dy, kept_ids, p, grid, h), None


gather_patches.defvjp(_gather_fwd, _gather_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def scatter_patches(xg, kept_ids, p: int, grid: int, h: int):
    """(N, K, p, p, C) rows -> dense (N, H, W, C), zeros at missing patches."""
    if _use_pallas():
        return _scatter_call(xg, kept_ids, p, grid, h)
    return _scatter_jnp(xg, kept_ids, p, grid, h)


def _scatter_fwd(xg, kept_ids, p, grid, h):
    return scatter_patches(xg, kept_ids, p, grid, h), kept_ids


def _scatter_bwd(p, grid, h, kept_ids, dy):
    return gather_patches(dy, kept_ids, p, grid), None


scatter_patches.defvjp(_scatter_fwd, _scatter_bwd)
