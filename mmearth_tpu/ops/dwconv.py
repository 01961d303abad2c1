"""Depthwise 7x7 convolution with a Pallas weight-gradient kernel.

XLA handles the forward and the data gradient of the depthwise conv well
(both are plain convolutions), but lowers the weight gradient dW[t, c] =
sum_sites x_shifted_t[site, c] * dy[site, c] into dozens of strided
reduce passes — measured 1.4 ms per stage-2 atto block (8.6 ms/step over the
six blocks) on v5e.  The kernel here reads x and dy once per sample, keeps a
zero-padded copy of x in VMEM, and accumulates all 49 tap reductions in a
(49, lanes) scratch across the batch grid.

Lane packing: with C < 128 channels the lane dim would pad to 128 (3.2x waste
at atto stage 0), so G = floor(128 / C) samples are folded into the lane dim
(the taps shift spatial axes only, never lanes) and the host sums the G
groups at the end.

Reference hot loop: models/convnextv2_sparse.py:47-56 (MinkowskiDepthwise).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

KH = KW = 7
PAD = 3


def _dw_grad_kernel(x_ref, dy_ref, out_ref, xpad, acc):
    """Grid over sample-groups.  x_ref/dy_ref: (1, H, W, L) blocks; xpad:
    (H+6, W+6, L) f32 scratch (borders stay zero); acc: (49, L) f32."""
    i = pl.program_id(0)
    n = pl.num_programs(0)
    h, w = dy_ref.shape[1], dy_ref.shape[2]

    @pl.when(i == 0)
    def _():
        acc[...] = jnp.zeros_like(acc)
        xpad[...] = jnp.zeros_like(xpad)

    xpad[PAD:PAD + h, PAD:PAD + w, :] = x_ref[0].astype(jnp.float32)
    dy = dy_ref[0].astype(jnp.float32)
    for t in range(KH * KW):
        dy_off, dx_off = t // KW, t % KW
        prod = xpad[dy_off:dy_off + h, dx_off:dx_off + w, :] * dy
        acc[t, :] += jnp.sum(prod, axis=(0, 1))

    @pl.when(i == n - 1)
    def _():
        out_ref[...] = acc[...]


def _pack_group(a: jax.Array, g: int) -> jax.Array:
    """(N, H, W, C) -> (N/G, H, W, G*C): fold G samples into the lane dim."""
    if g == 1:
        return a
    n, h, w, c = a.shape
    return a.reshape(n // g, g, h, w, c).transpose(0, 2, 3, 1, 4).reshape(n // g, h, w, g * c)


def dw_weight_grad(x: jax.Array, dy: jax.Array, interpret: bool = False) -> jax.Array:
    """dW (7, 7, 1, C) of a SAME depthwise 7x7 conv, one pass over x and dy."""
    n, h, w, c = x.shape
    g = max(1, 128 // c)
    while n % g:
        g -= 1
    lanes = g * c
    xg = _pack_group(x, g)
    dyg = _pack_group(dy, g)

    acc = pl.pallas_call(
        _dw_grad_kernel,
        grid=(n // g,),
        in_specs=[
            pl.BlockSpec((1, h, w, lanes), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h, w, lanes), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((KH * KW, lanes), lambda i: (0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((KH * KW, lanes), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((h + 2 * PAD, w + 2 * PAD, lanes), jnp.float32),
            pltpu.VMEM((KH * KW, lanes), jnp.float32),
        ],
        interpret=interpret,
    )(xg, dyg)

    dw = acc.reshape(KH * KW, g, c).sum(axis=1) if g > 1 else acc
    return dw.reshape(KH, KW, 1, c)


# ---------------------------------------------------------------------------
# full custom-vjp depthwise conv op
# ---------------------------------------------------------------------------
def _dw_forward(x, w, b):
    c = x.shape[-1]
    y = jax.lax.conv_general_dilated(
        x, w.astype(x.dtype), window_strides=(1, 1), padding="SAME",
        feature_group_count=c, dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return y + b.astype(y.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def dwconv7x7(x, w, b, interpret: bool = False):
    """SAME depthwise 7x7 conv, NHWC; w (7,7,1,C), b (C,).  Forward and dx are
    XLA convolutions; dW is the Pallas one-pass kernel."""
    return _dw_forward(x, w, b)


def _dw_fwd(x, w, b, interpret):
    return _dw_forward(x, w, b), (x, w)


def _dw_bwd(interpret, res, dy):
    x, w = res
    c = x.shape[-1]
    # dx: correlation with the spatially flipped kernel (same grouping)
    dx = jax.lax.conv_general_dilated(
        dy, w[::-1, ::-1].astype(dy.dtype), window_strides=(1, 1), padding="SAME",
        feature_group_count=c, dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ).astype(x.dtype)
    dw = dw_weight_grad(x, dy, interpret=interpret).astype(w.dtype)
    db = jnp.sum(dy.astype(jnp.float32), axis=(0, 1, 2)).astype(w.dtype)
    return dx, dw, db


dwconv7x7.defvjp(_dw_fwd, _dw_bwd)


def dw_weight_grad_reference(x, dy):
    """jnp reference of the weight gradient (for tests)."""
    n, h, w, c = x.shape
    xp = jnp.pad(x.astype(jnp.float32), ((0, 0), (PAD, PAD), (PAD, PAD), (0, 0)))
    dyf = dy.astype(jnp.float32)
    taps = [
        jnp.sum(xp[:, i:i + h, j:j + w, :] * dyf, axis=(0, 1, 2))
        for i in range(KH) for j in range(KW)
    ]
    return jnp.stack(taps).reshape(KH, KW, 1, c)
