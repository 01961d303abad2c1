"""Pallas TPU kernel: fused masked ConvNeXtV2-block MLP.

Fuses everything in the block after the depthwise conv —
LN -> pw Linear 4x -> GELU -> masked GRN -> pw Linear -> mask -> residual —
into one two-phase kernel over flattened sites (reference block math:
models/convnextv2.py:42-55 with MinkowskiGRN statistics over unmasked sites,
models/sparse_norm_layers.py:24-33).

Why: the XLA lowering makes ~8 HBM passes over the (N,H,W,4C) activations per
block (measured 3.3 ms fwd for one stage-0 atto block at batch 256 vs a
0.12 ms single-pass IO floor).  Here each phase reads the (M, C) input once
and keeps the 4C intermediates in VMEM.  The masked GRN statistic is
batch-global, so the kernel runs two grid phases: phase 0 accumulates the
per-channel sum of squares over visible sites into VMEM scratch; phase 1
recomputes the intermediates (cheaper than spilling them to HBM) and applies
GRN + pw2 + mask + residual.

The backward pass is a second two-phase Pallas kernel (recompute-based) with
all weight-gradient accumulations in VMEM scratch; see `_bwd_kernel`.

Numerics: all arithmetic in f32 (inputs upcast from bf16; matmuls feed the
MXU as bf16 with f32 accumulation, matching the bf16 XLA path).
"""
from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

GRN_EPS = 1e-6  # sparse GRN eps (sparse_norm_layers.py:29)
LN_EPS = 1e-6


def _erf(x):
    """erf via the Abramowitz–Stegun 7.1.26 polynomial (max abs error 1.5e-7,
    far below bf16 resolution).  Pallas TPU has no erf/erfc primitive."""
    sign = jnp.sign(x)
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + 0.3275911 * ax)
    poly = t * (0.254829592 + t * (-0.284496736 + t * (1.421413741 + t * (-1.453152027 + t * 1.061405429))))
    return sign * (1.0 - poly * jnp.exp(-ax * ax))


def _gelu(x):
    # exact-erf gelu (reference uses torch.nn.GELU() default, i.e. erf form)
    return 0.5 * x * (1.0 + _erf(x * (1.0 / math.sqrt(2.0))))


def _gelu_grad(x):
    # d/dx [x * Phi(x)] = Phi(x) + x * phi(x)
    phi = jnp.exp(-0.5 * x * x) * (1.0 / math.sqrt(2.0 * math.pi))
    cdf = 0.5 * (1.0 + _erf(x * (1.0 / math.sqrt(2.0))))
    return cdf + x * phi


def _ln_forward(t, scale, bias):
    mu = jnp.mean(t, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(t - mu), axis=-1, keepdims=True)
    r = jax.lax.rsqrt(var + LN_EPS)
    uhat = (t - mu) * r
    return uhat * scale + bias, uhat, r


def _mm(a, b, cd=jnp.bfloat16):
    """Matmul with f32 accumulation; ``cd`` is the MXU input dtype — bf16 for
    bf16 activations (matching the bf16 XLA path), f32 when the caller runs
    full precision."""
    return jax.lax.dot_general(
        a.astype(cd), b.astype(cd),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _mm_dtype(ref_dtype):
    return jnp.bfloat16 if ref_dtype == jnp.bfloat16 else jnp.float32


# ---------------------------------------------------------------------------
# forward kernel
# ---------------------------------------------------------------------------
def _fwd_kernel(t_ref, x_ref, keep_ref, lns_ref, lnb_ref, w1_ref, b1_ref,
                g_ref, bt_ref, w2_ref, b2_ref,
                y_ref, gx_ref, acc_ref):
    phase = pl.program_id(0)
    i = pl.program_id(1)
    n_tiles = pl.num_programs(1)

    cd = _mm_dtype(t_ref.dtype)
    t = t_ref[...].astype(jnp.float32)
    keep = keep_ref[...].astype(jnp.float32)
    u, _, _ = _ln_forward(t, lns_ref[...].astype(jnp.float32), lnb_ref[...].astype(jnp.float32))
    v = _mm(u, w1_ref[...], cd) + b1_ref[...].astype(jnp.float32)
    g = _gelu(v)

    @pl.when(jnp.logical_and(phase == 0, i == 0))
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    @pl.when(phase == 0)
    def _():
        gk = g * keep
        acc_ref[...] += jnp.sum(gk * gk, axis=0, keepdims=True)

    @pl.when(phase == 1)
    def _():
        gx = jnp.sqrt(acc_ref[...])  # (1, 4C)
        nx = gx / (jnp.mean(gx, axis=-1, keepdims=True) + GRN_EPS)
        gamma = g_ref[...].astype(jnp.float32)
        beta = bt_ref[...].astype(jnp.float32)
        h = gamma * (g * nx) + beta + g
        o = _mm(h, w2_ref[...], cd) + b2_ref[...].astype(jnp.float32)
        y = x_ref[...].astype(jnp.float32) + o * keep
        y_ref[...] = y.astype(y_ref.dtype)

        @pl.when(i == n_tiles - 1)
        def _():
            gx_ref[...] = gx


# ---------------------------------------------------------------------------
# backward kernel
# ---------------------------------------------------------------------------
def _bwd_kernel(t_ref, keep_ref, dy_ref, gx_ref,
                lns_ref, lnb_ref, w1_ref, b1_ref, g_ref, bt_ref, w2_ref,
                dt_ref,
                dlns_out, dlnb_out, dw1_out, db1_out, dg_out, dbt_out, dw2_out, db2_out,
                dnx_acc, dw1_acc, db1_acc, dw2_acc, db2_acc,
                dg_acc, dbt_acc, dlns_acc, dlnb_acc, dgxg_sc):
    phase = pl.program_id(0)
    i = pl.program_id(1)
    n_tiles = pl.num_programs(1)

    cd = _mm_dtype(t_ref.dtype)
    t = t_ref[...].astype(jnp.float32)
    keep = keep_ref[...].astype(jnp.float32)
    dy = dy_ref[...].astype(jnp.float32)
    gamma = g_ref[...].astype(jnp.float32)
    lns = lns_ref[...].astype(jnp.float32)

    u, uhat, r = _ln_forward(t, lns, lnb_ref[...].astype(jnp.float32))
    v = _mm(u, w1_ref[...], cd) + b1_ref[...].astype(jnp.float32)
    g = _gelu(v)

    gx = gx_ref[...]  # (1, 4C)
    mean_gx = jnp.mean(gx, axis=-1, keepdims=True)
    denom = mean_gx + GRN_EPS
    nx = gx / denom

    do = dy * keep
    dh = _mm(do, w2_ref[...].T, cd)  # (TM, 4C)
    h = gamma * (g * nx) + bt_ref[...].astype(jnp.float32) + g

    @pl.when(jnp.logical_and(phase == 0, i == 0))
    def _():
        dnx_acc[...] = jnp.zeros_like(dnx_acc)
        dw1_acc[...] = jnp.zeros_like(dw1_acc)
        db1_acc[...] = jnp.zeros_like(db1_acc)
        dw2_acc[...] = jnp.zeros_like(dw2_acc)
        db2_acc[...] = jnp.zeros_like(db2_acc)
        dg_acc[...] = jnp.zeros_like(dg_acc)
        dbt_acc[...] = jnp.zeros_like(dbt_acc)
        dlns_acc[...] = jnp.zeros_like(dlns_acc)
        dlnb_acc[...] = jnp.zeros_like(dlnb_acc)

    @pl.when(phase == 0)
    def _():
        # global reductions that must complete before dgx is known
        dnx_acc[...] += jnp.sum(dh * gamma * g, axis=0, keepdims=True)
        dw2_acc[...] += _mm(h.T, do, cd)
        db2_acc[...] += jnp.sum(do, axis=0, keepdims=True)
        dg_acc[...] += jnp.sum(dh * (g * nx), axis=0, keepdims=True)
        dbt_acc[...] += jnp.sum(dh, axis=0, keepdims=True)

    @pl.when(jnp.logical_and(phase == 1, i == 0))
    def _():
        # dgx from the accumulated dnx: nx_c = gx_c / (mean_k gx_k + eps)
        dnx = dnx_acc[...]
        c4 = dnx.shape[-1]
        dgx = dnx / denom - jnp.sum(dnx * gx, axis=-1, keepdims=True) / (denom * denom) / c4
        # store dgx/gx (safe where gx==0: g*keep==0 there anyway)
        dgxg_sc[...] = jnp.where(gx > 0, dgx / gx, 0.0)

    @pl.when(phase == 1)
    def _():
        dgg = dgxg_sc[...]
        dg_total = dh * (gamma * nx + 1.0) + (g * keep * keep) * dgg
        dv = dg_total * _gelu_grad(v)
        dw1_acc[...] += _mm(u.T, dv, cd)
        db1_acc[...] += jnp.sum(dv, axis=0, keepdims=True)
        du = _mm(dv, w1_ref[...].T, cd)
        dlns_acc[...] += jnp.sum(du * uhat, axis=0, keepdims=True)
        dlnb_acc[...] += jnp.sum(du, axis=0, keepdims=True)
        # LN backward (biased variance)
        da = du * lns
        mean_da = jnp.mean(da, axis=-1, keepdims=True)
        mean_dau = jnp.mean(da * uhat, axis=-1, keepdims=True)
        dt = r * (da - mean_da - uhat * mean_dau)
        dt_ref[...] = dt.astype(dt_ref.dtype)

        @pl.when(i == n_tiles - 1)
        def _():
            dlns_out[...] = dlns_acc[...]
            dlnb_out[...] = dlnb_acc[...]
            dw1_out[...] = dw1_acc[...]
            db1_out[...] = db1_acc[...]
            dg_out[...] = dg_acc[...]
            dbt_out[...] = dbt_acc[...]
            dw2_out[...] = dw2_acc[...]
            db2_out[...] = db2_acc[...]


# ---------------------------------------------------------------------------
# host-side wrappers
# ---------------------------------------------------------------------------
def _tile_rows(c4: int, bwd: bool = False) -> int:
    # The backward kernel holds ~8 (TM, 4C) f32 live values plus (C, 4C)
    # weight-grad scratches; keep the scoped VMEM footprint under the 16MB cap
    # (c4=1280 with TM=256 measured 78KB over the limit).
    if bwd:
        if c4 >= 1280:
            return 128
        return 256 if c4 > 512 else 512
    return 512 if c4 > 512 else 2048


def _pad_rows(x, tm):
    m = x.shape[0]
    pad = (-m) % tm
    if pad:
        x = jnp.pad(x, ((0, pad),) + ((0, 0),) * (x.ndim - 1))
    return x


@functools.partial(jax.custom_vjp, nondiff_argnums=(11,))
def fused_block_mlp(t, x_res, keep, ln_scale, ln_bias, w1, b1, gamma, beta, w2, b2,
                    interpret: bool = False):
    """y = x_res + keep * (GRN_masked(gelu(LN(t) @ w1 + b1)) @ w2 + b2).

    t, x_res: (M, C); keep: (M, 1) 1=visible; returns (M, C) in t.dtype.
    """
    y, _ = _fwd(t, x_res, keep, ln_scale, ln_bias, w1, b1, gamma, beta, w2, b2, interpret)
    return y


def _fwd(t, x_res, keep, ln_scale, ln_bias, w1, b1, gamma, beta, w2, b2, interpret):
    m, c = t.shape
    c4 = w1.shape[1]
    tm = _tile_rows(c4)
    tp, xp, kp = _pad_rows(t, tm), _pad_rows(x_res, tm), _pad_rows(keep, tm)
    n_tiles = tp.shape[0] // tm

    row_spec = lambda: pl.BlockSpec((tm, c), lambda p, i: (i, 0), memory_space=pltpu.VMEM)
    keep_spec = pl.BlockSpec((tm, 1), lambda p, i: (i, 0), memory_space=pltpu.VMEM)
    full = lambda shape: pl.BlockSpec(shape, lambda p, i: tuple(0 for _ in shape), memory_space=pltpu.VMEM)
    vec = lambda n: full((1, n))

    y, gx = pl.pallas_call(
        _fwd_kernel,
        grid=(2, n_tiles),
        in_specs=[
            row_spec(), row_spec(), keep_spec,
            vec(c), vec(c), full((c, c4)), vec(c4),
            vec(c4), vec(c4), full((c4, c)), vec(c),
        ],
        out_specs=[
            pl.BlockSpec((tm, c), lambda p, i: (i, 0), memory_space=pltpu.VMEM),
            full((1, c4)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct(tp.shape, t.dtype),
            jax.ShapeDtypeStruct((1, c4), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((1, c4), jnp.float32)],
        interpret=interpret,
    )(tp, xp, kp, ln_scale.reshape(1, c), ln_bias.reshape(1, c), w1,
      b1.reshape(1, c4), gamma.reshape(1, c4), beta.reshape(1, c4), w2, b2.reshape(1, c))
    return y[:m], gx


def _fwd_rule(t, x_res, keep, ln_scale, ln_bias, w1, b1, gamma, beta, w2, b2, interpret):
    y, gx = _fwd(t, x_res, keep, ln_scale, ln_bias, w1, b1, gamma, beta, w2, b2, interpret)
    return y, (t, keep, gx, ln_scale, ln_bias, w1, b1, gamma, beta, w2, b2)


def _bwd_rule(interpret, res, dy):
    t, keep, gx, ln_scale, ln_bias, w1, b1, gamma, beta, w2, b2 = res
    m, c = t.shape
    c4 = w1.shape[1]
    tm = _tile_rows(c4, bwd=True)
    tp, kp, dyp = _pad_rows(t, tm), _pad_rows(keep, tm), _pad_rows(dy, tm)
    n_tiles = tp.shape[0] // tm

    row_spec = lambda cc: pl.BlockSpec((tm, cc), lambda p, i: (i, 0), memory_space=pltpu.VMEM)
    full = lambda shape: pl.BlockSpec(shape, lambda p, i: tuple(0 for _ in shape), memory_space=pltpu.VMEM)

    outs = pl.pallas_call(
        _bwd_kernel,
        grid=(2, n_tiles),
        in_specs=[
            row_spec(c), pl.BlockSpec((tm, 1), lambda p, i: (i, 0), memory_space=pltpu.VMEM),
            row_spec(c), full((1, c4)),
            full((1, c)), full((1, c)), full((c, c4)), full((1, c4)), full((1, c4)), full((1, c4)),
            full((c4, c)),
        ],
        out_specs=[
            pl.BlockSpec((tm, c), lambda p, i: (i, 0), memory_space=pltpu.VMEM),
            full((1, c)), full((1, c)), full((c, c4)), full((1, c4)),
            full((1, c4)), full((1, c4)), full((c4, c)), full((1, c)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct(tp.shape, t.dtype),
            jax.ShapeDtypeStruct((1, c), jnp.float32),
            jax.ShapeDtypeStruct((1, c), jnp.float32),
            jax.ShapeDtypeStruct((c, c4), jnp.float32),
            jax.ShapeDtypeStruct((1, c4), jnp.float32),
            jax.ShapeDtypeStruct((1, c4), jnp.float32),
            jax.ShapeDtypeStruct((1, c4), jnp.float32),
            jax.ShapeDtypeStruct((c4, c), jnp.float32),
            jax.ShapeDtypeStruct((1, c), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((1, c4), jnp.float32),   # dnx_acc
            pltpu.VMEM((c, c4), jnp.float32),   # dw1_acc
            pltpu.VMEM((1, c4), jnp.float32),   # db1_acc
            pltpu.VMEM((c4, c), jnp.float32),   # dw2_acc
            pltpu.VMEM((1, c), jnp.float32),    # db2_acc
            pltpu.VMEM((1, c4), jnp.float32),   # dgamma_acc
            pltpu.VMEM((1, c4), jnp.float32),   # dbeta_acc
            pltpu.VMEM((1, c), jnp.float32),    # dlns_acc
            pltpu.VMEM((1, c), jnp.float32),    # dlnb_acc
            pltpu.VMEM((1, c4), jnp.float32),   # dgx/gx
        ],
        interpret=interpret,
    )(tp, kp, dyp, gx, ln_scale.reshape(1, c), ln_bias.reshape(1, c), w1,
      b1.reshape(1, c4), gamma.reshape(1, c4), beta.reshape(1, c4), w2)

    dt, dlns, dlnb, dw1, db1, dgamma, dbeta, dw2, db2 = outs
    cast = lambda a, like: a.reshape(like.shape).astype(like.dtype)
    return (
        dt[:m], dy, jnp.zeros_like(keep),
        cast(dlns, ln_scale), cast(dlnb, ln_bias),
        cast(dw1, w1), cast(db1, b1),
        cast(dgamma, gamma), cast(dbeta, beta),
        cast(dw2, w2), cast(db2, b2),
    )


fused_block_mlp.defvjp(_fwd_rule, _bwd_rule)


# ---------------------------------------------------------------------------
# spill-g variant (gathered path: all rows visible, keep == 1)
#
# The recompute-based kernel above loses to XLA because it evaluates the
# erf-GELU twice in the forward (phase 1 recomputes LN+matmul+gelu) and twice
# more in the backward.  This variant *spills* g = gelu(v) to HBM between the
# two phases instead: each transcendental is evaluated exactly once per
# direction (fwd: gelu; bwd: gelu-grad), at the cost of one extra (M, 4C)
# bf16 write+read per direction — 0.12 ms of HBM traffic per stage-0 block
# vs ~1 ms of recompute.  ROADMAP.md round-2 named this the one untried
# lever.
#
# MEASURED RESULT (negative; kept as the documented end of this avenue,
# selected by ``--block_impl spillg``): full-step in-process A/B at atto/256
# on v5e (scripts/ab_impl.py auto spillg): 58.92 ms/step vs 48.28 ms for the XLA
# lowering (22% slower), loss agreement 1.1e-5 relative.  The recompute
# savings are real but are outweighed by (a) 4 pallas_call dispatches per
# block vs XLA's fused schedule, (b) C=40/80 lane padding — every (TM, C)
# elementwise op uses 40 of 128 lanes, where XLA is free to pick packed
# layouts, and (c) no overlap between the kernel's MXU matmuls and
# neighboring XLA ops.  Seventh alternative measured losing to XLA on this
# step (ROADMAP.md); the perf bound now rests on the roofline
# (ROOFLINE.json), not on untried ideas.
# ---------------------------------------------------------------------------
def _sg_fwd_a_kernel(t_ref, lns_ref, lnb_ref, w1_ref, b1_ref,
                     g_ref, gx_ref, acc_ref, *, m_valid: int):
    """Phase A: LN -> pw1 -> gelu; writes g and accumulates the GRN sumsq
    (of the *stored* g, matching the XLA path where g lives in bf16).
    Rows past ``m_valid`` are padding: their g is zeroed here so they
    contribute nothing to the statistic nor to any backward reduction."""
    i = pl.program_id(0)
    n_tiles = pl.num_programs(0)
    tm = t_ref.shape[0]
    cd = _mm_dtype(t_ref.dtype)
    t = t_ref[...].astype(jnp.float32)
    u, _, _ = _ln_forward(t, lns_ref[...].astype(jnp.float32),
                          lnb_ref[...].astype(jnp.float32))
    v = _mm(u, w1_ref[...], cd) + b1_ref[...].astype(jnp.float32)
    rows = i * tm + jax.lax.broadcasted_iota(jnp.int32, (tm, 1), 0)
    valid = (rows < m_valid).astype(jnp.float32)
    g_ref[...] = (_gelu(v) * valid).astype(g_ref.dtype)

    @pl.when(i == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    g = g_ref[...].astype(jnp.float32)
    acc_ref[...] += jnp.sum(g * g, axis=0, keepdims=True)

    @pl.when(i == n_tiles - 1)
    def _():
        gx_ref[...] = jnp.sqrt(acc_ref[...])


def _sg_fwd_b_kernel(g_ref, x_ref, gx_ref, gm_ref, bt_ref, w2_ref, b2_ref,
                     y_ref):
    """Phase B: GRN apply -> pw2 -> residual."""
    cd = _mm_dtype(y_ref.dtype)
    g = g_ref[...].astype(jnp.float32)
    gx = gx_ref[...]
    nx = gx / (jnp.mean(gx, axis=-1, keepdims=True) + GRN_EPS)
    h = gm_ref[...].astype(jnp.float32) * (g * nx) + bt_ref[...].astype(jnp.float32) + g
    o = _mm(h, w2_ref[...], cd) + b2_ref[...].astype(jnp.float32)
    y_ref[...] = (x_ref[...].astype(jnp.float32) + o).astype(y_ref.dtype)


def _sg_bwd_c_kernel(dy_ref, g_ref, gx_ref, gm_ref, bt_ref, w2_ref,
                     dw2_out, db2_out, dg_out, dbt_out, dnx_out,
                     dw2_acc, db2_acc, dg_acc, dbt_acc, dnx_acc):
    """Backward phase C: global reductions that gate dgx — dw2/db2/dgamma/
    dbeta and dnx.  Reads dy and the spilled g only (h is recomputed
    elementwise from g)."""
    i = pl.program_id(0)
    n_tiles = pl.num_programs(0)
    cd = _mm_dtype(dy_ref.dtype)
    dy = dy_ref[...].astype(jnp.float32)
    g = g_ref[...].astype(jnp.float32)
    gx = gx_ref[...]
    nx = gx / (jnp.mean(gx, axis=-1, keepdims=True) + GRN_EPS)
    gamma = gm_ref[...].astype(jnp.float32)
    dh = _mm(dy, w2_ref[...].T, cd)
    h = gamma * (g * nx) + bt_ref[...].astype(jnp.float32) + g

    @pl.when(i == 0)
    def _():
        dw2_acc[...] = jnp.zeros_like(dw2_acc)
        db2_acc[...] = jnp.zeros_like(db2_acc)
        dg_acc[...] = jnp.zeros_like(dg_acc)
        dbt_acc[...] = jnp.zeros_like(dbt_acc)
        dnx_acc[...] = jnp.zeros_like(dnx_acc)

    dw2_acc[...] += _mm(h.T, dy, cd)
    db2_acc[...] += jnp.sum(dy, axis=0, keepdims=True)
    dg_acc[...] += jnp.sum(dh * (g * nx), axis=0, keepdims=True)
    dbt_acc[...] += jnp.sum(dh, axis=0, keepdims=True)
    dnx_acc[...] += jnp.sum(dh * gamma * g, axis=0, keepdims=True)

    @pl.when(i == n_tiles - 1)
    def _():
        dw2_out[...] = dw2_acc[...]
        db2_out[...] = db2_acc[...]
        dg_out[...] = dg_acc[...]
        dbt_out[...] = dbt_acc[...]
        dnx_out[...] = dnx_acc[...]


def _sg_bwd_d_kernel(t_ref, dy_ref, g_ref, gx_ref, dgxg_ref,
                     lns_ref, lnb_ref, w1_ref, b1_ref, gm_ref, w2_ref,
                     dt_ref, dw1_out, db1_out, dlns_out, dlnb_out,
                     dw1_acc, db1_acc, dlns_acc, dlnb_acc):
    """Backward phase D: dt and the pw1/LN gradients.  Recomputes u and v
    (one cheap MXU matmul) but NOT gelu — gelu-grad(v) is the only
    transcendental, evaluated once."""
    i = pl.program_id(0)
    n_tiles = pl.num_programs(0)
    cd = _mm_dtype(t_ref.dtype)
    t = t_ref[...].astype(jnp.float32)
    dy = dy_ref[...].astype(jnp.float32)
    g = g_ref[...].astype(jnp.float32)
    lns = lns_ref[...].astype(jnp.float32)
    gamma = gm_ref[...].astype(jnp.float32)
    gx = gx_ref[...]
    nx = gx / (jnp.mean(gx, axis=-1, keepdims=True) + GRN_EPS)

    u, uhat, r = _ln_forward(t, lns, lnb_ref[...].astype(jnp.float32))
    v = _mm(u, w1_ref[...], cd) + b1_ref[...].astype(jnp.float32)
    dh = _mm(dy, w2_ref[...].T, cd)
    dg_total = dh * (gamma * nx + 1.0) + g * dgxg_ref[...]
    dv = dg_total * _gelu_grad(v)

    @pl.when(i == 0)
    def _():
        dw1_acc[...] = jnp.zeros_like(dw1_acc)
        db1_acc[...] = jnp.zeros_like(db1_acc)
        dlns_acc[...] = jnp.zeros_like(dlns_acc)
        dlnb_acc[...] = jnp.zeros_like(dlnb_acc)

    dw1_acc[...] += _mm(u.T, dv, cd)
    db1_acc[...] += jnp.sum(dv, axis=0, keepdims=True)
    du = _mm(dv, w1_ref[...].T, cd)
    dlns_acc[...] += jnp.sum(du * uhat, axis=0, keepdims=True)
    dlnb_acc[...] += jnp.sum(du, axis=0, keepdims=True)
    da = du * lns
    mean_da = jnp.mean(da, axis=-1, keepdims=True)
    mean_dau = jnp.mean(da * uhat, axis=-1, keepdims=True)
    dt_ref[...] = (r * (da - mean_da - uhat * mean_dau)).astype(dt_ref.dtype)

    @pl.when(i == n_tiles - 1)
    def _():
        dw1_out[...] = dw1_acc[...]
        db1_out[...] = db1_acc[...]
        dlns_out[...] = dlns_acc[...]
        dlnb_out[...] = dlnb_acc[...]


def _sg_tile(c4: int) -> int:
    if c4 >= 1280:
        return 256
    return 512 if c4 > 512 else 1024


@functools.partial(jax.custom_vjp, nondiff_argnums=(10,))
def fused_block_mlp_spillg(t, x_res, ln_scale, ln_bias, w1, b1, gamma, beta,
                           w2, b2, interpret: bool = False):
    """y = x_res + GRN(gelu(LN(t) @ w1 + b1)) @ w2 + b2 — all rows visible
    (the gathered encoder path).  GRN statistics over all rows (global
    batch).  t, x_res: (M, C); returns (M, C) in t.dtype."""
    y, _, _ = _sg_fwd(t, x_res, ln_scale, ln_bias, w1, b1, gamma, beta, w2, b2, interpret)
    return y


def _sg_fwd(t, x_res, ln_scale, ln_bias, w1, b1, gamma, beta, w2, b2, interpret):
    m, c = t.shape
    c4 = w1.shape[1]
    tm = _sg_tile(c4)
    tp = _pad_rows(t, tm)
    n_tiles = tp.shape[0] // tm

    row = lambda cc: pl.BlockSpec((tm, cc), lambda i: (i, 0), memory_space=pltpu.VMEM)
    full = lambda shape: pl.BlockSpec(shape, lambda i: tuple(0 for _ in shape), memory_space=pltpu.VMEM)

    g, gx = pl.pallas_call(
        functools.partial(_sg_fwd_a_kernel, m_valid=m),
        grid=(n_tiles,),
        in_specs=[row(c), full((1, c)), full((1, c)), full((c, c4)), full((1, c4))],
        out_specs=[row(c4), full((1, c4))],
        out_shape=[
            jax.ShapeDtypeStruct((tp.shape[0], c4), t.dtype),
            jax.ShapeDtypeStruct((1, c4), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((1, c4), jnp.float32)],
        interpret=interpret,
    )(tp, ln_scale.reshape(1, c), ln_bias.reshape(1, c), w1, b1.reshape(1, c4))

    xp = _pad_rows(x_res, tm)
    y = pl.pallas_call(
        _sg_fwd_b_kernel,
        grid=(n_tiles,),
        in_specs=[row(c4), row(c), full((1, c4)), full((1, c4)), full((1, c4)),
                  full((c4, c)), full((1, c))],
        out_specs=row(c),
        out_shape=jax.ShapeDtypeStruct(tp.shape, t.dtype),
        interpret=interpret,
    )(g, xp, gx, gamma.reshape(1, c4), beta.reshape(1, c4), w2, b2.reshape(1, c))
    return y[:m], g, gx


def _sg_fwd_rule(t, x_res, ln_scale, ln_bias, w1, b1, gamma, beta, w2, b2, interpret):
    y, g, gx = _sg_fwd(t, x_res, ln_scale, ln_bias, w1, b1, gamma, beta, w2, b2, interpret)
    return y, (t, g, gx, ln_scale, ln_bias, w1, b1, gamma, beta, w2, b2)


def _sg_bwd_rule(interpret, res, dy):
    t, g, gx, ln_scale, ln_bias, w1, b1, gamma, beta, w2, b2 = res
    m, c = t.shape
    c4 = w1.shape[1]
    tm = _sg_tile(c4)
    tp, dyp = _pad_rows(t, tm), _pad_rows(dy, tm)
    n_tiles = tp.shape[0] // tm

    row = lambda cc: pl.BlockSpec((tm, cc), lambda i: (i, 0), memory_space=pltpu.VMEM)
    full = lambda shape: pl.BlockSpec(shape, lambda i: tuple(0 for _ in shape), memory_space=pltpu.VMEM)

    dw2, db2, dgamma, dbeta, dnx = pl.pallas_call(
        _sg_bwd_c_kernel,
        grid=(n_tiles,),
        in_specs=[row(c), row(c4), full((1, c4)), full((1, c4)), full((1, c4)),
                  full((c4, c))],
        out_specs=[full((c4, c)), full((1, c)), full((1, c4)), full((1, c4)),
                   full((1, c4))],
        out_shape=[
            jax.ShapeDtypeStruct((c4, c), jnp.float32),
            jax.ShapeDtypeStruct((1, c), jnp.float32),
            jax.ShapeDtypeStruct((1, c4), jnp.float32),
            jax.ShapeDtypeStruct((1, c4), jnp.float32),
            jax.ShapeDtypeStruct((1, c4), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((c4, c), jnp.float32), pltpu.VMEM((1, c), jnp.float32),
            pltpu.VMEM((1, c4), jnp.float32), pltpu.VMEM((1, c4), jnp.float32),
            pltpu.VMEM((1, c4), jnp.float32),
        ],
        interpret=interpret,
    )(dyp, g, gx, gamma.reshape(1, c4), beta.reshape(1, c4), w2)

    # dgx from dnx (tiny, in XLA): nx_c = gx_c / (mean_k gx_k + eps)
    mean_gx = jnp.mean(gx, axis=-1, keepdims=True)
    denom = mean_gx + GRN_EPS
    dgx = dnx / denom - jnp.sum(dnx * gx, axis=-1, keepdims=True) / (denom * denom) / c4
    dgxg = jnp.where(gx > 0, dgx / gx, 0.0)

    dt, dw1, db1, dlns, dlnb = pl.pallas_call(
        _sg_bwd_d_kernel,
        grid=(n_tiles,),
        in_specs=[row(c), row(c), row(c4), full((1, c4)), full((1, c4)),
                  full((1, c)), full((1, c)), full((c, c4)), full((1, c4)),
                  full((1, c4)), full((c4, c))],
        out_specs=[row(c), full((c, c4)), full((1, c4)), full((1, c)), full((1, c))],
        out_shape=[
            jax.ShapeDtypeStruct(tp.shape, t.dtype),
            jax.ShapeDtypeStruct((c, c4), jnp.float32),
            jax.ShapeDtypeStruct((1, c4), jnp.float32),
            jax.ShapeDtypeStruct((1, c), jnp.float32),
            jax.ShapeDtypeStruct((1, c), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((c, c4), jnp.float32), pltpu.VMEM((1, c4), jnp.float32),
            pltpu.VMEM((1, c), jnp.float32), pltpu.VMEM((1, c), jnp.float32),
        ],
        interpret=interpret,
    )(tp, dyp, g, gx, dgxg, ln_scale.reshape(1, c), ln_bias.reshape(1, c),
      w1, b1.reshape(1, c4), gamma.reshape(1, c4), w2)

    cast = lambda a, like: a.reshape(like.shape).astype(like.dtype)
    return (
        dt[:m], dy,
        cast(dlns, ln_scale), cast(dlnb, ln_bias),
        cast(dw1, w1), cast(db1, b1),
        cast(dgamma, gamma), cast(dbeta, beta),
        cast(dw2, w2), cast(db2, b2),
    )


fused_block_mlp_spillg.defvjp(_sg_fwd_rule, _sg_bwd_rule)


def fused_block_mlp_spillg_reference(t, x_res, ln_scale, ln_bias, w1, b1,
                                     gamma, beta, w2, b2):
    """Math spec of the spill-g path: identical to fused_block_mlp_reference
    with keep == 1 except the GRN sumsq sees the bf16-*stored* g (as both the
    kernel and the XLA path do)."""
    cd = _mm_dtype(t.dtype)
    t32 = t.astype(jnp.float32)
    u, _, _ = _ln_forward(t32, ln_scale.astype(jnp.float32), ln_bias.astype(jnp.float32))
    v = _mm(u, w1, cd) + b1.astype(jnp.float32)
    g = _gelu(v).astype(t.dtype).astype(jnp.float32)
    gx = jnp.sqrt(jnp.sum(g * g, axis=0, keepdims=True))
    nx = gx / (jnp.mean(gx, axis=-1, keepdims=True) + GRN_EPS)
    h = gamma.astype(jnp.float32) * (g * nx) + beta.astype(jnp.float32) + g
    o = _mm(h, w2, cd) + b2.astype(jnp.float32)
    return (x_res.astype(jnp.float32) + o).astype(t.dtype)


# ---------------------------------------------------------------------------
# pure-jnp reference (for tests and as the math spec)
# ---------------------------------------------------------------------------
def fused_block_mlp_reference(t, x_res, keep, ln_scale, ln_bias, w1, b1, gamma, beta, w2, b2):
    cd = _mm_dtype(t.dtype)
    t32 = t.astype(jnp.float32)
    keep = keep.astype(jnp.float32)
    u, _, _ = _ln_forward(t32, ln_scale.astype(jnp.float32), ln_bias.astype(jnp.float32))
    v = _mm(u, w1, cd) + b1.astype(jnp.float32)
    g = _gelu(v)
    gk = g * keep
    gx = jnp.sqrt(jnp.sum(gk * gk, axis=0, keepdims=True))
    nx = gx / (jnp.mean(gx, axis=-1, keepdims=True) + GRN_EPS)
    h = gamma.astype(jnp.float32) * (g * nx) + beta.astype(jnp.float32) + g
    o = _mm(h, w2, cd) + b2.astype(jnp.float32)
    return (x_res.astype(jnp.float32) + o * keep).astype(t.dtype)
