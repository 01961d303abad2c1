"""Pallas TPU kernel: fused scatter -> depthwise 7x7 conv -> gather on the
gathered visible-patch representation.

This is the whole-block fusion lever (ROADMAP.md round-4: "the only path
attacking the ~15 ms VPU-bound dwconv and the f32 norm traffic at once").
The ConvNeXtV2 block's spatial op is the depthwise conv; on the gathered
encoder it runs as ``gather(dwconv(scatter(x_g)))`` — XLA lowers that to two
selection matmuls (~5 ms/step), patch-major reshapes (~4 ms/step) and a
VPU-bound conv (~15 ms/step, reference hot loop
models/convnextv2_sparse.py:47-56).  This kernel does all three in one pass
per image block:

  * scatter: each visible patch ``(p, p, C)`` is written into a per-image
    dense ``(h, h, C)`` VMEM scratch at its ``(gy*p, gx*p)`` site (masked
    patches stay zero — exactly the masked-dense semantics the gathered
    encoder is equivalence-tested against).
  * dwconv: 49 shifted fused multiply-adds over the dense scratch.  The
    data layout is ``(B, h, w, C)`` with ``w`` in the sublane dim and ``C``
    in lanes: ``dy`` shifts index the free (untiled) dim, and the 7 ``dx``
    sublane shifts are hoisted out of the tap loop (7 shift passes + 49
    pure-FMA passes instead of 49 shifted reads).
  * gather: visible sites are read back out of the conv accumulator and
    written to the gathered output — the dense grid never touches HBM.

HBM traffic per block drops to one read of ``x_g`` and one write of ``t_g``
(the XLA path additionally materializes the dense scatter, the conv output,
and the patch-major transposes).  The backward pass (``_bwd_kernel``) fuses
the transposed conv (dx), the weight gradient (all 49 taps accumulated in a
VMEM scratch across the batch grid), and the bias gradient the same way.

Used by ``Block(block_impl="dwg")`` (Pallas dwconv + XLA block tail) and
``Block(block_impl="wholeblock")`` (Pallas dwconv + the spill-g Pallas MLP
kernels from ops/fused_block.py) — see models/convnextv2.py.

MEASURED RESULT (round 5, full-step in-process A/B at atto/256 on v5e,
scripts/ab_impl.py, the VERDICT-r4 closure condition): **LOSS 61-62%** —
77.8-77.9 ms/step vs 48.0-48.3 ms for the XLA path (losses agree to 3.4e-6
rel), with the kernel active at stage 0 only (p=8, its best geometry —
Mosaic cannot compile the p<8 stages at all: dynamic vector stores need
provably-8-aligned sublane offsets, and the (grid, p)-split layout that
would fix that caps sublane utilization at p/8).  Per-cause attribution
from kernel-variant microbenchmarks (scatter-only / taps-only / full, each
timed standalone on the chip at stage-0 geometry n=256, K=19, p=8, C=40):

  1. **Tap-loop codegen (dominant):** the 49-FMA tap loop alone runs at
     ~0.67 TFLOP/s — ~6x under XLA's fused dwconv on the same shapes
     (ROADMAP.md: XLA does stage-0 dwconv fwd+bwd in 2.96 ms; this
     kernel's *forward* alone measured 5.8-6.9 ms).  Mosaic lowers each
     tap as an explicit vector shift + f32 RMW against the VMEM
     accumulator; XLA's conv emitter pipelines window reuse natively.
     Accumulating per-dx in a value (7 RMWs instead of 49) and inlining
     the shifts both measured *worse*; B=2 image blocks made taps worse
     (the RMW traffic scales with the scratch, not the grid count).
  2. **Lane occupancy:** C=40 fills 40/128 lanes (31%) of every vreg in
     the tap loop; XLA's layout packs the same conv across channels.
  3. **Per-grid-step overhead:** ~1.2 ms/call at B=1 (256 grid steps of
     scatter + gather dynamic copies); amortizing with larger B trades
     directly into (1)'s RMW cost, measured net-negative.

In-model the delta (29.6 ms/step) matches 2 stage-0 blocks x (fwd+bwd)
of the standalone gap — the loss is the kernel's own runtime, not fusion
boundaries.  Conclusion recorded in ROADMAP.md: the 48-vs-32.3 ms
calibrated-HBM-floor residual is owned by XLA's scheduler, not by any
reachable kernel-level rewrite — this was the 12th and last named lever
(11 JAX-level alternatives + the compiler-flag sweep, XLA_FLAGS_AB.json,
all measured null or losing).  The kernel stays in-tree behind
``--block_impl dwg/wholeblock`` as a working, equivalence-tested negative
result.
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


def _images_per_step(n: int, h: int, c: int, budget_elems: int) -> int:
    """Largest divisor of ``n`` whose dense scratch (b * h * h * c elements)
    stays under the VMEM element budget."""
    b = max(1, budget_elems // (h * h * c))
    while n % b:
        b -= 1
    return b


def _taps_into(acc_ref, xpad, k_ref, h: int, flip: bool):
    """49 shifted FMAs over the padded dense value ``xpad`` (B, h+6, h+6, C),
    accumulated into the f32 scratch ``acc_ref`` (B, h, h, C).  The 7
    sublane (dx) shifts are hoisted; the 7 dy shifts per dx slice the free
    dim.  Accumulating through the ref (not a carried value) keeps at most
    one tap temporary live — a value-carried version measured 28.5 MB of
    scoped VMEM at B=4 (Mosaic keeps the whole tap dataflow live).
    ``flip`` selects the transposed conv (correlation with the 180-degree-
    rotated kernel) for the data gradient."""
    for bb in range(KW):
        xb = jax.lax.slice_in_dim(xpad, bb, bb + h, axis=2)  # (B, h+6, h, C)
        for aa in range(KH):
            xab = jax.lax.slice_in_dim(xb, aa, aa + h, axis=1)  # (B, h, h, C)
            t = (KH - 1 - aa) * KW + (KW - 1 - bb) if flip else aa * KW + bb
            acc_ref[...] += xab.astype(jnp.float32) * k_ref[t, :].astype(jnp.float32)


def _patch_loop(ids_ref, i, bimg, k, grid_hw, p, body):
    """fori_loop over all (image, patch) pairs of this grid step — a rolled
    loop keeps the Mosaic program small (an unrolled 2*B*K dynamic-slice
    sequence measured minutes of backend compile time)."""

    def one(t, _):
        b = t // k
        j = t - b * k
        pid = ids_ref[i * bimg + b, j]
        r0 = (pid // grid_hw) * p
        c0 = (pid % grid_hw) * p
        body(b, j, r0, c0)
        return 0

    jax.lax.fori_loop(0, bimg * k, one, 0)


def _fwd_kernel(ids_ref, x_ref, k_ref, b_ref, t_ref, dense, conv,
                *, p: int, k: int, grid_hw: int, bimg: int):
    i = pl.program_id(0)
    h = grid_hw * p

    dense[...] = jnp.zeros_like(dense)

    def scatter(b, j, r0, c0):
        dense[b, pl.ds(r0, p), pl.ds(c0, p), :] = x_ref[b, j]

    _patch_loop(ids_ref, i, bimg, k, grid_hw, p, scatter)

    xpad = jnp.pad(dense[...], ((0, 0), (PAD, PAD), (PAD, PAD), (0, 0)))
    bias = b_ref[0, :].astype(jnp.float32)
    conv[...] = jnp.broadcast_to(bias, conv.shape)
    _taps_into(conv, xpad, k_ref, h, flip=False)

    def gather(b, j, r0, c0):
        t_ref[b, j] = conv[b, pl.ds(r0, p), pl.ds(c0, p), :].astype(t_ref.dtype)

    _patch_loop(ids_ref, i, bimg, k, grid_hw, p, gather)


def _bwd_kernel(ids_ref, dt_ref, x_ref, k_ref, dx_ref, dk_ref, db_ref,
                dtd, xd, dxs, dk_acc, db_acc,
                *, p: int, k: int, grid_hw: int, bimg: int):
    i = pl.program_id(0)
    n_steps = pl.num_programs(0)
    h = grid_hw * p

    @pl.when(i == 0)
    def _():
        dk_acc[...] = jnp.zeros_like(dk_acc)
        db_acc[...] = jnp.zeros_like(db_acc)

    dtd[...] = jnp.zeros_like(dtd)
    xd[...] = jnp.zeros_like(xd)

    def scatter(b, j, r0, c0):
        dtd[b, pl.ds(r0, p), pl.ds(c0, p), :] = dt_ref[b, j]
        xd[b, pl.ds(r0, p), pl.ds(c0, p), :] = x_ref[b, j]

    _patch_loop(ids_ref, i, bimg, k, grid_hw, p, scatter)

    dtv = dtd[...].astype(jnp.float32)
    dtp = jnp.pad(dtd[...], ((0, 0), (PAD, PAD), (PAD, PAD), (0, 0)))
    # data gradient: correlation of dt with the flipped kernel
    dxs[...] = jnp.zeros_like(dxs)
    _taps_into(dxs, dtp, k_ref, h, flip=True)

    # weight gradient: dK[a, b, c] = sum_{n,y,x} X[y+a-3, x+b-3, c] * dt[y, x, c]
    xpad = jnp.pad(xd[...], ((0, 0), (PAD, PAD), (PAD, PAD), (0, 0)))
    for bb in range(KW):
        xb = jax.lax.slice_in_dim(xpad, bb, bb + h, axis=2)
        for aa in range(KH):
            xab = jax.lax.slice_in_dim(xb, aa, aa + h, axis=1)
            prod = xab.astype(jnp.float32) * dtv
            dk_acc[aa * KW + bb, :] += jnp.sum(prod, axis=(0, 1, 2))
    db_acc[...] += jnp.sum(dtv, axis=(0, 1, 2), keepdims=False).reshape(1, -1)

    def gather(b, j, r0, c0):
        dx_ref[b, j] = dxs[b, pl.ds(r0, p), pl.ds(c0, p), :].astype(dx_ref.dtype)

    _patch_loop(ids_ref, i, bimg, k, grid_hw, p, gather)

    @pl.when(i == n_steps - 1)
    def _():
        dk_ref[...] = dk_acc[...]
        db_ref[...] = db_acc[...]


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def dwconv7_gathered(x_g, kept_ids, kernel, bias, grid_hw: int,
                     interpret: bool = False):
    """``gather(dwconv7x7_SAME(scatter_dense(x_g)))`` in one fused kernel.

    x_g: (N, K, p, p, C) gathered visible patches; kept_ids: (N, K) int32
    patch ids on the (grid_hw, grid_hw) patch grid; kernel: (7, 7, 1, C)
    depthwise taps (flax layout); bias: (C,).  Returns (N, K, p, p, C) — the
    depthwise conv output at the visible sites of the implied dense
    (N, h, h, C) grid (h = grid_hw * p) with zeros at masked sites,
    identical to the XLA scatter/conv/gather composition
    (models/convnextv2.py Block gather_ctx path; reference hot loop
    models/convnextv2_sparse.py:47-56).
    """
    t, _ = _fwd(x_g, kept_ids, kernel, bias, grid_hw, interpret)
    return t


def _fwd(x_g, kept_ids, kernel, bias, grid_hw, interpret):
    n, k, p, _, c = x_g.shape
    h = grid_hw * p
    bimg = _images_per_step(n, h, c, 2 ** 18)
    k49 = kernel.astype(x_g.dtype).reshape(KH * KW, c)
    bias2 = bias.astype(jnp.float32).reshape(1, c)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n // bimg,),
        in_specs=[
            pl.BlockSpec((bimg, k, p, p, c), lambda i, ids: (i, 0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((KH * KW, c), lambda i, ids: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i, ids: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bimg, k, p, p, c), lambda i, ids: (i, 0, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((bimg, h, h, c), x_g.dtype),   # dense scatter
            pltpu.VMEM((bimg, h, h, c), jnp.float32),  # conv accumulator
        ],
    )
    t = pl.pallas_call(
        functools.partial(_fwd_kernel, p=p, k=k, grid_hw=grid_hw, bimg=bimg),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(x_g.shape, x_g.dtype),
        interpret=interpret,
    )(kept_ids.astype(jnp.int32), x_g, k49, bias2)
    return t, (x_g, kept_ids, kernel)


def _fwd_rule(x_g, kept_ids, kernel, bias, grid_hw, interpret):
    t, res = _fwd(x_g, kept_ids, kernel, bias, grid_hw, interpret)
    return t, res


def _bwd_rule(grid_hw, interpret, res, dt):
    x_g, kept_ids, kernel = res
    n, k, p, _, c = x_g.shape
    h = grid_hw * p
    bimg = _images_per_step(n, h, c, 2 ** 17)
    k49 = kernel.astype(x_g.dtype).reshape(KH * KW, c)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n // bimg,),
        in_specs=[
            pl.BlockSpec((bimg, k, p, p, c), lambda i, ids: (i, 0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bimg, k, p, p, c), lambda i, ids: (i, 0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((KH * KW, c), lambda i, ids: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((bimg, k, p, p, c), lambda i, ids: (i, 0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((KH * KW, c), lambda i, ids: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i, ids: (0, 0), memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((bimg, h, h, c), x_g.dtype),   # dt dense
            pltpu.VMEM((bimg, h, h, c), x_g.dtype),   # x dense
            pltpu.VMEM((bimg, h, h, c), jnp.float32),  # dx accumulator
            pltpu.VMEM((KH * KW, c), jnp.float32),    # dK accumulator
            pltpu.VMEM((1, c), jnp.float32),          # db accumulator
        ],
    )
    dx, dk, db = pl.pallas_call(
        functools.partial(_bwd_kernel, p=p, k=k, grid_hw=grid_hw, bimg=bimg),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct(x_g.shape, x_g.dtype),
            jax.ShapeDtypeStruct((KH * KW, c), jnp.float32),
            jax.ShapeDtypeStruct((1, c), jnp.float32),
        ],
        interpret=interpret,
    )(kept_ids.astype(jnp.int32), dt, x_g, k49)
    return (dx, None, dk.reshape(KH, KW, 1, c).astype(kernel.dtype),
            db.reshape(c))


dwconv7_gathered.defvjp(_fwd_rule, _bwd_rule)


def dwconv7_gathered_reference(x_g, kept_ids, kernel, bias, grid_hw: int):
    """Math spec via dense scatter -> lax depthwise conv -> gather (the XLA
    path this kernel replaces), for tests."""
    n, k, p, _, c = x_g.shape
    h = grid_hw * p
    # scatter
    dense = jnp.zeros((n, h, h, c), x_g.dtype)
    gy = kept_ids // grid_hw
    gx = kept_ids % grid_hw

    def put(dense_n, xn, gyn, gxn):
        def body(j, d):
            return jax.lax.dynamic_update_slice(
                d, xn[j], (gyn[j] * p, gxn[j] * p, 0))
        return jax.lax.fori_loop(0, k, body, dense_n)

    dense = jax.vmap(put)(dense, x_g, gy, gx)
    out = jax.lax.conv_general_dilated(
        dense, kernel.astype(x_g.dtype), (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c,
    ) + bias.astype(x_g.dtype)

    def take(outn, gyn, gxn):
        def one(j):
            return jax.lax.dynamic_slice(outn, (gyn[j] * p, gxn[j] * p, 0),
                                         (p, p, c))
        return jax.vmap(one)(jnp.arange(k))

    return jax.vmap(take)(out, gy, gx)
