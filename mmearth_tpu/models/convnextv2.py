"""NHWC ConvNeXtV2 for TPU, with a sparse-encoder-equivalent masked path.

Architecture parity (reference file:line):
  * Block: dwconv7x7 -> LN -> pw Linear 4x -> GELU -> GRN -> pw Linear ->
    droppath residual (models/convnextv2.py:18-55, convnextv2_sparse.py:26-56).
  * Backbone: ``initial_conv`` (3x3 s1 + LN + GELU) then depthwise ``stem``
    with stride patch_size/8 (models/convnextv2.py:108-124), or the original
    4x4-style stem (``use_orig_stem``, :97-106); three LN + 2x2 s2 downsample
    layers (:126-131); four stages (:133-146); GAP + LN + Linear head
    (:148-153, 160-174).
  * Masked pretraining path: reproduces the *MinkowskiEngine sparse encoder*
    (models/convnextv2_sparse.py:191-220) exactly with dense ops: the patch
    mask is re-applied after every spatial op and GRN statistics run over
    unmasked sites only (SparK-style, "Designing BERT for Convolutional
    Networks").  Because the mask is patch-aligned and every conv window fits
    inside one mask cell (stride-2 downsamples, stem stride = patch/8), the
    dense-masked computation equals the sparse gather/scatter computation
    site-for-site.  ``sparse=False`` instead reproduces the reference's leaky
    dense path (mask applied to the input only, convnextv2.py:185-203) for
    parity testing.

Padding: unlike the reference dense path (no padding on ``initial_conv``,
convnextv2.py:109, which breaks the 56px/patch-8 geometry), we use SAME zero
padding — this matches the Minkowski stride-1 convolution, which preserves the
coordinate set (zero contributions from absent neighbors), and keeps the mask
grid aligned for both 56-8 and 112-16 geometries.

``padding_mode="reference"`` instead reproduces the reference dense model's
exact padding (VALID ``initial_conv``, convnextv2.py:109; ``stride//2``-padded
stem, :114-124) for bit-faithful eval of released dense checkpoints at the
112-16 geometry (the only geometry where the reference dense path is
shape-consistent).  It applies to the classifier/unmasked paths only — the
masked sparse-equivalent path requires SAME alignment.
"""
from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..ops.patch_select import _from_patches, _to_patches
from .norm import GRN, LayerNorm, MaskedGRN, _safe_l2

Dtype = Any

# torch/timm trunc_normal_(std=.02) truncates at +-2 absolute (~100 sigma), so
# it is an ordinary normal; trunc_normal_(std=1) truncates meaningfully at
# +-2 sigma, matching jax's truncated_normal.
init_normal02 = nn.initializers.normal(stddev=0.02)
init_trunc1 = nn.initializers.truncated_normal(stddev=1.0)


def gelu(x, approximate: bool = False):
    """Reference parity default: torch nn.GELU() = exact erf GELU.  The tanh
    approximation (``gelu_approx`` config) trades ~1e-3-relative activation
    differences for cheaper transcendentals on the VPU."""
    return jax.nn.gelu(x, approximate=approximate)


def visible_ids(mask: jax.Array, num_visible: int) -> tuple[jax.Array, jax.Array]:
    """From a (N, L) patch mask (1 = removed) with exactly ``num_visible``
    zeros per row, build the gather/scatter index pair for visible-patch
    computation:

      * ``kept_ids`` (N, K): patch ids of the visible patches, ascending.
      * ``inv_ids`` (N, L): for each patch, its row in the gathered tensor,
        or K (a sentinel zero-row) for removed patches.
    """
    keep = (1.0 - mask).astype(jnp.int32)
    kept_ids = jnp.argsort(mask, axis=1, stable=True)[:, :num_visible]
    rank = jnp.cumsum(keep, axis=1) - 1
    inv_ids = jnp.where(keep > 0, rank, num_visible)
    return kept_ids, inv_ids


def visible_onehot(mask: jax.Array, num_visible: int, dtype=jnp.bfloat16) -> jax.Array:
    """(N, K, L) one-hot selection matrix P of the visible patches.  Gathers
    and scatters become MXU matmuls: gathered = P @ patches, dense = P^T @
    gathered (rows of removed patches are zero).  Selection by 0/1 matmul is
    exact in any float dtype, and both VJPs are the transposed matmuls —
    take_along_axis instead lowers to serialized gathers and (in autodiff)
    scatter-adds, measured ~15 ms/step at atto/256."""
    kept_ids, _ = visible_ids(mask, num_visible)
    return jax.nn.one_hot(kept_ids, mask.shape[1], dtype=dtype)


def _select_precision(dtype) -> jax.lax.Precision:
    """Selection matmuls must not quantize the selected values: JAX's default
    TPU matmul precision multiplies f32 operands as bf16, so the f32 path
    pins HIGHEST (bf16 operands are exact under the default — each output row
    is 1.0 x value accumulated in f32)."""
    return jax.lax.Precision.HIGHEST if dtype == jnp.float32 else jax.lax.Precision.DEFAULT


def gather_visible(x: jax.Array, P: jax.Array, grid: int) -> jax.Array:
    """Dense (N, H, H, C) -> gathered (N, K, p*p, C) of the visible patches.

    The MinkowskiEngine-equivalent move: with the patch-aligned mask and a
    fixed visible count (gen_random_mask keeps exactly len_keep patches),
    every site-local op (LN / pw1 / gelu / GRN / pw2 / residual) runs on the
    ~40% visible rows only — dense for the MXU, 2.6x less work.  Only the
    depthwise conv needs the dense grid (scatter_visible below).
    """
    xp = _to_patches(x, grid)
    n, l, pp, c = xp.shape
    out = jax.lax.dot_general(
        P.astype(xp.dtype), xp.reshape(n, l, pp * c),
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        precision=_select_precision(xp.dtype),
    )
    return out.reshape(n, P.shape[1], pp, c)


def scatter_visible(xg: jax.Array, P: jax.Array, grid: int, h: int) -> jax.Array:
    """Gathered (N, K, p*p, C) -> dense (N, H, H, C) with zeros at removed
    patches (P^T @ xg; each dense row receives at most one gathered row)."""
    n, k, pp, c = xg.shape
    dense = jax.lax.dot_general(
        P.astype(xg.dtype), xg.reshape(n, k, pp * c),
        dimension_numbers=(((1,), (1,)), ((0,), (0,))),
        precision=_select_precision(xg.dtype),
    )
    return _from_patches(dense.reshape(n, P.shape[2], pp, c), grid, h)


def gather_visible6(x: jax.Array, P: jax.Array, grid: int) -> jax.Array:
    """gather_visible expressed as ONE dot_general on the free 6-D view
    (N, grid, p, grid, p, C) with P reshaped to (N, K, grid, grid): the
    patch-major transpose that :func:`_to_patches` materializes (~2 ms/step
    at atto/256, trace attribution) becomes part of the contraction's operand
    layout, in the hope that XLA's transpose-folding absorbs it into the dot.

    MEASURED RESULT (negative; kept as the opt-in ``gather_impl="dot6"`` —
    the 11th lever measured losing, ROADMAP.md): full-step A/B at atto/256 on
    v5e (scripts/ab_impl.py "gather=auto" "gather=dot6"): **61.02 vs 47.99
    ms/step (27% slower)**.  The multi-contracting-dim 6-D dot lowers to a
    worse internal layout than the explicit transpose + flat selection
    matmul, which XLA fuses into neighbors.  Bit-exactness vs the onehot
    path is pinned by tests/test_patch_select.py::test_dot6_selection_bit_exact."""
    n, h, _, c = x.shape
    p = h // grid
    k = P.shape[1]
    x6 = x.reshape(n, grid, p, grid, p, c)
    P4 = P.reshape(n, k, grid, grid).astype(x.dtype)
    out = jax.lax.dot_general(
        P4, x6,
        dimension_numbers=(((2, 3), (1, 3)), ((0,), (0,))),
        precision=_select_precision(x.dtype),
    )  # (n, k, p, p, c)
    return out.reshape(n, k, p * p, c)


def scatter_visible6(xg: jax.Array, P: jax.Array, grid: int, h: int) -> jax.Array:
    """scatter_visible via dot_general on the 5-D gathered view; the output
    arrives as (N, grid, grid, p, p, C) and one transpose interleaves it back
    to the dense grid (the same movement _from_patches does — the win, if
    any, is on the gather side; measured as one unit with gather_visible6)."""
    n, k, pp, c = xg.shape
    p = h // grid
    xg5 = xg.reshape(n, k, p, p, c)
    P4 = P.reshape(n, k, grid, grid).astype(xg.dtype)
    out = jax.lax.dot_general(
        P4, xg5,
        dimension_numbers=(((1,), (1,)), ((0,), (0,))),
        precision=_select_precision(xg.dtype),
    )  # (n, grid, grid, p, p, c)
    return out.transpose(0, 1, 3, 2, 4, 5).reshape(n, h, h, c)


def upsample_mask(mask: jax.Array, grid: int, size: int) -> jax.Array:
    """(N, L) patch mask -> (N, size, size, 1); nearest upsample by repeat
    (reference fcmae.py:233-240)."""
    n = mask.shape[0]
    scale = size // grid
    m = mask.reshape(n, grid, 1, grid, 1, 1)
    m = jnp.broadcast_to(m, (n, grid, scale, grid, scale, 1))
    return m.reshape(n, size, size, 1)


def _folded_tail(t, p, grn_group: int, gelu_approx: bool, dtype):
    """The gathered block tail (LN -> pw1 -> gelu -> GRN -> pw2) with the two
    normalizations FOLDED into the adjacent matmul kernels — exact algebra,
    two fewer 4C-wide HBM round-trips per block:

      * LN is a per-row affine after normalization, so
        ``pw1(LN(t)) = ((t @ W1') - mu * colsum(W1')) * inv_sigma + b1'``
        with ``W1' = ln_scale[:, None] * W1`` and ``b1' = ln_bias @ W1 + b1``
        — the normalized activations never materialize; the raw gathered
        ``t`` feeds the MXU directly and the per-row correction is a fused
        f32 epilogue.
      * GRN (given its channel statistics) is a per-channel affine
        ``y = g * (gamma * nx + 1) + beta``, so
        ``pw2(GRN(g)) = g @ ((gamma * nx + 1)[:, None] * W2) + (beta @ W2 + b2)``
        — the GRN output ``h`` never materializes; ``g`` is read once for the
        statistics and once by the MXU instead of the composed path's
        read-scale-write-read.

    Per block this removes 2 of the 5 minimum 4C-wide passes (write h, read
    h) and the C-wide LN-output write+read.  Statistics match MaskedGRN on
    all-visible rows (grouped by ``grn_group`` over the leading axis, eps
    1e-6) and LayerNorm (eps 1e-6); everything stats-related stays f32.
    Kernel scaling costs only O(C * 4C) — shared across every row — which is
    why this fold is viable here (global/grouped stats) but would LOSE on
    the decoder's per-sample dense GRN (N distinct scaled kernels).

    MEASURED RESULT (negative; kept as a documented opt-in alternative —
    the 10th lever measured losing to XLA's lowering of the composed path,
    ROADMAP.md "Performance"): full-step in-process A/B at atto/256 on v5e
    (scripts/ab_impl.py auto folded): **62.17 vs 48.12 ms/step (29% slower)**
    with loss agreement 3.9e-06 (a first variant with f32 matmul outputs was
    40% slower).  The analytic ~20% HBM-traffic cut does not translate:
    XLA's schedule of the composed chain (which it can tile, fuse, and
    overlap per-op) beats the hand-restructured dataflow whose pw2 cannot
    start until the full f32 statistics reduction and kernel re-scale
    complete.  Equivalence is pinned by
    tests/test_block_impl.py::test_folded_block_impl_matches_xla_gathered.
    """
    f32 = jnp.float32
    tf = t.astype(f32)
    mu = jnp.mean(tf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(tf - mu), axis=-1, keepdims=True)
    inv = jax.lax.rsqrt(var + 1e-6)

    w1 = p["pwconv1"]["kernel"].astype(f32)
    b1 = p["pwconv1"]["bias"].astype(f32)
    ln_s = p["norm"]["scale"].astype(f32)
    ln_b = p["norm"]["bias"].astype(f32)
    w1p = ln_s[:, None] * w1
    colsum = jnp.sum(w1p, axis=0)
    bias1 = ln_b @ w1 + b1
    # bf16 matmul output (f32 would double the 4C-wide write traffic — a
    # first attempt with preferred_element_type=f32 measured 40% SLOWER);
    # the per-row correction upcasts in a fused f32 epilogue.
    z = jnp.dot(t.astype(dtype), w1p.astype(dtype))
    u = (z.astype(f32) - mu * colsum) * inv + bias1
    g = gelu(u, gelu_approx).astype(dtype)

    n = g.shape[0]
    grp = n if grn_group <= 0 or n % grn_group else min(grn_group, n)
    n_groups = n // grp
    c4 = g.shape[-1]
    gg = g.reshape(n_groups, -1, c4)
    gx = _safe_l2(jnp.sum(jnp.square(gg.astype(f32)), axis=1))  # (G, 4C)
    nx = gx / (jnp.mean(gx, axis=-1, keepdims=True) + 1e-6)
    gamma = p["grn"]["gamma"].astype(f32)
    beta = p["grn"]["beta"].astype(f32)
    w2 = p["pwconv2"]["kernel"].astype(f32)
    b2 = p["pwconv2"]["bias"].astype(f32)
    a = gamma * nx + 1.0                          # (G, 4C)
    bias2 = (beta @ w2 + b2).astype(dtype)        # (C,)
    if n_groups == 1:
        w2p = (a[0, :, None] * w2).astype(dtype)  # (4C, C)
        out = jnp.dot(gg[0], w2p) + bias2
    else:
        w2p = (a[:, :, None] * w2).astype(dtype)  # (G, 4C, C)
        out = jnp.einsum("grc,gcd->grd", gg, w2p) + bias2
    return out.astype(dtype).reshape(t.shape[:-1] + (w2.shape[-1],))


class DropPath(nn.Module):
    """Per-sample stochastic depth."""

    rate: float

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        if self.rate == 0.0 or deterministic:
            return x
        keep = 1.0 - self.rate
        rng = self.make_rng("droppath")
        shape = (x.shape[0],) + (1,) * (x.ndim - 1)
        mask = jax.random.bernoulli(rng, keep, shape=shape)
        return x * mask.astype(x.dtype) / keep


class Block(nn.Module):
    """ConvNeXtV2 block.  When ``keep`` (N,H,W,1; 1 = visible) is given and
    ``sparse`` is set, reproduces the Minkowski sparse block: the input is
    assumed pre-masked, GRN statistics exclude masked sites, and the residual
    branch is re-masked once before the add.

    ``block_impl`` selects the masked-path implementation of everything after
    the depthwise conv (LN -> pw1 -> gelu -> masked GRN -> pw2 -> mask ->
    residual): "xla"/"auto" = composed jnp ops; "fused" = the recompute-based
    Pallas kernel (ops/fused_block.py); "remat" = the same composed ops under
    ``nn.remat``, so autodiff stores only the C-wide dwconv output and
    rematerializes the three 4C-wide intermediates (pw1 out / gelu out / GRN
    out) in the backward pass — trading cheap MXU/VPU recompute for HBM
    round-trips.  Both alternates are opt-in negative results, measured
    full-step in-process on v5e (scripts/ab_impl.py): the Pallas kernel loses
    (fwd 4.8 ms vs ~3 ms, bwd 8.1 ms vs ~4 ms per stage-0 block at atto/256 —
    the double erf-gelu recompute dominates), and remat loses 20.6% at
    atto/256 (57.9 vs 48.0 ms/step) and 7.0% at tiny/112 (57.4 vs 53.7) —
    the recompute + optimization barriers cost more than the avoided traffic;
    with ``prevent_cse=False`` XLA simply CSEs the recompute away
    (bit-identical loss, ~equal time).  So "auto" resolves to xla.
    Parameters are identical across implementations (same names/shapes/init),
    so checkpoints interchange.
    """

    dim: int
    drop_path: float = 0.0
    sparse: bool = False
    dtype: Dtype = jnp.float32
    # Optional init overrides; defaults follow the reference's per-mode rules
    # (fcmae.py:157-178: Minkowski dwconv/linear get trunc_normal std 1, dense
    # nn.Conv2d std .02 in the classifier, std 1 inside FCMAE).
    dw_init: Optional[Any] = None
    pw_init: Optional[Any] = None
    grn_group: int = 0  # MaskedGRN stats scope (0 = global batch)
    # "auto" | "xla" | "fused" | "spillg" | "remat" | "folded" |
    # "dwg" (fused Pallas scatter->dwconv->gather, ops/wholeblock.py, with
    # the XLA block tail) | "wholeblock" (Pallas dwconv + the spill-g Pallas
    # MLP kernels).  Alternates are opt-in; measured numbers in docstrings.
    block_impl: str = "auto"
    gelu_approx: bool = False  # tanh GELU instead of reference-exact erf

    def _fused_active(self, keep, deterministic) -> bool:
        if self.block_impl == "xla" or keep is None or not self.sparse:
            return False
        if self.grn_group:  # kernel implements global-batch GRN stats only
            return False
        if self.gelu_approx:  # kernel hard-codes the exact erf GELU
            return False
        if self.drop_path and not deterministic:
            return False
        return self.block_impl == "fused"

    def _folded_active(self, deterministic) -> bool:
        """Norm-folded gathered tail (:func:`_folded_tail`): removes two
        4C-wide HBM passes per block with identical parameters and identical
        math (up to one bf16 rounding moved from the activations onto the
        scaled kernels)."""
        return self.block_impl == "folded"

    def _spillg_active(self, deterministic) -> bool:
        """Spill-g fused MLP on the gathered (all-visible) rows
        (ops/fused_block.py::fused_block_mlp_spillg).  Also the tail of
        ``block_impl="wholeblock"`` (Pallas dwconv + Pallas MLP)."""
        if self.block_impl not in ("spillg", "wholeblock"):
            return False
        if self.grn_group:  # kernel implements global-batch GRN stats only
            return False
        if self.gelu_approx:  # kernel hard-codes the exact erf GELU
            return False
        if self.drop_path and not deterministic:
            return False
        return True

    @nn.compact
    def __call__(self, x, keep=None, deterministic: bool = True, gather_ctx=None):
        """``gather_ctx`` = ((kind, sel), grid, h) where kind is "onehot"
        (sel = the (N, K, L) selection matrix P) or "pallas" (sel = the
        (N, K) kept_ids): visible-patch mode — ``x`` is the gathered
        (N, K, p*p, C) tensor; the depthwise conv runs on the scattered
        dense grid, everything else on the gathered rows (identical math to
        the masked-dense path, ~60% less work at mask_ratio 0.6)."""
        inp = x
        dw_init = self.dw_init or (init_trunc1 if self.sparse else init_normal02)
        pw_init = self.pw_init or (init_trunc1 if self.sparse else init_normal02)
        dwconv = nn.Conv(
            self.dim, (7, 7), padding="SAME", feature_group_count=self.dim,
            kernel_init=dw_init, dtype=self.dtype, name="dwconv",
        )
        use_masked_grn = (keep is not None or gather_ctx is not None) and self.sparse

        if self.block_impl == "remat":
            # Tail submodules are created *inside* the lifted function (same
            # names -> identical param tree); creating them out here too would
            # collide.
            gathered = gather_ctx is not None
            mask_after = keep is not None and self.sparse and not gathered

            def _tail(blk, t, res, keep_t):
                u = LayerNorm(blk.dim, dtype=blk.dtype, name="norm")(t)
                u = nn.Dense(4 * blk.dim, kernel_init=pw_init, dtype=blk.dtype,
                             name="pwconv1")(u)
                u = gelu(u, blk.gelu_approx)
                if use_masked_grn:
                    u = MaskedGRN(4 * blk.dim, dtype=blk.dtype, group=blk.grn_group,
                                  name="grn")(u, keep_t)
                else:
                    u = GRN(4 * blk.dim, dtype=blk.dtype, name="grn")(u)
                out = nn.Dense(blk.dim, kernel_init=pw_init, dtype=blk.dtype,
                               name="pwconv2")(u)
                if mask_after:
                    out = out * keep_t.astype(out.dtype)
                out = DropPath(blk.drop_path, name="drop_path")(out, deterministic)
                return res + out

            tail = nn.remat(_tail)
            if gathered:
                (kind, sel), grid, h = gather_ctx
                if kind == "pallas":
                    from ..ops import patch_select as psel

                    n, k, pp, c = x.shape
                    p = h // grid
                    xd = psel.scatter_patches(x.reshape(n, k, p, p, c), sel, p, grid, h)
                    t = psel.gather_patches(dwconv(xd), sel, p, grid).reshape(x.shape)
                elif kind == "dot6":
                    xd = scatter_visible6(x, sel, grid, h)
                    t = gather_visible6(dwconv(xd), sel, grid)
                else:
                    xd = scatter_visible(x, sel, grid, h)
                    t = gather_visible(dwconv(xd), sel, grid)
                ones = jnp.ones(t.shape[:-1] + (1,), t.dtype)
                return tail(self, t, inp, ones)
            return tail(self, dwconv(x), inp, keep)

        norm = LayerNorm(self.dim, dtype=self.dtype, name="norm")
        pw1 = nn.Dense(4 * self.dim, kernel_init=pw_init, dtype=self.dtype, name="pwconv1")
        masked_grn = (
            MaskedGRN(4 * self.dim, dtype=self.dtype, group=self.grn_group, name="grn")
            if use_masked_grn else None
        )
        pw2 = nn.Dense(self.dim, kernel_init=pw_init, dtype=self.dtype, name="pwconv2")

        if gather_ctx is not None:
            (kind, sel), grid, h = gather_ctx
            if kind == "ids" and (h // grid) >= 8:
                # fused scatter->dwconv->gather Pallas kernel; ``sel`` is
                # ((N, K) kept patch ids, onehot P) (ops/wholeblock.py).  The
                # dummy conv call materializes the identical "dwconv" param
                # set (the traced op is dead-code-eliminated).  Only stages
                # with patch side >= 8 qualify: Mosaic requires dynamic
                # sublane store offsets provably 8-aligned, and the
                # (grid, p)-split layout that would fix p < 8 stages caps
                # their sublane utilization at p/8 — measured-worse by
                # construction, so those stages keep the XLA path below.
                from ..ops.wholeblock import dwconv7_gathered

                kept_ids, _ = sel
                n, k, pp, c = x.shape
                p = h // grid
                dwconv(jnp.zeros((1, 8, 8, c), self.dtype))
                dwp = self.variables["params"]["dwconv"]
                t = dwconv7_gathered(
                    x.reshape(n, k, p, p, c), kept_ids, dwp["kernel"],
                    dwp["bias"], grid, jax.default_backend() not in ("tpu",),
                ).reshape(x.shape)
            elif kind == "ids":
                _, P_fb = sel
                xd = scatter_visible(x, P_fb, grid, h)
                t = gather_visible(dwconv(xd), P_fb, grid)
            elif kind == "pallas":
                from ..ops import patch_select as psel

                n, k, pp, c = x.shape
                p = h // grid
                xd = psel.scatter_patches(
                    x.reshape(n, k, p, p, c), sel, p, grid, h)
                t = psel.gather_patches(dwconv(xd), sel, p, grid).reshape(x.shape)
            elif kind == "dot6":
                xd = scatter_visible6(x, sel, grid, h)
                t = gather_visible6(dwconv(xd), sel, grid)
            else:
                xd = scatter_visible(x, sel, grid, h)
                t = gather_visible(dwconv(xd), sel, grid)
            if self._folded_active(deterministic):
                # Materialize the identical param set via dummy calls (dead-
                # code eliminated; only the variables persist), then compute
                # the tail with the norms folded into the matmul kernels.
                # (full batch axis so MaskedGRN's group-divisibility check
                # sees the real batch and stays silent)
                d = t[:, :1, :1, :]
                d4 = pw1(norm(d))
                masked_grn(d4, jnp.ones(d.shape[:-1] + (1,), t.dtype))
                pw2(d4)
                out = _folded_tail(t, self.variables["params"], self.grn_group,
                                   self.gelu_approx, self.dtype)
                out = DropPath(self.drop_path, name="drop_path")(out, deterministic)
                return inp + out
            if self._spillg_active(deterministic):
                # Create the identical param set via dummy calls (dead-code
                # eliminated; only the variables persist), then hand the raw
                # params to the spill-g kernel.
                d = t[:1, :1, :1, :]
                d4 = pw1(norm(d))
                masked_grn(d4, jnp.ones(d.shape[:-1] + (1,), t.dtype))
                pw2(d4)
                DropPath(self.drop_path, name="drop_path")(d, deterministic)
                p = self.variables["params"]
                n, k, pp, c = t.shape
                from ..ops.fused_block import fused_block_mlp_spillg

                y = fused_block_mlp_spillg(
                    t.reshape(n * k * pp, c), inp.reshape(n * k * pp, c),
                    p["norm"]["scale"], p["norm"]["bias"],
                    p["pwconv1"]["kernel"], p["pwconv1"]["bias"],
                    p["grn"]["gamma"], p["grn"]["beta"],
                    p["pwconv2"]["kernel"], p["pwconv2"]["bias"],
                    jax.default_backend() not in ("tpu",),  # interpret off-TPU
                )
                return y.reshape(t.shape)
            u = gelu(pw1(norm(t)), self.gelu_approx)
            ones = jnp.ones(t.shape[:-1] + (1,), t.dtype)
            u = masked_grn(u, ones)  # all gathered rows visible; group = N axis
            out = pw2(u)
            out = DropPath(self.drop_path, name="drop_path")(out, deterministic)
            return inp + out

        x = dwconv(x)

        if self._fused_active(keep, deterministic):
            # Create the identical param set via dummy calls (the tiny traced
            # ops are dead-code-eliminated; only the variables persist), then
            # hand the raw params to the fused kernel.
            d = x[:1, :1, :1, :]
            d4 = pw1(norm(d))
            masked_grn(d4, keep[:1, :1, :1, :])
            pw2(d4)
            p = self.variables["params"]
            n, h, w, c = x.shape
            from ..ops.fused_block import fused_block_mlp

            y = fused_block_mlp(
                x.reshape(n * h * w, c),
                inp.reshape(n * h * w, c),
                keep.astype(x.dtype).reshape(n * h * w, 1),
                p["norm"]["scale"], p["norm"]["bias"],
                p["pwconv1"]["kernel"], p["pwconv1"]["bias"],
                p["grn"]["gamma"], p["grn"]["beta"],
                p["pwconv2"]["kernel"], p["pwconv2"]["bias"],
                jax.default_backend() not in ("tpu",),  # interpret off-TPU
            )
            return y.reshape(n, h, w, c)

        x = norm(x)
        x = pw1(x)
        x = gelu(x, self.gelu_approx)
        if masked_grn is not None:
            x = masked_grn(x, keep)
        else:
            x = GRN(4 * self.dim, dtype=self.dtype, name="grn")(x)
        x = pw2(x)
        if keep is not None and self.sparse:
            x = x * keep.astype(x.dtype)
        x = DropPath(self.drop_path, name="drop_path")(x, deterministic)
        return inp + x


class ConvNeXtV2(nn.Module):
    """ConvNeXtV2 backbone + classifier with a masked-encoding path."""

    patch_size: int = 8
    img_size: int = 56
    in_chans: int = 12
    num_classes: int = 1000
    depths: Sequence[int] = (3, 3, 9, 3)
    dims: Sequence[int] = (96, 192, 384, 768)
    drop_path_rate: float = 0.0
    head_init_scale: float = 1.0
    use_orig_stem: bool = False
    sparse: bool = False
    padding_mode: str = "same"  # "same" | "reference" (see module docstring)
    grn_group: int = 0  # MaskedGRN stats scope (0 = global batch)
    block_impl: str = "auto"  # masked-block implementation (see Block)
    # sparse-encoder execution strategy when the visible count is static:
    # "gathered" computes every site-local op on the visible patches only
    # (the true MinkowskiEngine equivalent, ~2.6x less work at mask 0.6);
    # "masked_dense" runs the full grid with re-masking (round-1 behavior).
    # Both are numerically identical (see tests/test_gathered_encoder.py).
    sparse_impl: str = "gathered"
    # gathered-path selection implementation: "onehot" = 0/1 selection
    # matmuls; "pallas" = DMA patch-copy kernels (ops/patch_select.py; jnp
    # fallback off-TPU); "dot6" = the same one-hot selection as a single
    # dot_general over the free 6-D view, absorbing the patch-major
    # transpose into the contraction (gather_visible6).  Bit-identical
    # outputs.  "auto" resolves to onehot: measured at atto/256 on v5e the
    # pallas copies lose (64.8 vs 48.0 ms/step) — per-patch sub-tile copies
    # can't amortize their per-grid-step overhead, while XLA fuses the
    # selection matmuls into neighbors.
    gather_impl: str = "auto"
    # run the stem's site-local tail (LN/GELU/depthwise stem/LN) on the
    # gathered visible rows instead of the dense grid.  Equivalent math
    # (tests/test_gathered_encoder.py); measured slightly SLOWER in-model
    # (50.9 vs 48.0 ms/step at atto/256 — the (N*K, p, p, C) micro-batched
    # stem conv and ragged-layout LNs cost more than the 60% site reduction
    # saves), so the default keeps the dense stem.
    stem_gathered: bool = False
    # tanh-approximate GELU everywhere (opt-in; deviates from the reference's
    # exact erf GELU by ~1e-3 relative — see --gelu_approx)
    gelu_approx: bool = False
    dtype: Dtype = jnp.float32

    @property
    def stem_stride(self) -> int:
        return self.patch_size // (2 ** (len(self.depths) - 1))

    def setup(self):
        if self.padding_mode not in ("same", "reference"):
            raise ValueError(f"padding_mode must be 'same' or 'reference', got {self.padding_mode!r}")
        if self.padding_mode == "reference" and self.sparse:
            raise ValueError("padding_mode='reference' is dense-only (masked path needs SAME alignment)")
        conv_init = init_normal02  # Minkowski std-.02 convs and dense convs alike
        if self.use_orig_stem:
            self.stem_orig_conv = nn.Conv(
                self.dims[0], (self.stem_stride, self.stem_stride),
                strides=(self.stem_stride, self.stem_stride), padding="VALID",
                kernel_init=conv_init, dtype=self.dtype,
            )
            self.stem_orig_norm = LayerNorm(self.dims[0], dtype=self.dtype)
        else:
            ref_pad = self.padding_mode == "reference"
            self.initial_conv_conv = nn.Conv(
                self.dims[0], (3, 3), padding="VALID" if ref_pad else "SAME",
                kernel_init=conv_init, dtype=self.dtype,
            )
            self.initial_conv_norm = LayerNorm(self.dims[0], dtype=self.dtype)
            s = self.stem_stride
            # reference stem pads stride//2 on both sides (convnextv2.py:114-124)
            stem_pad = ((s // 2, s // 2), (s // 2, s // 2)) if ref_pad else "VALID"
            self.stem_conv = nn.Conv(
                self.dims[0], (s, s), strides=(s, s), padding=stem_pad,
                feature_group_count=self.dims[0],
                kernel_init=init_trunc1 if self.sparse else init_normal02,
                dtype=self.dtype,
            )
            self.stem_norm = LayerNorm(self.dims[0], dtype=self.dtype)

        self.downsample_norms = [LayerNorm(self.dims[i], dtype=self.dtype) for i in range(3)]
        self.downsample_convs = [
            nn.Conv(self.dims[i + 1], (2, 2), strides=(2, 2), padding="VALID",
                    kernel_init=conv_init, dtype=self.dtype)
            for i in range(3)
        ]

        dp_rates = [
            float(r) for r in np.linspace(0.0, self.drop_path_rate, sum(self.depths))
        ]
        stages = []
        cur = 0
        for i, depth in enumerate(self.depths):
            stages.append([
                Block(self.dims[i], drop_path=dp_rates[cur + j], sparse=self.sparse,
                      grn_group=self.grn_group, block_impl=self.block_impl,
                      gelu_approx=self.gelu_approx, dtype=self.dtype)
                for j in range(depth)
            ])
            cur += depth
        self.stages = stages

        self.norm = LayerNorm(self.dims[-1], dtype=self.dtype)
        self.head = nn.Dense(
            self.num_classes,
            kernel_init=lambda key, shape, dtype: init_normal02(key, shape, dtype) * self.head_init_scale,
            bias_init=nn.initializers.zeros,
            dtype=self.dtype,
        )

    # ------------------------------------------------------------------
    # shared pieces
    # ------------------------------------------------------------------
    def _stem(self, x, keep_pixel=None, keep_stem=None):
        """initial_conv + stem (or orig stem).  ``keep_*`` are (N,H,W,1)
        visibility masks at the input / post-stem resolutions."""
        masked = keep_pixel is not None and self.sparse
        if self.use_orig_stem:
            x = self.stem_orig_conv(x)
            x = self.stem_orig_norm(x)
            if masked:
                x = x * keep_stem.astype(x.dtype)
            return x
        x = self.initial_conv_conv(x)
        x = self.initial_conv_norm(x)
        if masked:
            x = x * keep_pixel.astype(x.dtype)
        x = gelu(x, self.gelu_approx)
        x = self.stem_conv(x)
        x = self.stem_norm(x)
        if masked:
            x = x * keep_stem.astype(x.dtype)
        return x

    def _stages(self, x, keeps=None, deterministic=True, save_features=False):
        feats = []
        keep = keeps[0] if keeps is not None else None
        for blk in self.stages[0]:
            x = blk(x, keep, deterministic)
        for i in range(3):
            if save_features and i < 2:
                feats.append(x)
            x = self.downsample_norms[i](x)
            x = self.downsample_convs[i](x)
            keep = keeps[i + 1] if keeps is not None else None
            if keep is not None and self.sparse:
                x = x * keep.astype(x.dtype)
            for blk in self.stages[i + 1]:
                x = blk(x, keep, deterministic)
        if save_features:
            return x, feats
        return x

    def _stages_gathered(self, x, mask, num_visible: int, deterministic=True):
        """Stem + all four stages on the gathered visible patches (Block
        gather_ctx mode).  ``x`` is the pixel-masked *input image*: only the
        ``initial_conv`` (3x3, stride 1 — its windows cross patch borders)
        runs on the dense grid; everything after it is site-local at the
        flagship geometry (LN / GELU / the depthwise stem whose stride-s
        window equals its step / 2x2-stride-2 downsamples), so it runs on the
        ~40% visible rows.  Equivalent to the masked-dense path site-for-site
        (tests/test_gathered_encoder.py).  Returns the dense stage-4 map with
        zeros at masked sites."""
        grid = self.img_size // self.patch_size
        impl = self.gather_impl if self.gather_impl in ("pallas", "dot6") else "onehot"
        if impl == "pallas":
            from ..ops import patch_select as psel

            kept_ids, _ = visible_ids(mask, num_visible)
            sel = (impl, kept_ids)
        else:
            P = visible_onehot(mask, num_visible,
                               jnp.bfloat16 if self.dtype == jnp.bfloat16 else jnp.float32)
            sel = (impl, P)
        if self.block_impl in ("dwg", "wholeblock"):
            # blocks use the fused Pallas scatter->dwconv->gather (kind
            # "ids") where the patch side allows it, with the onehot
            # selection as the in-kind fallback; the stem gather and final
            # scatter keep ``sel``.
            kept_blk, _ = visible_ids(mask, num_visible)
            P_blk = visible_onehot(
                mask, num_visible,
                jnp.bfloat16 if self.dtype == jnp.bfloat16 else jnp.float32)
            block_sel = ("ids", (kept_blk, P_blk))
        else:
            block_sel = sel

        def gather(xd, p):
            if impl == "pallas":
                xg = psel.gather_patches(xd, kept_ids, p, grid)
                return xg.reshape(xg.shape[0], xg.shape[1], p * p, xd.shape[-1])
            if impl == "dot6":
                return gather_visible6(xd, P, grid)
            return gather_visible(xd, P, grid)

        # ---- stem: dense (default) or on visible rows (reference _stem
        # order; masking is a no-op on gathered rows so the mask-multiplies
        # drop out) ----
        p_in = self.img_size // grid
        s = self.stem_stride
        h = self.img_size // s
        if not self.stem_gathered:
            keep_flat = 1.0 - mask.astype(jnp.float32)
            keep_pixel = upsample_mask(keep_flat, grid, self.img_size)
            keep_stem = upsample_mask(keep_flat, grid, h)
            xg = gather(self._stem(x, keep_pixel, keep_stem), h // grid)
        elif self.use_orig_stem:
            # (s, s) stride-s conv is patch-local: gather the raw input
            xg = gather(x, p_in)
            n, k = xg.shape[0], xg.shape[1]
            y = self.stem_orig_conv(xg.reshape(n * k, p_in, p_in, xg.shape[-1]))
            y = self.stem_orig_norm(y)
            p0 = p_in // s
            xg = y.reshape(n, k, p0 * p0, self.dims[0])
        else:
            xg = gather(self.initial_conv_conv(x), p_in)
            n, k = xg.shape[0], xg.shape[1]
            xg = gelu(self.initial_conv_norm(xg), self.gelu_approx)
            y = self.stem_conv(xg.reshape(n * k, p_in, p_in, self.dims[0]))
            y = self.stem_norm(y)
            p0 = p_in // s
            xg = y.reshape(n, k, p0 * p0, self.dims[0])
        for blk in self.stages[0]:
            xg = blk(xg, deterministic=deterministic, gather_ctx=(block_sel, grid, h))
        for i in range(3):
            n, k, pp, c = xg.shape
            p = h // grid
            y = self.downsample_norms[i](xg)
            y = self.downsample_convs[i](y.reshape(n * k, p, p, c))
            h //= 2
            p //= 2
            xg = y.reshape(n, k, p * p, y.shape[-1])
            for blk in self.stages[i + 1]:
                xg = blk(xg, deterministic=deterministic, gather_ctx=(block_sel, grid, h))
        n, k, pp, c = xg.shape
        p = h // grid
        if impl == "pallas":
            return psel.scatter_patches(xg.reshape(n, k, p, p, c), kept_ids, p, grid, h)
        if impl == "dot6":
            return scatter_visible6(xg, P, grid, h)
        return scatter_visible(xg, P, grid, h)

    # ------------------------------------------------------------------
    # public paths
    # ------------------------------------------------------------------
    def encode(self, x, mask, deterministic: bool = True, num_visible: int | None = None):
        """Masked encoding for pretraining.  ``mask``: (N, L), 1 = removed
        (reference convention).  Returns the stage-4 feature map with masked
        sites zeroed (the ``.dense()`` of the sparse output,
        convnextv2_sparse.py:218).  ``num_visible``: static per-row visible
        count; when given (the training path — gen_random_mask keeps exactly
        len_keep patches) and ``sparse_impl == "gathered"``, the encoder
        computes on the visible patches only."""
        grid = self.img_size // self.patch_size
        keep_flat = 1.0 - mask.astype(jnp.float32)
        keep_pixel = upsample_mask(keep_flat, grid, self.img_size)
        x = x * keep_pixel.astype(x.dtype)

        if not self.sparse:
            # reference leaky dense path: mask input only (convnextv2.py:185-203)
            x = self._stem(x)
            return self._stages(x, None, deterministic)

        if num_visible is not None and self.sparse_impl == "gathered":
            # stem runs inside the gathered path (on visible rows)
            return self._stages_gathered(x, mask, num_visible, deterministic)

        sizes = [self.img_size // self.stem_stride // (2 ** i) for i in range(4)]
        keeps = [upsample_mask(keep_flat, grid, s) for s in sizes]
        x = self._stem(x, keep_pixel, keeps[0])
        return self._stages(x, keeps, deterministic)

    def forward_features(self, x, deterministic: bool = True):
        x = self._stem(x)
        x = self._stages(x, None, deterministic)
        return self.norm(jnp.mean(x, axis=(1, 2)))  # GAP then LN (convnextv2.py:172-174)

    def __call__(self, x, mask=None, deterministic: bool = True):
        if mask is not None:
            return self.encode(x, mask, deterministic)
        x = self.forward_features(x, deterministic)
        return self.head(x)


def _factory(depths, dims):
    def build(**kwargs):
        kwargs.setdefault("depths", depths)
        kwargs.setdefault("dims", dims)
        return ConvNeXtV2(**kwargs)

    return build


convnextv2_atto = _factory((2, 2, 6, 2), (40, 80, 160, 320))
convnextv2_femto = _factory((2, 2, 6, 2), (48, 96, 192, 384))
convnextv2_pico = _factory((2, 2, 6, 2), (64, 128, 256, 512))
convnextv2_nano = _factory((2, 2, 8, 2), (80, 160, 320, 640))
convnextv2_tiny = _factory((3, 3, 9, 3), (96, 192, 384, 768))
convnextv2_base = _factory((3, 3, 27, 3), (128, 256, 512, 1024))
convnextv2_large = _factory((3, 3, 27, 3), (192, 384, 768, 1536))
convnextv2_huge = _factory((3, 3, 27, 3), (352, 704, 1408, 2816))
