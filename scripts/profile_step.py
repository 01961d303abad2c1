#!/usr/bin/env python
"""Trace-attribute one bench config's training step on the current backend.

Captures a jax.profiler trace of K chained steps and maps device time back to
model-level op names (utils/profiling.py::attribute_trace) — the view that
drove the round-2/3 atto/56 optimization work, here runnable for every bench
config (the tiny/112 flagship was never profiled before round 3).

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/profile_step.py tiny112
"""
from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

def main():
    config = sys.argv[1] if len(sys.argv) > 1 else "tiny112"
    log_dir = sys.argv[2] if len(sys.argv) > 2 else f"/tmp/mmearth_trace_{config}"
    top = int(sys.argv[3]) if len(sys.argv) > 3 else 40

    import jax
    import jax.numpy as jnp

    from bench import BENCH_CONFIGS, _pretrain_setup
    from mmearth_tpu.parallel import mesh as mesh_lib
    from mmearth_tpu.utils import profiling

    name, img, patch, pcb = BENCH_CONFIGS[config]
    model, mesh, state, step, batch_np, batch, n_chips = _pretrain_setup(
        img, patch, name, pcb)
    data = mesh_lib.shard_batch(batch_np, mesh)
    rng = jax.random.PRNGKey(0)
    K = 10

    # no donation: attribute_trace re-lowers with the same args afterwards
    @jax.jit
    def multi_step(state, data, rng):
        def scan_body(carry, i):
            st, acc = carry
            st, m = step(st, data, jax.random.fold_in(rng, i))
            return (st, acc + m["loss"]), None

        (state, total), _ = jax.lax.scan(
            scan_body, (state, jnp.float32(0)), jnp.arange(K))
        return state, total

    # compile + warm
    state2, total = multi_step(state, data, rng)
    float(total)

    t0 = time.perf_counter()
    with profiling.trace(log_dir):
        state2, total = multi_step(state2, data, jax.random.fold_in(rng, 1))
        float(total)
    dt = (time.perf_counter() - t0) / K
    print(f"{config}: {dt*1e3:.2f} ms/step (traced; relay overhead included), "
          f"{batch/dt/n_chips:.1f} samples/s/chip")

    # attribute_trace returns ALL buckets (only the printout is top-limited),
    # so this total covers every attributed device op, not just the top rows
    rows = profiling.attribute_trace(log_dir, multi_step, state, data, rng, top=top)
    total_ms = sum(ms for _, ms in rows)
    print(f"\ntotal attributed device time: {total_ms:.1f} ms over {K} steps "
          f"({total_ms/K:.2f} ms/step)")


if __name__ == "__main__":
    main()
