#!/usr/bin/env python
"""Per-chip batch-size scaling of the flagship pretrain step (atto/56 or
tiny/112): times the full jitted training step (the only trustworthy
comparison per this project's measured history) at several per-chip batch
sizes and reports samples/s/chip for each.

Rationale: the step is HBM-bound (ROOFLINE.json: 82% of calibrated
achievable bandwidth at 256/chip) but carries fixed per-op overheads and
small late-stage shapes; a larger per-chip batch can amortize those without
changing the math (LR scaling keeps eff-batch semantics, as in the
reference's blr rule).

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/ab_batch.py \
       [atto56|tiny112] [pcb ...]
"""
from __future__ import annotations

import functools
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

CONFIGS = {
    "atto56": ("convnextv2_atto", 56, 8),
    "tiny112": ("convnextv2_tiny", 112, 16),
}


def time_pcb(config: str, pcb: int) -> float:
    import jax
    import jax.numpy as jnp

    from bench import _pretrain_setup
    from mmearth_tpu.parallel import mesh as mesh_lib

    name, img, patch = CONFIGS[config]
    model, mesh, state, step, batch_np, batch, n_chips = _pretrain_setup(
        img, patch, name, pcb)
    data = mesh_lib.shard_batch(batch_np, mesh)
    rng = jax.random.PRNGKey(0)
    K = 30

    @functools.partial(jax.jit, donate_argnums=(0,))
    def multi_step(state, data, rng):
        def body(carry, i):
            st, acc = carry
            st, metrics = step(st, data, jax.random.fold_in(rng, i))
            return (st, acc + metrics["loss"]), None

        (state, total), _ = jax.lax.scan(body, (state, jnp.float32(0)),
                                         jnp.arange(K))
        return state, total

    state, total = multi_step(state, data, rng)  # compile + warmup
    float(total)
    best = float("inf")
    for i in range(4):
        t0 = time.perf_counter()
        state, total = multi_step(state, data, jax.random.fold_in(rng, i))
        float(total)
        best = min(best, (time.perf_counter() - t0) / K)
    sps = batch / best / n_chips
    print(f"{config} pcb={pcb:5d}: {best * 1e3:7.2f} ms/step  "
          f"{sps:8.1f} samples/s/chip", flush=True)
    return sps


def main():
    from mmearth_tpu.utils.compile_cache import enable_compilation_cache

    enable_compilation_cache()
    config = sys.argv[1] if len(sys.argv) > 1 else "atto56"
    pcbs = [int(a) for a in sys.argv[2:]] or (
        [128, 256, 512, 1024] if config == "atto56" else [32, 64, 128])
    results = {pcb: time_pcb(config, pcb) for pcb in pcbs}
    best = max(results, key=results.get)
    print(f"best: pcb={best} at {results[best]:.1f} samples/s/chip")


if __name__ == "__main__":
    main()
