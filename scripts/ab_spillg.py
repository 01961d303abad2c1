#!/usr/bin/env python
"""Full-step in-process A/B of block_impl: xla (auto) vs spillg.

Per this project's measured history, ONLY the full training step timed
in-process is a trustworthy comparison (standalone kernel wins have reversed
in-model every time).  Also asserts the two impls agree numerically on the
loss of the first step.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/ab_spillg.py
"""
from __future__ import annotations

import functools
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))


def time_impl(impl: str, check_loss=None):
    import jax
    import jax.numpy as jnp

    from bench import _pretrain_setup
    from mmearth_tpu.parallel import mesh as mesh_lib

    model, mesh, state, step, batch_np, batch, n_chips = _pretrain_setup(
        56, 8, "convnextv2_atto", 256, block_impl=impl)
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

    # one-step loss for numerical agreement between impls
    sstep = jax.jit(step)
    _, m0 = sstep(state, data, rng)
    loss0 = float(m0["loss"])

    state, total = multi_step(state, data, rng)
    float(total)
    best = float("inf")
    for i in range(4):
        t0 = time.perf_counter()
        state, total = multi_step(state, data, jax.random.fold_in(rng, i))
        float(total)
        best = min(best, (time.perf_counter() - t0) / K)
    ms = best * 1e3
    sps = batch / best / n_chips
    print(f"{impl:8s}: {ms:6.2f} ms/step  {sps:7.1f} samples/s/chip  loss0={loss0:.5f}")
    return ms, loss0


def main():
    ms_x, loss_x = time_impl("auto")
    ms_s, loss_s = time_impl("spillg")
    rel = abs(loss_s - loss_x) / abs(loss_x)
    print(f"loss agreement: rel {rel:.2e}")
    print(f"spillg vs xla: {ms_s:.2f} vs {ms_x:.2f} ms "
          f"({'WIN' if ms_s < ms_x else 'LOSS'} {abs(ms_s-ms_x)/ms_x:.1%})")


if __name__ == "__main__":
    main()
