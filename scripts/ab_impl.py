#!/usr/bin/env python
"""Full-step in-process A/B of two ``block_impl`` settings (default:
auto vs remat).

Per this project's measured history, ONLY the full training step timed
in-process is a trustworthy comparison (standalone kernel wins have reversed
in-model every time).  Also asserts the two impls agree numerically on the
loss of the first step.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/ab_impl.py \
       [impl_a] [impl_b] [atto56|tiny112]
"""
from __future__ import annotations

import functools
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

CONFIGS = {
    "atto56": ("convnextv2_atto", 56, 8, 256),
    "tiny112": ("convnextv2_tiny", 112, 16, 64),
}


def time_impl(impl: str, config: str):
    import jax
    import jax.numpy as jnp

    from bench import _pretrain_setup
    from mmearth_tpu.parallel import mesh as mesh_lib

    name, img, patch, pcb = CONFIGS[config]
    # "gather=<impl>" selects the gathered-path selection implementation
    # (ConvNeXtV2.gather_impl) instead of the block tail implementation
    kw = ({"gather_impl": impl.split("=", 1)[1]} if impl.startswith("gather=")
          else {"block_impl": impl})
    model, mesh, state, step, batch_np, batch, n_chips = _pretrain_setup(
        img, patch, name, pcb, **kw)
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
    impl_a = sys.argv[1] if len(sys.argv) > 1 else "auto"
    impl_b = sys.argv[2] if len(sys.argv) > 2 else "remat"
    config = sys.argv[3] if len(sys.argv) > 3 else "atto56"
    ms_a, loss_a = time_impl(impl_a, config)
    ms_b, loss_b = time_impl(impl_b, config)
    rel = abs(loss_b - loss_a) / abs(loss_a)
    print(f"loss agreement: rel {rel:.2e}")
    print(f"{impl_b} vs {impl_a}: {ms_b:.2f} vs {ms_a:.2f} ms "
          f"({'WIN' if ms_b < ms_a else 'LOSS'} {abs(ms_b-ms_a)/ms_a:.1%})")


if __name__ == "__main__":
    main()
