#!/usr/bin/env python
"""bf16 training-fidelity measurement (VERDICT r3 item 4).

The shipped flagship default is bf16 activations/compute with f32
params/grads/optimizer state; the trajectory-parity tests run f32.  This
script runs the 500-step convergence-gate config TWICE — bf16 vs f32
compute — with the same seed and the same synthetic data, records both
per-step loss curves, and reports the divergence a user can cite
("bf16 diverges X% after 500 steps").  The reference's analogue is AMP
opt-in (/root/reference/engine_pretrain.py:63); its default is f32.

Run on the real chip:
  PYTHONPATH=/root/repo:/root/.axon_site python scripts/bf16_fidelity.py
Writes BF16_FIDELITY.json.
"""
from __future__ import annotations

import functools
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

STEPS = 500
CHUNK = 50


def run(dtype_name: str):
    import jax
    import jax.numpy as jnp

    from bench import _pretrain_setup
    from mmearth_tpu.parallel import mesh as mesh_lib
    from mmearth_tpu.train import optim as optim_lib
    from mmearth_tpu.train.schedule import warmup_cosine
    from mmearth_tpu.train.step import TrainState

    dtype = {"bf16": jnp.bfloat16, "f32": jnp.float32}[dtype_name]
    model, mesh, state, step, batch_np, batch, n_chips = _pretrain_setup(
        56, 8, "convnextv2_atto", 256, dtype=dtype)
    # gate-scale schedule (see tpu_convergence_gate.py): full base LR after a
    # 50-step warmup so the run actually trains within 500 steps
    sched = warmup_cosine(1.5e-4 * batch / 256, 0.0, STEPS, 0.1 * STEPS, 1)
    tx = optim_lib.make_pretrain_optimizer(state.params, sched)
    state = TrainState.create(state.params, tx)
    data = mesh_lib.shard_batch(batch_np, mesh)
    rng = jax.random.PRNGKey(0)

    @functools.partial(jax.jit, donate_argnums=(0,))
    def chunk(state, data, rng):
        def body(carry, i):
            st, _ = carry
            st, metrics = step(st, data, jax.random.fold_in(rng, i))
            return (st, metrics["loss"]), metrics["loss"]

        (state, _), losses = jax.lax.scan(
            body, (state, jnp.float32(0)), jnp.arange(CHUNK))
        return state, losses

    curve = []
    t0 = time.perf_counter()
    done = 0
    while done < STEPS:
        # fold_in(done) gives every step i its globally-unique mask/crop key
        # rng_done+i — identical across the two dtype runs
        state, losses = chunk(state, data, jax.random.fold_in(rng, done))
        curve.extend(float(x) for x in losses)
        done += CHUNK
    dt = time.perf_counter() - t0
    print(f"[{dtype_name}] {done} steps in {dt:.0f}s; "
          f"first5={sum(curve[:5])/5:.4f} last5={sum(curve[-5:])/5:.4f}")
    return curve


def main():
    curves = {name: run(name) for name in ("bf16", "f32")}
    b, f = curves["bf16"], curves["f32"]
    rel = [abs(bi - fi) / abs(fi) for bi, fi in zip(b, f)]
    last5_b = sum(b[-5:]) / 5
    last5_f = sum(f[-5:]) / 5
    report = {
        "steps": STEPS,
        "config": "flagship atto/256 @ 56-8, gathered sparse encoder, "
                  "gate-scale LR schedule, same seed + synthetic data",
        "final5_mean_bf16": round(last5_b, 4),
        "final5_mean_f32": round(last5_f, 4),
        "final_rel_divergence": round(abs(last5_b - last5_f) / last5_f, 4),
        "max_per_step_rel_divergence": round(max(rel), 4),
        "rel_divergence_at": {str(s): round(rel[s - 1], 4)
                              for s in (1, 10, 50, 100, 250, 500)},
        "curve_every_25": {
            "bf16": [round(x, 3) for x in b[::25]],
            "f32": [round(x, 3) for x in f[::25]],
        },
        "ts": time.time(),
    }
    print(json.dumps({k: v for k, v in report.items() if k != "curve_every_25"},
                     indent=1))
    (Path(__file__).parent.parent / "BF16_FIDELITY.json").write_text(
        json.dumps(report, indent=1))


if __name__ == "__main__":
    main()
