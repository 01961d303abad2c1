#!/usr/bin/env python
"""TPU convergence gate (VERDICT r2 item 8): a ~500-step *real* training run
on the attached chip asserting (a) the loss decreases by more than 50% and
(b) the measured samples/s is within 10% of the committed bench number —
catching any silent regression between bench-mode and train-mode execution.

Run on the real chip:
  PYTHONPATH=/root/repo:/root/.axon_site python scripts/tpu_convergence_gate.py

Exits nonzero on failure.  Part of the /verify drive recipes.
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
SPS_TOLERANCE = 0.10
LOSS_DROP = 0.50


def main():
    import jax
    import jax.numpy as jnp

    from mmearth_tpu.utils.compile_cache import enable_compilation_cache

    enable_compilation_cache()

    from bench import _pretrain_setup
    from mmearth_tpu.parallel import mesh as mesh_lib

    from mmearth_tpu.train import optim as optim_lib
    from mmearth_tpu.train.schedule import warmup_cosine
    from mmearth_tpu.train.step import TrainState

    model, mesh, state, step, batch_np, batch, n_chips = _pretrain_setup(
        56, 8, "convnextv2_atto", 256)
    # bench's _pretrain_setup builds the production 200-epoch schedule, whose
    # 40-epoch warmup leaves the LR at ~2e-6 by step 500 — useless for a
    # convergence check.  Rebuild the optimizer with the same chain but a
    # gate-scale schedule (full base LR after a 50-step warmup); the step
    # function and its compute cost are unchanged, so the sps check still
    # compares like-for-like with the committed bench number.
    gate_sched = warmup_cosine(1.5e-4 * batch / 256, 0.0, STEPS, 0.1 * STEPS, 1)
    tx = optim_lib.make_pretrain_optimizer(state.params, gate_sched)
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

    # warmup/compile
    state, losses = chunk(state, data, rng)
    first_losses = [float(x) for x in losses[:5]]
    t0 = time.perf_counter()
    done = CHUNK
    while done < STEPS:
        state, losses = chunk(state, data, jax.random.fold_in(rng, done))
        done += CHUNK
    last = [float(x) for x in losses[-5:]]
    dt = time.perf_counter() - t0
    sps = (done - CHUNK) * batch / dt / n_chips

    start, end = sum(first_losses) / 5, sum(last) / 5
    drop = 1.0 - end / start

    bench_sps = None
    try:
        for p in sorted(Path(__file__).parent.parent.glob("BENCH_r*.json"), reverse=True):
            rec = json.loads(p.read_text())
            bench_sps = (rec.get("parsed") or {}).get("value") or rec.get("value")
            if bench_sps:
                break
    except Exception:
        pass

    report = {
        "steps": done,
        "loss_first5_mean": round(start, 4),
        "loss_last5_mean": round(end, 4),
        "loss_drop": round(drop, 4),
        "train_mode_sps_per_chip": round(sps, 1),
        "bench_sps_per_chip": bench_sps,
    }
    print(json.dumps(report, indent=1))

    ok = True
    if drop < LOSS_DROP:
        print(f"FAIL: loss dropped only {drop:.1%} (< {LOSS_DROP:.0%})")
        ok = False
    if bench_sps and abs(sps - bench_sps) / bench_sps > SPS_TOLERANCE:
        print(f"FAIL: train-mode sps {sps:.0f} deviates >{SPS_TOLERANCE:.0%} "
              f"from bench {bench_sps}")
        ok = False
    if ok:
        print("convergence gate PASSED")
    report["passed"] = ok
    report["device_kind"] = jax.devices()[0].device_kind
    report["ts"] = time.time()
    (Path(__file__).parent.parent / "GATE.json").write_text(
        json.dumps(report, indent=1))
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
