#!/usr/bin/env python
"""TPU convergence gate (VERDICT r2 item 8; r4 item 4 adds --input mmpack).

``--input synthetic`` (default): a ~500-step *real* training run on the
attached chip asserting (a) the loss decreases by more than 50% and (b) the
measured samples/s is within 10% of the committed bench number — catching any
silent regression between bench-mode and train-mode execution.

``--input mmpack``: the same 500 training steps but every batch comes OFF
DISK through the production input path — synthetic-content mmpack ->
PackedLoader (C++ gather core, quasi_random order, reshuffled epochs) ->
shard_batch -> chained dispatch -> train step.  This is the first on-chip
run whose trained-on data round-trips the real loader (r4 verdict weak #4):
it asserts the loss drop AND reports sps-through-loader against the measured
H2D ceiling (INPUT_BENCH.json: the axon relay's ~48 MB/s H2D link bounds
this at ~110 samples/s — an environment artifact, see bench.py's note; the
gate uses per-chip batch 32 so 500 steps finish in minutes).  Matches the
reference's FFCV-fed epoch loop (/root/reference/engine_pretrain.py:21-66).

Run on the real chip:
  PYTHONPATH=/root/repo:/root/.axon_site python scripts/tpu_convergence_gate.py
  PYTHONPATH=/root/repo:/root/.axon_site python scripts/tpu_convergence_gate.py --input mmpack

Exits nonzero on failure.  Part of the /verify drive recipes.
"""
from __future__ import annotations

import argparse
import functools
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

REPO = Path(__file__).parent.parent
CHUNK = 50
SPS_TOLERANCE = 0.10
LOSS_DROP = 0.50


def _gate_state(steps: int, per_chip_batch: int, lr: float):
    """Bench's production state with a gate-scale schedule: full base LR
    after a short warmup (the production 200-epoch schedule would leave LR
    at ~2e-6 by step 500 — useless for a convergence check).  ``lr`` is
    fixed (not the batch/256 rule) so the 500-step drop is comparable
    across gate configs."""
    from bench import _pretrain_setup
    from mmearth_tpu.train import optim as optim_lib
    from mmearth_tpu.train.schedule import warmup_cosine
    from mmearth_tpu.train.step import TrainState

    model, mesh, state, step, batch_np, batch, n_chips = _pretrain_setup(
        56, 8, "convnextv2_atto", per_chip_batch)
    sched = warmup_cosine(lr, 0.0, steps, 0.1 * steps, 1)
    tx = optim_lib.make_pretrain_optimizer(state.params, sched)
    state = TrainState.create(state.params, tx)
    return model, mesh, state, step, batch_np, batch, n_chips


def _write_gate(record: dict, key: str | None):
    """Synthetic gate keeps the legacy flat layout; mmpack nests under its
    own key so both records coexist in GATE.json."""
    path = REPO / "GATE.json"
    try:
        out = json.loads(path.read_text())
    except Exception:
        out = {}
    if key is None:
        sub = {k: out[k] for k in ("mmpack_input",) if k in out}
        out = {**record, **sub}
    else:
        out[key] = record
    path.write_text(json.dumps(out, indent=1))


def gate_synthetic(steps: int):
    import jax
    import jax.numpy as jnp

    from mmearth_tpu.parallel import mesh as mesh_lib

    model, mesh, state, step, batch_np, batch, n_chips = _gate_state(
        steps, 256, 1.5e-4)
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
    while done < steps:
        state, losses = chunk(state, data, jax.random.fold_in(rng, done))
        done += CHUNK
    last = [float(x) for x in losses[-5:]]
    dt = time.perf_counter() - t0
    sps = (done - CHUNK) * batch / dt / n_chips

    start, end = sum(first_losses) / 5, sum(last) / 5
    drop = 1.0 - end / start

    bench_sps = None
    try:
        for p in sorted(REPO.glob("BENCH_r*.json"), reverse=True):
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
    _write_gate(report, key=None)
    return ok


def gate_mmpack(steps: int, per_chip_batch: int, n_samples: int):
    import numpy as np
    import jax
    import jax.numpy as jnp

    from mmearth_tpu.configs import modalities as M
    from mmearth_tpu.data.loader import PackedDataset, PackedLoader
    from mmearth_tpu.data.pack import pack_mmearth
    from mmearth_tpu.data.synthetic import generate
    from mmearth_tpu.parallel import mesh as mesh_lib
    from mmearth_tpu.train.pretrain import _chunked_batches

    root = Path("/tmp/mmearth_bench")
    synth = root / "synth"
    if not (synth / "data_synth.h5").exists():
        print(f"# generating synthetic MMEarth ({n_samples} samples)...")
        generate(synth, n=n_samples, tile=64, seed=0)
    mods = {**M.INP_MODALITIES, **M.OUT_MODALITIES}
    packed = pack_mmearth(synth, root / "pack", mods, splits=("train",))[0]
    ds = PackedDataset(packed)

    model, mesh, state, step, _, batch, n_chips = _gate_state(
        steps, per_chip_batch, 1.5e-4)
    loader = PackedLoader(ds, batch_size=batch, shuffle=True, drop_last=True,
                          order="quasi_random", seed=1)
    k = 8  # steps per dispatch (chained), as in production pipelined training

    @functools.partial(jax.jit, donate_argnums=(0,))
    def chained(state, batches, rng):
        def body(st, i):
            b = jax.tree_util.tree_map(lambda x: x[i], batches)
            st, m = step(st, b, jax.random.fold_in(rng, i))
            return st, m["loss"]

        return jax.lax.scan(body, state, jnp.arange(k))

    rng = jax.random.PRNGKey(0)
    first_losses, last_losses = None, None
    done, epoch = 0, 0
    t_start = t0 = time.perf_counter()
    compile_s = None
    while done < steps:
        loader.set_epoch(epoch) if hasattr(loader, "set_epoch") else None
        for host_batch in _chunked_batches(iter(loader), k):
            if host_batch["sentinel2"].ndim == 4:
                continue  # tail group smaller than k
            data = mesh_lib.shard_batch(host_batch, mesh, axis=1)
            state, losses = chained(state, data, jax.random.fold_in(rng, done))
            if first_losses is None:
                last_losses = [float(x) for x in losses]
                first_losses = last_losses[:5]
                compile_s = time.perf_counter() - t0
                t0 = time.perf_counter()  # sps excludes the compile dispatch
                done_at_t0 = done + k
            else:
                last_losses = [float(x) for x in losses]
            done += k
            if done >= steps:
                break
        epoch += 1
    dt = time.perf_counter() - t0
    sps = (done - done_at_t0) * batch / dt / n_chips

    start, end = sum(first_losses) / 5, sum(last_losses[-5:]) / 5
    drop = 1.0 - end / start

    # context: the measured ceilings of this harness's host->device link
    h2d_bound = None
    try:
        rec = json.loads((REPO / "INPUT_BENCH.json").read_text())
        h2d_bound = rec.get("mmpack", {}).get("h2d_bound_sps")
    except Exception:
        pass

    report = {
        "steps": done,
        "per_chip_batch": per_chip_batch,
        "pack_samples": ds.count,
        "epochs_consumed": epoch,
        "loss_first5_mean": round(start, 4),
        "loss_last5_mean": round(end, 4),
        "loss_drop": round(drop, 4),
        "sps_through_loader_per_chip": round(sps, 1),
        "h2d_bound_sps": h2d_bound,
        "compile_dispatch_s": round(compile_s, 1),
        "wall_s": round(time.perf_counter() - t_start, 1),
        "note": ("500 on-chip training steps fed from disk through "
                 "PackedLoader (quasi_random, reshuffled epochs) -> "
                 "shard_batch -> 8-step chained dispatch.  Throughput is "
                 "bounded by this harness's relay H2D link (~48 MB/s), not "
                 "by the loader or the chip — see INPUT_BENCH.json."),
    }
    print(json.dumps(report, indent=1))

    ok = True
    if drop < LOSS_DROP:
        print(f"FAIL: loss dropped only {drop:.1%} (< {LOSS_DROP:.0%})")
        ok = False
    if h2d_bound and sps < 0.25 * h2d_bound:
        print(f"FAIL: sps-through-loader {sps:.0f} < 25% of the measured "
              f"H2D ceiling {h2d_bound} — input path regressed")
        ok = False
    if ok:
        print("mmpack-input convergence gate PASSED")
    report["passed"] = ok
    report["device_kind"] = jax.devices()[0].device_kind
    report["ts"] = time.time()
    _write_gate(report, key="mmpack_input")
    return ok


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", choices=["synthetic", "mmpack"],
                    default="synthetic")
    ap.add_argument("--steps", type=int, default=500)
    ap.add_argument("--per-chip-batch", type=int, default=32,
                    help="mmpack mode only (synthetic pins 256 to compare "
                         "with the committed bench number)")
    ap.add_argument("--n-samples", type=int, default=4096,
                    help="mmpack mode: synthetic pack size")
    args = ap.parse_args()

    from mmearth_tpu.utils.compile_cache import enable_compilation_cache

    enable_compilation_cache()

    if args.input == "synthetic":
        ok = gate_synthetic(args.steps)
    else:
        ok = gate_mmpack(args.steps, args.per_chip_batch, args.n_samples)
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
