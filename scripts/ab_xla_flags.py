#!/usr/bin/env python
"""A/B the flagship step under candidate XLA/libtpu compiler flags.

The 12th perf lever (ROADMAP.md): everything expressible at the JAX level
has been measured (11 alternatives lost to XLA's default lowering), so the
remaining knobs are the compiler's own.  Candidates are the scheduler /
vmem / fusion flags the public TPU perf playbooks (MaxText et al.) ship;
each one is measured in a FRESH subprocess (flags are read once at
startup) with the persistent compile cache disabled (flags change the
executable; a cache hit would silently measure the baseline).

Delivery channel: `LIBTPU_INIT_ARGS`, NOT `XLA_FLAGS`.  Under the axon
relay the local process runs a CPU XLA client that fatals at parse time on
TPU-only flags in XLA_FLAGS (`Unknown flag in XLA_FLAGS`) — the flags never
reach the remote TPU compiler.  `LIBTPU_INIT_ARGS` is forwarded to the
remote libtpu instead: verified by the canary below, whose
remote-compile-time "scoped vmem" error proves the channel works.

Includes a propagation canary: `--xla_tpu_scoped_vmem_limit_kib=4` is small
enough that, if the flag reaches the backend compiler, the step must either
slow down hard or fail to compile with a backend (not local-parse) error.
If the canary measures == baseline, the relay does not forward the flags
and the whole sweep is inconclusive — the JSON says which.

Run (parent, on the real chip; serialize with other TPU jobs):
  PYTHONPATH=/root/repo:/root/.axon_site python scripts/ab_xla_flags.py
Writes XLA_FLAGS_AB.json.
"""
from __future__ import annotations

import json
import os
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).parent.parent
sys.path.insert(0, str(REPO))

K = int(os.environ.get("AB_XLA_K", "30"))  # chained steps per jit call
BATCH = int(os.environ.get("AB_XLA_BATCH", "256"))  # per-chip batch

CANDIDATES = {
    "baseline": "",
    # canary: tiny scoped vmem must hurt IF flags reach the backend
    "canary_vmem4": "--xla_tpu_scoped_vmem_limit_kib=4",
    "lhs_on": "--xla_tpu_enable_latency_hiding_scheduler=true",
    "lhs_off": "--xla_tpu_enable_latency_hiding_scheduler=false",
    "vmem_64m": "--xla_tpu_scoped_vmem_limit_kib=65536",
    "vmem_96m": "--xla_tpu_scoped_vmem_limit_kib=98304",
    "no_rwb_fusion": "--xla_tpu_rwb_fusion=false",
    "async_done_sched": "--xla_tpu_enable_all_experimental_scheduler_features=true",
}


def child_measure() -> None:
    import functools

    import jax

    if os.environ.get("JAX_PLATFORMS"):
        # the env var alone hangs on axon plugin init — pin in-process
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
    import jax.numpy as jnp

    from bench import _pretrain_setup
    from mmearth_tpu.parallel import mesh as mesh_lib

    model, mesh, state, step, batch_np, batch, n_chips = _pretrain_setup(
        56, 8, "convnextv2_atto", BATCH)
    data = mesh_lib.shard_batch(batch_np, mesh)
    rng = jax.random.PRNGKey(0)

    @functools.partial(jax.jit, donate_argnums=(0,))
    def multi_step(state, data, rng):
        def body(carry, acc_i):
            st, acc = carry
            st, metrics = step(st, data, jax.random.fold_in(rng, acc_i))
            return (st, acc + metrics["loss"]), None

        (state, total), _ = jax.lax.scan(
            body, (state, jnp.float32(0)), jnp.arange(K))
        return state, total

    state, total = multi_step(state, data, rng)
    float(total)  # force completion (block_until_ready is a no-op on axon)

    dt = float("inf")
    for i in range(4):
        t0 = time.perf_counter()
        state, total = multi_step(state, data, jax.random.fold_in(rng, i))
        float(total)
        dt = min(dt, (time.perf_counter() - t0) / K)
    print(json.dumps({"ms_per_step": round(dt * 1e3, 2),
                      "loss": float(total) / K}))


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "--child":
        child_measure()
        return

    results, base_ms = {}, None
    for name, flags in CANDIDATES.items():
        env = dict(os.environ)
        env["MMEARTH_TPU_NO_COMPILE_CACHE"] = "1"
        if flags:
            prev = env.get("LIBTPU_INIT_ARGS", "")
            env["LIBTPU_INIT_ARGS"] = (prev + " " + flags).strip()
        t0 = time.perf_counter()
        proc = subprocess.run(
            [sys.executable, __file__, "--child"],
            env=env, capture_output=True, text=True, timeout=1200)
        wall = time.perf_counter() - t0
        line = proc.stdout.strip().splitlines()[-1] if proc.stdout.strip() else ""
        try:
            rec = json.loads(line)
            rec["wall_s"] = round(wall, 1)
        except (json.JSONDecodeError, ValueError):
            rec = {"error": (proc.stderr.strip().splitlines()[-1]
                             if proc.stderr.strip() else f"rc={proc.returncode}"),
                   "wall_s": round(wall, 1)}
        rec["flags"] = flags
        results[name] = rec
        if name == "baseline" and "ms_per_step" in rec:
            base_ms = rec["ms_per_step"]
        delta = ""
        if base_ms and "ms_per_step" in rec:
            delta = f"  ({(rec['ms_per_step'] / base_ms - 1) * 100:+.1f}%)"
        print(f"{name:>18}: {rec.get('ms_per_step', rec.get('error'))}{delta}",
              flush=True)

    canary, base = results.get("canary_vmem4", {}), results.get("baseline", {})
    # A local-parse fatal means the flag never left this host — NOT propagation.
    backend_error = ("error" in canary
                     and "Unknown flag in XLA_FLAGS" not in canary["error"])
    propagated = (backend_error
                  or ("ms_per_step" in canary and "ms_per_step" in base
                      and abs(canary["ms_per_step"] / base["ms_per_step"] - 1) > 0.10))
    out = {
        "config": f"atto/256 @ 56-8, {K}-step chained jit, best of 4 rounds",
        "flags_reach_backend": propagated,
        "results": results,
        "ts": time.time(),
    }
    (REPO / "XLA_FLAGS_AB.json").write_text(json.dumps(out, indent=1))
    print(json.dumps({"flags_reach_backend": propagated}))


if __name__ == "__main__":
    main()
