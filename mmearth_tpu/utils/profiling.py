"""Profiling / timing utilities.

The reference has no profiler at all (SURVEY.md §5 — wall-clock meters only).
Here: jax.profiler trace capture (verified to work through the axon relay),
a device-op aggregation report over the captured trace, and an honest step
timer that amortizes dispatch overhead by chaining steps in one jit (naive
``block_until_ready`` timing is unreliable on relay-attached chips).
"""
from __future__ import annotations

import collections
import glob
import gzip
import json
import time
from contextlib import contextmanager
from pathlib import Path


@contextmanager
def trace(log_dir: str = "/tmp/mmearth_trace"):
    """Capture a jax.profiler trace around a block of device work."""
    import jax

    with jax.profiler.trace(str(log_dir)):
        yield
    print(f"profiler trace written to {log_dir}")


def summarize_trace(log_dir: str, top: int = 25) -> list[tuple[str, float, int]]:
    """Aggregate device-op durations from a captured trace.  Returns
    [(op_name, total_ms, count)] sorted by total time."""
    paths = sorted(glob.glob(str(Path(log_dir) / "plugins/profile/*/*.trace.json.gz")))
    assert paths, f"no trace files under {log_dir}"
    with gzip.open(paths[-1]) as f:
        data = json.load(f)
    events = data["traceEvents"]
    proc = {
        e["pid"]: e["args"]["name"]
        for e in events
        if e.get("ph") == "M" and e.get("name") == "process_name"
    }
    agg, cnt = collections.Counter(), collections.Counter()
    for e in events:
        if e.get("ph") == "X" and "dur" in e and "TPU" in str(proc.get(e.get("pid"), "")):
            agg[e["name"]] += e["dur"]
            cnt[e["name"]] += 1
    rows = [(name, dur / 1e3, cnt[name]) for name, dur in agg.most_common(top)]
    for name, ms, c in rows:
        print(f"{ms:9.2f} ms  x{c:4d}  {name[:100]}")
    return rows


def time_steps(step_fn, state, batch, rng, k: int = 30, rounds: int = 4):
    """Best-of-N per-step time for `state, metrics = step_fn(state, batch, rng)`,
    measured as K chained steps inside one jit call (dispatch amortized)."""
    import functools

    import jax
    import jax.numpy as jnp

    @functools.partial(jax.jit, donate_argnums=(0,))
    def multi(state, batch, rng):
        def body(carry, i):
            st, acc = carry
            st, m = step_fn(st, batch, jax.random.fold_in(rng, i))
            return (st, acc + m["loss"]), None

        (state, total), _ = jax.lax.scan(body, (state, jnp.float32(0)), jnp.arange(k))
        return state, total

    state, total = multi(state, batch, rng)
    float(total)  # full sync (block_until_ready is unreliable on the relay)
    best = float("inf")
    for i in range(rounds):
        t0 = time.perf_counter()
        state, total = multi(state, batch, jax.random.fold_in(rng, i))
        float(total)
        best = min(best, (time.perf_counter() - t0) / k)
    return best, state
