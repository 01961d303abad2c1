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


def summarize_trace(log_dir: str, top: int = 25, device: str = "TPU") -> list[tuple[str, float, int]]:
    """Aggregate device-op durations from a captured trace.  Returns
    [(op_name, total_ms, count)] sorted by total time.  ``device`` filters the
    trace process rows ("TPU" on chip; "CPU" for host-sim traces)."""
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
        if e.get("ph") == "X" and "dur" in e and device in str(proc.get(e.get("pid"), "")):
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


def attribute_trace(log_dir: str, jitted, *args, top: int = 40) -> list[tuple[str, float]]:
    """Attribute device time in a captured trace to model-level op names.

    ``summarize_trace`` reports raw fusion names (``fusion.3677``), which are
    opaque; this maps each device op back to its HLO definition's
    ``op_name`` metadata (the jax source path, e.g.
    ``jvp(FCMAE)/encoder/stages_0_0/dwconv/conv_general_dilated``), compresses
    the path, and aggregates — the view that drove the round-2 optimization
    work.  ``jitted``/``args`` must be the same jitted callable + example args
    that produced the trace (its compiled HLO supplies the metadata).

    Returns ALL [(bucket, total_ms)] sorted by time (so callers may sum them
    for total attributed device time); only the printout is truncated to
    ``top`` rows.
    """
    import re

    txt = jitted.lower(*args).compile().as_text()
    defs: dict[str, str] = {}
    for m in re.finditer(r"^\s+%?([\w.\-]+) = ([^\n]*)$", txt, re.M):
        name, rest = m.group(1), m.group(2)
        meta = re.search(r'op_name="([^"]+)"', rest)
        defs[name] = meta.group(1) if meta else ""

    paths = sorted(glob.glob(str(Path(log_dir) / "plugins/profile/*/*.trace.json.gz")))
    assert paths, f"no trace files under {log_dir}"
    with gzip.open(paths[-1]) as f:
        events = json.load(f)["traceEvents"]
    proc = {
        e["pid"]: e["args"]["name"]
        for e in events
        if e.get("ph") == "M" and e.get("name") == "process_name"
    }
    agg = collections.Counter()
    for e in events:
        if e.get("ph") == "X" and "dur" in e and "TPU" in str(proc.get(e.get("pid"), "")):
            agg[e["name"]] += e["dur"]

    import re as _re

    buckets = collections.Counter()
    for name, dur in agg.items():
        if name.startswith("jit_") or name.startswith("while"):
            continue
        key = defs.get(name, "<unattributed>") or "<no-meta>"
        key = _re.sub(r"jit\([\w_]+\)/", "", key)
        key = _re.sub(r"while/body/closed_call/", "", key)
        key = _re.sub(r"transpose\(jvp\(([\w_]+)\)\)/", r"BWD/", key)
        key = _re.sub(r"jvp\(([\w_]+)\)/", r"FWD/", key)
        key = _re.sub(r"[\w_]+\.[\w_]+/", "", key)
        key = _re.sub(r"stages_(\d)_\d+", r"stage\1", key)
        buckets[key[:110]] += dur
    rows = [(k, v / 1e3) for k, v in buckets.most_common(None)]
    for k, ms in rows[:top]:
        print(f"{ms:9.3f} ms  {k}")
    if len(rows) > top:
        rest = sum(ms for _, ms in rows[top:])
        print(f"{rest:9.3f} ms  <{len(rows) - top} more buckets>")
    return rows
