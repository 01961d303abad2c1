"""Persistent XLA compilation cache.

The reference has nothing comparable (every torch run re-JITs nothing; every
JAX process pays a full XLA compile).  On TPU the flagship training step
takes tens of seconds to compile — and in remote-relay environments or on
pod restarts of a 200-epoch pretrain that cost is paid again on every
process start.  JAX ships a persistent on-disk cache keyed on the HLO; this
module turns it on for every driver (pretrain, finetune, bench) with one
call.

Disable with MMEARTH_TPU_NO_COMPILE_CACHE=1; point the directory elsewhere
with MMEARTH_TPU_COMPILE_CACHE=<dir> (default ~/.cache/mmearth_tpu/xla).
Failures (read-only filesystem, backend without executable serialization)
degrade to compile-as-usual.
"""
from __future__ import annotations

import os
from pathlib import Path

_ACTIVE: str | None = None


def enable_compilation_cache(cache_dir: str | os.PathLike | None = None) -> str | None:
    """Enable JAX's persistent compilation cache; returns the directory used,
    or None if disabled/unavailable.  Idempotent — a second no-arg call (the
    drivers and the bench both call this) keeps whatever directory is already
    active; an explicit ``cache_dir`` redirects.  Safe before or after
    backend initialization (entries are keyed on HLO + device kind, so CPU
    tests and TPU runs share a directory without collisions)."""
    global _ACTIVE
    if os.environ.get("MMEARTH_TPU_NO_COMPILE_CACHE", "") not in ("", "0"):
        return None
    if cache_dir is None and _ACTIVE is not None:
        try:
            import jax

            if jax.config.jax_compilation_cache_dir != _ACTIVE:
                jax.config.update("jax_compilation_cache_dir", _ACTIVE)
        except Exception:
            return None
        return _ACTIVE
    cache_dir = str(
        cache_dir
        or os.environ.get("MMEARTH_TPU_COMPILE_CACHE")
        or Path.home() / ".cache" / "mmearth_tpu" / "xla"
    )
    try:
        Path(cache_dir).mkdir(parents=True, exist_ok=True)
        import jax

        prev = jax.config.jax_compilation_cache_dir
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        if prev is not None and prev != cache_dir:
            # The cache singleton latches the directory on first use; a later
            # dir change needs an explicit reset to take effect.
            from jax.experimental.compilation_cache.compilation_cache import reset_cache

            reset_cache()
        # Default threshold skips sub-second compiles; cache everything that
        # takes >=1 s so the flagship step + the bench variants all hit.
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
        _ACTIVE = cache_dir
        return cache_dir
    except Exception:
        return None
