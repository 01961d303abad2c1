"""Persistent XLA compilation cache (utils/compile_cache.py)."""
import os

import jax
import jax.numpy as jnp

from mmearth_tpu.utils import compile_cache


def test_cache_writes_entries(tmp_path, monkeypatch):
    d = tmp_path / "xla"
    prev_active = compile_cache._ACTIVE
    prev_thresh = jax.config.jax_persistent_cache_min_compile_time_secs
    try:
        assert compile_cache.enable_compilation_cache(d) == str(d)
        # Cache even sub-second compiles so the tiny test graph qualifies.
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

        @jax.jit
        def f(x):
            return jnp.tanh(x @ x.T).sum() * 3.25

        f(jnp.ones((17, 23))).block_until_ready()
        assert os.listdir(d), "no cache entry written after a jit compile"
        # idempotence: a no-arg follow-up keeps the active directory
        assert compile_cache.enable_compilation_cache() == str(d)
    finally:
        jax.config.update("jax_compilation_cache_dir", None)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", prev_thresh)
        compile_cache._ACTIVE = prev_active


def test_disable_env(tmp_path, monkeypatch):
    monkeypatch.setenv("MMEARTH_TPU_NO_COMPILE_CACHE", "1")
    assert compile_cache.enable_compilation_cache(tmp_path / "x") is None
    assert not (tmp_path / "x").exists()
