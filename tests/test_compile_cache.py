"""Persistent-compilation-cache plumbing (utils/compile_cache.py)."""

import os

import jax
import jax.numpy as jnp


def test_cache_populates_and_disables(tmp_path, monkeypatch):
    from loongx_tpu.utils.compile_cache import enable_compilation_cache

    d = str(tmp_path / "xla-cache")
    # conftest pins LOONGX_COMPILE_CACHE=0 suite-wide (CLI tests must not
    # flip the process-global disk cache on); opt back in for this test only
    monkeypatch.setenv("LOONGX_COMPILE_CACHE", "1")
    got = enable_compilation_cache(cache_dir=d, min_compile_time_secs=0.0)
    try:
        assert got == d and os.path.isdir(d)

        @jax.jit
        def f(x):
            return (x @ x.T).sum()

        f(jnp.ones((64, 64))).block_until_ready()
        assert len(os.listdir(d)) >= 1  # executable persisted

        monkeypatch.setenv("LOONGX_COMPILE_CACHE", "0")
        assert enable_compilation_cache(cache_dir=d) is None
    finally:
        jax.config.update("jax_compilation_cache_dir", None)
