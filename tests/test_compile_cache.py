"""Persistent-compilation-cache plumbing (utils/compile_cache.py)."""

import os

import jax
import jax.numpy as jnp


def test_cache_populates_and_disables(tmp_path, monkeypatch):
    from jax.experimental.compilation_cache import compilation_cache as cc

    from loongx_tpu.utils.compile_cache import enable_compilation_cache

    d = str(tmp_path / "xla-cache")
    # conftest pins LOONGX_COMPILE_CACHE=0 suite-wide (CLI tests must not
    # flip the process-global disk cache on); opt back in for this test only
    monkeypatch.setenv("LOONGX_COMPILE_CACHE", "1")
    old_min_time = jax.config.jax_persistent_cache_min_compile_time_secs
    old_min_size = jax.config.jax_persistent_cache_min_entry_size_bytes
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
        # clearing the config dir alone is NOT enough: _initialize_cache()
        # latches the module-global cache object on first use, and every
        # LATER compile in the process would keep serializing executables
        # into this test's tmp dir (observed to segfault the suite on the
        # big fp32 train-step compile).  reset_cache() unlatches it.
        jax.config.update("jax_compilation_cache_dir", None)
        jax.config.update(
            "jax_persistent_cache_min_compile_time_secs", old_min_time
        )
        jax.config.update(
            "jax_persistent_cache_min_entry_size_bytes", old_min_size
        )
        cc.reset_cache()
