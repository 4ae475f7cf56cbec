"""Persistent XLA compilation cache.

The full-dev serving graph (19+38 stacked-quant blocks + flash attention)
costs tens of seconds of XLA compile time per process; the reference pays
the equivalent torch/cuda warmup on every CLI invocation.  Enabling JAX's
persistent compilation cache makes every repeat invocation of the CLIs,
``bench.py``, or a restarted serving process warm-start: compiled
executables are keyed by (HLO, compile options, jax/libtpu version) and
reloaded from disk instead of recompiled.

Called by every CLI entry point.  Opt out with ``LOONGX_COMPILE_CACHE=0``;
redirect with ``LOONGX_COMPILE_CACHE_DIR=...``.
"""

from __future__ import annotations

import os
from typing import Optional

import jax


def enable_compilation_cache(
    cache_dir: Optional[str] = None,
    min_compile_time_secs: float = 1.0,
) -> Optional[str]:
    """Turn on the persistent compilation cache; returns the cache dir
    (None when disabled via ``LOONGX_COMPILE_CACHE=0`` or when the
    directory cannot be created)."""
    if os.environ.get("LOONGX_COMPILE_CACHE", "1") == "0":
        return None
    cache_dir = (
        cache_dir
        or os.environ.get("LOONGX_COMPILE_CACHE_DIR")
        or os.path.join(os.path.expanduser("~"), ".cache", "loongx_tpu", "xla")
    )
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        # cache everything non-trivial; tiny jits aren't worth the disk IO
        jax.config.update(
            "jax_persistent_cache_min_compile_time_secs", min_compile_time_secs
        )
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception as e:  # cache is an optimization, never a hard failure
        print(f"[compile-cache] disabled ({type(e).__name__}: {e})")
        return None
    return cache_dir
