"""Profiling and step timing.

The reference's only observability is a wall-clock print + tqdm
(SURVEY §5 "Tracing/profiling: None").  Here: jax.profiler trace capture
(viewable in TensorBoard/XProf/Perfetto), a step timer with percentile
summaries, and a forced-execution barrier that works on async/remote
platforms where ``block_until_ready`` returns before execution completes.
"""

from __future__ import annotations

import contextlib
import time
from typing import Any, Dict, List, Optional

import numpy as np

import jax
import jax.numpy as jnp


def force(x) -> None:
    """Barrier that really waits: pull one scalar derived from every leaf."""
    for leaf in jax.tree.leaves(x):
        if hasattr(leaf, "dtype"):
            jax.device_get(jnp.ravel(leaf)[0])


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/loongx_trace", host: bool = False):
    """Capture a jax.profiler trace around a block of device work."""
    jax.profiler.start_trace(log_dir, create_perfetto_link=False,
                             create_perfetto_trace=True)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Accumulates per-step wall times; prints percentile summaries."""

    def __init__(self, name: str = "step", sync_every: int = 1):
        self.name = name
        self.sync_every = sync_every
        self.times: List[float] = []
        self._t0: Optional[float] = None
        self._count = 0

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.times.append(time.perf_counter() - self._t0)

    def tick(self, result=None):
        """Call once per step; forces ``result`` every sync_every steps so
        queue depth can't hide real latency."""
        self._count += 1
        if result is not None and self._count % self.sync_every == 0:
            force(result)
        now = time.perf_counter()
        if self._t0 is not None:
            self.times.append(now - self._t0)
        self._t0 = now

    def summary(self) -> Dict[str, float]:
        if not self.times:
            return {}
        arr = np.asarray(self.times)
        return {
            "count": len(arr),
            "mean_s": float(arr.mean()),
            "p50_s": float(np.percentile(arr, 50)),
            "p90_s": float(np.percentile(arr, 90)),
            "p99_s": float(np.percentile(arr, 99)),
            "total_s": float(arr.sum()),
        }

    def report(self) -> str:
        s = self.summary()
        if not s:
            return f"{self.name}: no samples"
        return (
            f"{self.name}: n={s['count']} mean={s['mean_s']*1e3:.1f}ms "
            f"p50={s['p50_s']*1e3:.1f}ms p90={s['p90_s']*1e3:.1f}ms "
            f"p99={s['p99_s']*1e3:.1f}ms"
        )
