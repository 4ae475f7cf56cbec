"""Device-side microbenchmarking via profiler traces.

On remote-execution platforms (axon tunnel), host-side timing of a single
call is dominated by RPC latency and ``block_until_ready`` can return before
execution; the reliable signal is the device trace.  ``device_time_ms``
runs a function N times inside a jax.profiler trace and returns the summed
duration of matching device ops / N.
"""

from __future__ import annotations

import collections
import glob
import gzip
import json
import os
import shutil
import tempfile
from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp


def _load_trace_events(log_dir: str, track: Optional[str] = "XLA Ops"):
    """Trace events, filtered to one device track (default: TPU 'XLA Ops')
    so host mirrors of the same op names don't double-count."""
    files = glob.glob(
        os.path.join(log_dir, "plugins/profile/*/*.trace.json.gz")
    )
    events = []
    for f in files:
        with gzip.open(f) as fh:
            all_events = json.load(fh).get("traceEvents", [])
        if track is None:
            events.extend(all_events)
            continue
        device_pids = set()
        track_tids = set()
        for e in all_events:
            if e.get("ph") == "M" and e.get("name") == "process_name":
                if "/device:" in e["args"].get("name", ""):
                    device_pids.add(e["pid"])
            if e.get("ph") == "M" and e.get("name") == "thread_name":
                if e["args"].get("name") == track:
                    track_tids.add((e["pid"], e["tid"]))
        events.extend(
            e for e in all_events
            if e.get("pid") in device_pids
            and (e.get("pid"), e.get("tid")) in track_tids
        )
    return events


def device_op_times(fn: Callable, n: int = 5, warmup: int = 1) -> Dict[str, float]:
    """Run fn n times under a trace; return {op_name: total_ms}."""
    for _ in range(warmup):
        jax.block_until_ready(fn())
        _force(fn())
    log_dir = tempfile.mkdtemp(prefix="loongx_devbench_")
    try:
        jax.profiler.start_trace(log_dir)
        for _ in range(n):
            _force(fn())
        jax.profiler.stop_trace()
        agg: Dict[str, float] = collections.defaultdict(float)
        for e in _load_trace_events(log_dir):
            if e.get("ph") == "X" and "dur" in e:
                agg[e.get("name", "")] += e["dur"] / 1e3
        return dict(agg)
    finally:
        shutil.rmtree(log_dir, ignore_errors=True)


def device_time_ms(
    fn: Callable, match: str, n: int = 5, warmup: int = 1
) -> float:
    """Mean device-side ms per call for ops whose name contains ``match``."""
    ops = device_op_times(fn, n=n, warmup=warmup)
    total = sum(v for k, v in ops.items() if match in k)
    return total / n


def _force(x):
    for leaf in jax.tree.leaves(x):
        if hasattr(leaf, "dtype"):
            jax.device_get(jnp.ravel(leaf)[0])
