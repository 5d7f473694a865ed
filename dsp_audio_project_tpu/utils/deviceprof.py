"""Device-side op profiling via jax.profiler traces.

Wall-clock through the remote tunnel is unusable for kernel work (see
benchmarking.py); the profiler's device timeline is ground truth.  This
wraps trace capture + parsing into one call returning per-op durations.
"""
from __future__ import annotations

import collections
import glob
import gzip
import json
import os
import tempfile
from typing import Callable, Dict, List, Tuple

import jax


def profile_device_ops(
    fn: Callable, *args, top: int = 20
) -> Tuple[float, List[Tuple[str, float]]]:
    """Run ``fn(*args)`` under a profiler trace.

    Returns (total_device_ms, [(op_name, ms) ...]) sorted by time.  The
    total is the duration of the outermost device program (module events are
    excluded from the per-op list).
    """
    import numpy as np

    with tempfile.TemporaryDirectory() as td:
        with jax.profiler.trace(td):
            out = fn(*args)
            # Completion must be forced by fetching result BYTES — on the
            # axon backend block_until_ready resolves early (benchmarking.py).
            jax.tree_util.tree_map(np.asarray, out)
        traces = sorted(glob.glob(os.path.join(td, "**", "*.trace.json.gz"),
                                  recursive=True))
        if not traces:
            return 0.0, []
        with gzip.open(traces[-1]) as f:
            data = json.load(f)

    events = data.get("traceEvents", [])
    pids = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pids[e["pid"]] = e["args"].get("name", "")
    agg: Dict[str, float] = collections.Counter()
    total = 0.0
    for e in events:
        if e.get("ph") != "X":
            continue
        if "TPU" not in pids.get(e["pid"], ""):
            continue
        name = e["name"]
        dur_ms = e.get("dur", 0) / 1e3
        if name.startswith("jit_") or "(" in name:
            total = max(total, dur_ms)
        else:
            agg[name] += dur_ms
    ops = sorted(agg.items(), key=lambda kv: -kv[1])[:top]
    return total, ops


def profile_device_span(
    thunk: Callable[[], object], top: int = 20
) -> Tuple[float, List[Tuple[str, float]]]:
    """Run ``thunk()`` under a trace; return (SUM of device-program ms, ops).

    Unlike ``profile_device_ops`` (which reports the single longest program
    — right for one jitted call), this sums every top-level device program
    executed inside the thunk, so a sequence of dispatches (e.g. streaming
    super-steps) is measured end to end in device time.
    """
    import numpy as np

    with tempfile.TemporaryDirectory() as td:
        with jax.profiler.trace(td):
            out = thunk()
            jax.tree_util.tree_map(np.asarray, out)
        traces = sorted(glob.glob(os.path.join(td, "**", "*.trace.json.gz"),
                                  recursive=True))
        if not traces:
            return 0.0, []
        with gzip.open(traces[-1]) as f:
            data = json.load(f)

    events = data.get("traceEvents", [])
    pids = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pids[e["pid"]] = e["args"].get("name", "")
    agg: Dict[str, float] = collections.Counter()
    total = 0.0
    for e in events:
        if e.get("ph") != "X":
            continue
        if "TPU" not in pids.get(e["pid"], ""):
            continue
        name = e["name"]
        dur_ms = e.get("dur", 0) / 1e3
        if name.startswith("jit_") or "(" in name:
            total += dur_ms
        else:
            agg[name] += dur_ms
    ops = sorted(agg.items(), key=lambda kv: -kv[1])[:top]
    return total, ops


def print_profile(fn: Callable, *args, top: int = 20) -> float:
    total, ops = profile_device_ops(fn, *args, top=top)
    print(f"device total: {total:.3f} ms")
    for name, ms in ops:
        print(f"  {ms:8.3f} ms  {name}")
    return total
