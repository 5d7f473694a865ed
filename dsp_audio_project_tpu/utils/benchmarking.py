"""Caching-proof device timing.

The axon remote-TPU backend memoizes executions keyed on (executable, input
buffers): timing loops that re-run identical inputs measure the cache, not
the chip (measured: a 137 GFLOP matmul "ran" in 41 us).  Every measurement
here therefore drives each pre-staged DISTINCT input exactly once per pass.
"""
from __future__ import annotations

import time
from typing import Callable, Sequence

import jax


def measure(
    fn: Callable,
    inputs: Sequence,
    *,
    warmup_input=None,
    passes: int = 1,
) -> float:
    """Median-of-passes seconds per call, one distinct input per call.

    ``inputs``: sequence of argument-tuples, each used once per pass.  With
    passes > 1 the same inputs repeat across passes — only valid on backends
    without execution caching; keep passes=1 on axon.
    """
    if warmup_input is not None:
        jax.block_until_ready(fn(*warmup_input))
    per_pass = []
    for _ in range(passes):
        t0 = time.perf_counter()
        out = None
        for args in inputs:
            out = fn(*args)
        jax.block_until_ready(out)
        per_pass.append((time.perf_counter() - t0) / len(inputs))
    return sorted(per_pass)[len(per_pass) // 2]
