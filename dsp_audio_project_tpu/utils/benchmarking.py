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
    warmup_inputs: Sequence = (),
    passes: int = 1,
) -> float:
    """Median-of-passes seconds per call, one distinct input per call.

    ``inputs``: sequence of argument-tuples, each used once per pass.  With
    passes > 1 the same inputs repeat across passes — only valid on backends
    without execution caching; keep passes=1 on axon.

    Warmup matters beyond compilation: the first few dispatches of a fresh
    executable over the remote tunnel cost milliseconds while steady state
    is microseconds, so several DISTINCT warmup buffers (never reused in the
    timed pass — reuse would hit the execution cache) should precede timing.
    """
    warm = list(warmup_inputs)
    if warmup_input is not None:
        warm.insert(0, warmup_input)
    out = None
    for args in warm:
        out = fn(*args)
    if out is not None:
        jax.block_until_ready(out)
    per_pass = []
    for _ in range(passes):
        t0 = time.perf_counter()
        out = None
        for args in inputs:
            out = fn(*args)
        jax.block_until_ready(out)
        per_pass.append((time.perf_counter() - t0) / len(inputs))
    return sorted(per_pass)[len(per_pass) // 2]


def measure_differential(
    fn: Callable,
    inputs: Sequence,
    *,
    short_fraction: float = 0.25,
) -> float:
    """Per-call seconds via two queue depths: slope of time vs call count.

    Removes constant per-batch overhead (dispatch warmness, tunnel round
    trips) that corrupts single-queue averages on remote backends: run the
    first ``short_fraction`` of inputs as one timed queue, the rest as a
    second, and take (T_long - T_short) / (n_long - n_short).  Inputs must
    all be distinct (execution-cache hazard).
    """
    n_short = max(1, int(len(inputs) * short_fraction))
    short, long_ = inputs[:n_short], inputs[n_short:]
    if len(long_) <= n_short:
        raise ValueError("need more inputs than the short queue")

    t0 = time.perf_counter()
    out = None
    for args in short:
        out = fn(*args)
    jax.block_until_ready(out)
    t_short = time.perf_counter() - t0

    t0 = time.perf_counter()
    for args in long_:
        out = fn(*args)
    jax.block_until_ready(out)
    t_long = time.perf_counter() - t0

    return max(1e-9, (t_long - t_short) / (len(long_) - len(short)))


def measure_batched_differential(
    build_fn: Callable[[int], Callable],
    make_batch: Callable[[int], tuple],
    sizes: tuple = (4, 12),
    reps: int = 3,
) -> float:
    """Per-item seconds via batch-size differential with forced completion.

    On this backend ``block_until_ready`` returns before device execution
    finishes (verified: a 1.37 TFLOP chained matmul "completed" 10x faster
    than the chip's peak allows); only fetching result BYTES forces real
    completion.  So: ``build_fn(B)`` returns a jitted callable that processes
    a size-B batch and returns a SCALAR (e.g. jnp.sum of the output);
    ``make_batch(B)`` builds a fresh distinct batch (execution cache!).
    Timing T(B2) - T(B1) cancels the fetch round trip and all fixed
    dispatch costs; min over reps rejects tunnel noise.
    """
    b1, b2 = sizes
    f1, f2 = build_fn(b1), build_fn(b2)
    # compile + warm both executables on throwaway batches
    for f, b in ((f1, b1), (f2, b2)):
        float(f(*make_batch(b)))
        float(f(*make_batch(b)))
    best = float("inf")
    for _ in range(reps):
        a1, a2 = make_batch(b1), make_batch(b2)
        t0 = time.perf_counter()
        float(f1(*a1))
        t_small = time.perf_counter() - t0
        t0 = time.perf_counter()
        float(f2(*a2))
        t_big = time.perf_counter() - t0
        est = (t_big - t_small) / (b2 - b1)
        if 0 < est < best:
            best = est
    return best
