"""Tracing/profiling helpers (SURVEY.md §5: absent in the reference).

Wraps ``jax.profiler`` annotations around pipeline stages and provides a
tiny roofline accounting model so benchmarks can report achieved fraction of
HBM "speed of light" — the relevant bound for FIR/FFT audio work.
"""
from __future__ import annotations

import contextlib
import dataclasses
import time
from typing import Dict, Iterator, Optional

import jax

# Peak HBM bandwidth per chip, bytes/s (approx; used only for roofline %).
HBM_PEAK_BYTES_PER_S = {
    "TPU v4": 1.2e12,
    "TPU v5 lite": 8.1e11,   # v5e ~810 GB/s
    "TPU v5": 2.76e12,       # v5p
    "TPU v6 lite": 1.64e12,
}


def device_hbm_peak() -> Optional[float]:
    kind = jax.devices()[0].device_kind
    for name, bw in HBM_PEAK_BYTES_PER_S.items():
        if kind.lower().startswith(name.lower()):
            return bw
    return None


@contextlib.contextmanager
def trace_stage(name: str) -> Iterator[None]:
    """Annotate a pipeline stage in profiler traces (perfetto/tensorboard)."""
    with jax.profiler.TraceAnnotation(name):
        yield


@dataclasses.dataclass
class StageTimer:
    """Wall-clock stage timing with device sync — the bench's observability."""

    timings_s: Dict[str, float] = dataclasses.field(default_factory=dict)

    @contextlib.contextmanager
    def stage(self, name: str, result_to_block=None) -> Iterator[None]:
        t0 = time.perf_counter()
        yield
        if result_to_block is not None:
            jax.block_until_ready(result_to_block)
        self.timings_s[name] = self.timings_s.get(name, 0.0) + (
            time.perf_counter() - t0
        )

    def report(self) -> str:
        total = sum(self.timings_s.values())
        lines = [
            f"  {k}: {v*1e3:.2f} ms ({100*v/total:.0f}%)"
            for k, v in sorted(self.timings_s.items(), key=lambda kv: -kv[1])
        ]
        return "\n".join(lines)


def roofline_fraction(bytes_moved: int, seconds: float) -> Optional[float]:
    """Achieved HBM bandwidth as a fraction of the chip's peak."""
    peak = device_hbm_peak()
    if peak is None or seconds <= 0:
        return None
    return (bytes_moved / seconds) / peak
