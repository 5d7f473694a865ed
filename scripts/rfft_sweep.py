"""Real-chip rFFT ledger: Pallas tall kernel vs the XLA butterfly.

Measures profiler device time per batch for |rfft| at the large
spectrogram sizes (VERDICT r3 item 7): the routed Pallas kernel (where one
exists) against the XLA butterfly path, plus the butterfly-only 524288
entry (no single-pass VMEM split exists there — see
ops/fft._rfft_kernel_plan).  Numbers land in STATUS.md's rFFT ledger.

Usage: python scripts/rfft_sweep.py [N ...]   (default: 131072 262144 524288)
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from dsp_audio_project_tpu.ops.fft import _rfft_kernel_plan, rfft_magnitude
from dsp_audio_project_tpu.utils.compcache import enable as _enable_cache
from dsp_audio_project_tpu.utils.deviceprof import profile_device_ops

_enable_cache()


def log(m):
    print(m, file=sys.stderr, flush=True)


def bench_engine(x, engine):
    fn = jax.jit(lambda v: jnp.sum(rfft_magnitude(v, engine=engine)))
    float(fn(x))  # compile + warm
    total_ms, _ = profile_device_ops(fn, x)
    return total_ms


def main():
    sizes = [int(a) for a in sys.argv[1:]] or [131072, 262144, 524288]
    log(f"device: {jax.devices()[0]}")
    rng = np.random.default_rng(0)
    for n in sizes:
        rows = max(2, (1 << 21) // n)  # ~2M samples per batch
        x = jax.device_put(
            jnp.asarray(rng.standard_normal((rows, n)).astype(np.float32))
        )
        x.block_until_ready()
        plan = _rfft_kernel_plan(n)
        t_xla = bench_engine(x, "jnp")
        line = f"N={n} rows={rows}: butterfly {t_xla:.3f} ms"
        if plan is not None:
            t_k = bench_engine(x, "pallas")
            # parity spot check
            want = np.abs(np.fft.rfft(np.asarray(x), axis=-1))
            got = np.asarray(rfft_magnitude(x, engine="pallas"))
            rel = float(np.max(np.abs(got - want)) / np.max(want))
            line += (f", kernel {plan} {t_k:.3f} ms "
                     f"({t_xla / t_k:.2f}x, rel {rel:.1e})")
        log(line)


if __name__ == "__main__":
    main()
