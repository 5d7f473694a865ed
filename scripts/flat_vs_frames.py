"""Real-chip A/B: frame-major fused path vs flat 128-lane path.

Measures profiler device time (batch-8, per 60 s signal) for
  1. frames path: shear/class FIR (frames emission) -> XLA two-sweep EQ
  2. flat path:   class FIR flat emission -> XLA flat EQ (the Pallas
     one-sweep EQ was measured off; see kernels/experiments/iir_seq.py)
plus the full-chain (+ spectra x/y/z) variants of each, and SNR vs the
oracle.  Decides which path bench.py should route (VERDICT r2 item 3).
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from dsp_audio_project_tpu import (
    AudioPipeline, EQConfig, PipelineConfig, SRCConfig,
)
from dsp_audio_project_tpu.utils.compcache import enable as _enable_cache

_enable_cache()
from dsp_audio_project_tpu.config import KernelConfig
from dsp_audio_project_tpu.oracle import pipeline_oracle, snr_db
from dsp_audio_project_tpu.utils.deviceprof import profile_device_ops

FS = 44100
SECONDS = 60.0
GAINS = {"Sub-Bass": 6, "Bass": -3, "High Mids": 12, "Presence": -15,
         "Brilliance": 4}


def log(m):
    print(m, file=sys.stderr, flush=True)


def main():
    n = int(SECONDS * FS)
    rng = np.random.default_rng(42)
    t = np.arange(n) / FS
    x = (0.4 * np.sin(2 * np.pi * 440 * t) + 0.2 * np.sin(2 * np.pi * 40 * t)
         + 0.2 * np.sin(2 * np.pi * 9800 * t) + 0.2 * rng.standard_normal(n))
    x = (x / np.max(np.abs(x))).astype(np.float32)

    cfg = PipelineConfig(
        src=SRCConfig(L=160, M=147), eq=EQConfig.from_gains(GAINS),
        kernels=KernelConfig(eq_fast=True, src_fast=True),
    )
    pipe = AudioPipeline(cfg)
    n_out = cfg.src.output_length(n)
    log(f"device: {jax.devices()[0]}")
    log(f"frames_supported={pipe.frames_supported(n)} "
        f"flat_supported={pipe.flat_supported(n)}")

    B = 8
    t0 = time.perf_counter()
    xs = np.stack([(x + 0.01 * rng.standard_normal(n)).astype(np.float32)
                   for _ in range(B)])
    v_warm = jax.device_put(jnp.asarray(xs))
    v_warm.block_until_ready()
    xs2 = np.stack([(x + 0.01 * rng.standard_normal(n)).astype(np.float32)
                    for _ in range(B)])
    v_prof = jax.device_put(jnp.asarray(xs2))
    v_prof.block_until_ready()
    log(f"batches uploaded in {time.perf_counter()-t0:.1f}s")

    t0 = time.perf_counter()
    want, _ = pipeline_oracle(x, FS, cfg.src, cfg.eq, engine="fast")
    log(f"oracle computed in {time.perf_counter()-t0:.1f}s")

    def bench(name, fn_maker, crop):
        fn = fn_maker()

        def run(v):
            z, _ = fn(v, FS)
            return jnp.sum(z)

        run_j = jax.jit(run)
        t0 = time.perf_counter()
        float(run_j(v_warm))
        log(f"{name}: compile+first {time.perf_counter()-t0:.1f}s")
        total_ms, ops = profile_device_ops(run_j, v_prof)
        dt = total_ms / B
        z, _ = fn(jnp.asarray(x), FS)
        q = snr_db(want, crop(np.asarray(z)))
        log(f"{name}: {dt:.3f} ms/signal  ->  "
            f"{n/(dt/1e3)/1e9:.2f} G samples/s/chip   snr={q:.1f} dB")
        for op, ms in ops[:8]:
            log(f"    {op}: {ms/B:.4f} ms")
        return dt

    def bench_full(name, fn_maker):
        fn = fn_maker()

        def run(v):
            z, _, (mx, my, mz) = fn(v, FS)
            return jnp.sum(z) + jnp.sum(mx) + jnp.sum(my) + jnp.sum(mz)

        run_j = jax.jit(run)
        t0 = time.perf_counter()
        float(run_j(v_warm))
        log(f"{name}: compile+first {time.perf_counter()-t0:.1f}s")
        total_ms, _ = profile_device_ops(run_j, v_prof)
        dt = total_ms / B
        log(f"{name}: {dt:.3f} ms/signal  ->  "
            f"{n/(dt/1e3)/1e9:.2f} G samples/s/chip (full chain)")
        return dt

    crop_frames = lambda a: a.reshape(a.shape[0], -1)[..., :n_out] \
        if a.ndim == 3 else a.reshape(-1)[:n_out]
    crop_flat = lambda a: a[..., :n_out]

    which = sys.argv[1] if len(sys.argv) > 1 else "both"
    dt_frames = dtf_frames = None
    if which in ("both", "frames"):
        dt_frames = bench("frames", pipe.jit_forward_frames, crop_frames)
        dtf_frames = bench_full("frames+spectra",
                                pipe.jit_forward_frames_spectra)
    dt_flat = bench("flat  ", pipe.jit_forward_flat, crop_flat)
    dtf_flat = bench_full("flat+spectra  ", pipe.jit_forward_flat_spectra)

    log("")
    if dt_frames is not None:
        log(f"SRC+EQ    : frames {dt_frames:.3f} ms vs flat {dt_flat:.3f} ms"
            f"  ({dt_frames/dt_flat:.2f}x)")
        log(f"full chain: frames {dtf_frames:.3f} ms vs flat "
            f"{dtf_flat:.3f} ms  ({dtf_frames/dtf_flat:.2f}x)")
    else:
        log(f"flat SRC+EQ {dt_flat:.3f} ms, full chain {dtf_flat:.3f} ms "
            f"(frames r2 reference: 0.194 / ~0.24 ms)")


if __name__ == "__main__":
    main()
