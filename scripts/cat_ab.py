"""On-chip A/B: EQ-fused cat chain vs the frames chain (round 5 item 1).

Profiles the serving config (60 s 44.1->48 kHz, 5-band EQ, batch-8,
bf16x3 fast mode) through both paths, src+eq and full chain (+spectra),
printing per-op device tables so wins/regressions land in STATUS with
numbers.  Run on the TPU.
"""
from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dsp_audio_project_tpu.utils.compcache import enable as _cc

_cc()

import jax
import jax.numpy as jnp

from dsp_audio_project_tpu import (
    AudioPipeline, EQConfig, PipelineConfig, SRCConfig,
)
from dsp_audio_project_tpu.config import KernelConfig
from dsp_audio_project_tpu.oracle import pipeline_oracle, snr_db
from dsp_audio_project_tpu.utils.deviceprof import profile_device_ops

FS = 44100
SECONDS = 60.0
GAINS = {"Sub-Bass": 6, "Bass": -3, "High Mids": 12, "Presence": -15,
         "Brilliance": 4}
B = 8


def main():
    n = int(SECONDS * FS)
    rng = np.random.default_rng(42)
    t = np.arange(n) / FS
    x = (0.4 * np.sin(2 * np.pi * 440 * t) + 0.2 * np.sin(2 * np.pi * 40 * t)
         + 0.2 * np.sin(2 * np.pi * 9800 * t)
         + 0.2 * rng.standard_normal(n))
    x = (x / np.max(np.abs(x))).astype(np.float32)
    cfg = PipelineConfig(
        src=SRCConfig(L=160, M=147), eq=EQConfig.from_gains(GAINS),
        kernels=KernelConfig(eq_fast=True, src_fast=True),
    )
    pipe = AudioPipeline(cfg)
    n_out = cfg.src.output_length(n)
    assert pipe.cat_supported(n, FS)

    xs = np.stack([(x + 0.01 * rng.standard_normal(n)).astype(np.float32)
                   for _ in range(B)])
    v_warm = jax.device_put(jnp.asarray(xs))
    xs2 = np.stack([(x + 0.01 * rng.standard_normal(n)).astype(np.float32)
                    for _ in range(B)])
    v_prof = jax.device_put(jnp.asarray(xs2))
    jax.block_until_ready([v_warm, v_prof])

    fr = pipe.jit_forward_frames()
    fr_full = pipe.jit_forward_frames_spectra()
    ct = pipe.jit_forward_cat()
    ct_full = pipe.jit_forward_cat_spectra()

    progs = {
        "frames src+eq": jax.jit(lambda v: jnp.sum(fr(v, FS)[0])),
        "cat    src+eq": jax.jit(lambda v: jnp.sum(ct(v, FS))),
        "frames full": jax.jit(lambda v: (lambda z, y, m: jnp.sum(z)
                               + sum(jnp.sum(q) for q in m))(*fr_full(v, FS))),
        "cat    full": jax.jit(lambda v: (lambda z, m: jnp.sum(z)
                               + sum(jnp.sum(q) for q in m))(*ct_full(v, FS))),
    }
    results = {}
    for name, f in progs.items():
        t0 = time.perf_counter()
        float(f(v_warm))
        print(f"[{name}] compile+warm {time.perf_counter()-t0:.1f}s",
              flush=True)
        total_ms, ops = profile_device_ops(f, v_prof)
        per = total_ms / B
        results[name] = per
        print(f"[{name}] {per*1e3:.1f} us/signal "
              f"({n/ (per/1e3) /1e9:.2f} G samples/s)")
        for op, ms in ops[:10]:
            print(f"    {ms/B*1e3:8.1f} us  {op}")
    print()
    for name, per in results.items():
        print(f"{name:14s} {per*1e3:7.1f} us/signal  "
              f"{n/(per/1e3)/1e9:6.2f} G")

    # SNR gates on the chip
    want, fs_want = pipeline_oracle(x, FS, cfg.src, cfg.eq, engine="fast")
    zc = ct(jnp.asarray(x), FS)
    q = snr_db(want, np.asarray(zc).reshape(-1)[:n_out])
    print(f"cat output snr vs oracle (on chip): {q:.1f} dB (gate 60)")
    zc2, (mx, my, mz) = ct_full(jnp.asarray(x), FS)
    from dsp_audio_project_tpu.oracle import resample_oracle, spectrum_oracle
    y_want, _ = resample_oracle(x, FS, cfg.src, engine="fast")
    cap = cfg.spectrum.analysis_limit
    qs = min(
        snr_db(spectrum_oracle(x[:cap], FS)[1], np.asarray(mx)),
        snr_db(spectrum_oracle(y_want[:cap], fs_want)[1], np.asarray(my)),
        snr_db(spectrum_oracle(want[:cap], fs_want)[1], np.asarray(mz)),
    )
    print(f"cat spectra snr vs oracle (min x/y/z): {qs:.1f} dB (gate 60)")


if __name__ == "__main__":
    main()
