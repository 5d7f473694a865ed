"""On-chip config-matrix sweep (round-5 VERDICT item 7).

The CPU test tiers cover the full L,M in [1,8] and gain grids; the chip
had only ever run the 160/147 serving preset (+3/2 in the sharded
script).  This sweep pushes every UI-reachable (L, M) pair — plus the
headline 160/147 — through the compiled chain ON THE TPU with SNR gates
vs the golden oracle, over a mixed gain vector (and, for a subset, the
all-flat and +/-15 extreme vectors).  The persistent compile cache makes
repeat runs cheap.

Usage: python scripts/config_matrix.py [seconds-per-signal]
"""
from __future__ import annotations

import itertools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from dsp_audio_project_tpu.utils.compcache import enable as _cc

_cc()

import jax
import jax.numpy as jnp

from dsp_audio_project_tpu import (
    AudioPipeline, EQConfig, PipelineConfig, SRCConfig,
)
from dsp_audio_project_tpu.config import KernelConfig
from dsp_audio_project_tpu.oracle import pipeline_oracle, snr_db

FS = 44100
MIX = {"Sub-Bass": 6, "Bass": -3, "High Mids": 12, "Presence": -15,
       "Brilliance": 4}
FLAT = {}
EXTREME = {"Sub-Bass": 15, "Bass": -15, "Low Mids": 15, "High Mids": -15,
           "Presence": 15, "Brilliance": -15}


def log(m):
    print(m, flush=True)


def main():
    sec = float(sys.argv[1]) if len(sys.argv) > 1 else 1.0
    n = int(sec * FS)
    rng = np.random.default_rng(9)
    t = np.arange(n) / FS
    x = (0.4 * np.sin(2 * np.pi * 440 * t) + 0.2 * np.sin(2 * np.pi * 40 * t)
         + 0.2 * rng.standard_normal(n))
    x = (x / np.max(np.abs(x))).astype(np.float32)
    xd = jnp.asarray(x)

    pairs = list(itertools.product(range(1, 9), range(1, 9)))
    subset_extra = {(1, 1), (8, 1), (1, 8), (3, 2), (7, 5), (5, 7)}
    worst = (1e9, None)
    n_run = 0
    t_start = time.perf_counter()
    for L, M in pairs + [(160, 147)]:
        gain_sets = [("mix", MIX)]
        if (L, M) in subset_extra or (L, M) == (160, 147):
            gain_sets += [("flat", FLAT), ("extreme", EXTREME)]
        for gname, gains in gain_sets:
            cfg = PipelineConfig(
                src=SRCConfig(L=L, M=M), eq=EQConfig.from_gains(gains),
                kernels=KernelConfig(eq_fast=True, src_fast=True),
            )
            pipe = AudioPipeline(cfg)
            n_out = cfg.src.output_length(n)
            t0 = time.perf_counter()
            out = pipe(x, FS)
            z = np.asarray(out.output).reshape(-1)[:n_out]
            want, _ = pipeline_oracle(x, FS, cfg.src, cfg.eq, engine="fast")
            q = snr_db(want, z)
            n_run += 1
            # Label the path AudioPipeline.__call__ actually routed (it
            # selects frames/flat; the cat path is the serving/bench
            # surface and is gated separately by tests/bench — an earlier
            # revision mislabeled cat-capable configs here).
            kc2 = cfg.kernels
            path = (
                "frames"
                if (jax.default_backend() == "tpu" and not kc2.interpret
                    and kc2.fir_path == "auto" and kc2.iir_path == "auto"
                    and pipe.frames_supported(n))
                else "flat"
            )
            cat_note = ""
            if (jax.default_backend() == "tpu"
                    and pipe.cat_supported(n, FS)):
                # The serving/bench surface: gate the cat path too.
                zc = np.asarray(
                    pipe.jit_forward_cat()(jnp.asarray(x), FS)
                ).reshape(-1)[:n_out]
                qc = snr_db(want, zc)
                cat_note = f"  cat={qc:6.1f} dB"
                if qc < worst[0]:
                    worst = (qc, (L, M, gname, "cat"))
                assert qc > 60.0, (
                    f"cat SNR gate failed at {(L, M, gname)}: {qc:.1f}"
                )
            log(f"L={L:3d} M={M:3d} gains={gname:7s} path={path:6s} "
                f"snr={q:6.1f} dB{cat_note}  ({time.perf_counter()-t0:.1f}s)")
            if q < worst[0]:
                worst = (q, (L, M, gname))
            assert q > 60.0, f"SNR gate failed at {(L, M, gname)}: {q:.1f}"
    log(f"ALL {n_run} configs >= 60 dB on the chip; worst {worst[0]:.1f} dB "
        f"at {worst[1]}  (total {time.perf_counter()-t_start:.0f}s)")


if __name__ == "__main__":
    main()
