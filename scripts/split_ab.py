"""On-chip A/B: cat kernel with in-kernel hi/lo casts vs pre-split bf16
staging (kernels/fir_class.polyphase_fir_class_rect_cat staged_split).

Measures the full src+eq program (kernel + packed toeplitz + finish) at
the bench configuration (batch-8, 60 s, serving gains) via the device
profiler, plus output SNR vs the golden oracle for both variants.
"""
from __future__ import annotations

import sys

import numpy as np

sys.path.insert(0, ".")

from dsp_audio_project_tpu.utils.compcache import enable as _cc

_cc()

import jax
import jax.numpy as jnp

from dsp_audio_project_tpu.config import EQConfig, SRCConfig
from dsp_audio_project_tpu.kernels.fir_class import (
    polyphase_fir_class_rect_cat,
)
from dsp_audio_project_tpu.ops.eq import (
    eq_cat_weights, equalize_frames_cat, make_block_operators,
)
from dsp_audio_project_tpu.ops.src import make_plan
from dsp_audio_project_tpu.oracle import pipeline_oracle, snr_db
from dsp_audio_project_tpu.utils.deviceprof import profile_device_ops

FS = 44100
SECONDS = 60.0
GAINS = {"Sub-Bass": 6, "Bass": -3, "High Mids": 12, "Presence": -15,
         "Brilliance": 4}


def main():
    n = int(SECONDS * FS)
    src = SRCConfig(L=160, M=147)
    eq = EQConfig.from_gains(GAINS)
    plan = make_plan(src.L, src.M, src.taps_rule_factor)
    n_out = src.output_length(n)
    fs_out = src.output_rate(FS)
    ops = make_block_operators(
        eq.active_bands(fs_out), int(fs_out), eq.q, 128 * plan.P, plan.P
    )
    w_cat = eq_cat_weights(ops)

    rng = np.random.default_rng(42)
    t = np.arange(n) / FS
    x = (0.4 * np.sin(2 * np.pi * 440 * t) + 0.2 * np.sin(2 * np.pi * 40 * t)
         + 0.2 * np.sin(2 * np.pi * 9800 * t)
         + 0.2 * rng.standard_normal(n))
    x = (x / np.max(np.abs(x))).astype(np.float32)
    xb = jnp.asarray(np.stack(
        [x + 0.01 * rng.standard_normal(n).astype(np.float32)
         for _ in range(8)]
    ))
    jax.block_until_ready(xb)

    want, _ = pipeline_oracle(x, FS, src, eq, engine="fast")

    def chain(v, split):
        y0, inj_p = polyphase_fir_class_rect_cat(
            v, plan, n_out, w_cat, precision="fast", staged_split=split,
        )
        return equalize_frames_cat(
            y0, inj_p, fs_out, eq, unroll=plan.P, fast=True,
        )

    for split in (False, True):
        f = jax.jit(lambda v: jnp.sum(chain(v, split)))
        float(f(xb))  # compile + warm
        ms, opsl = profile_device_ops(f, xb)
        print(f"staged_split={split}: src+eq {ms/8*1e3:7.1f} us/signal "
              f"({ms:.3f} ms batch-8)")
        for op, tms in opsl[:8]:
            print(f"    {op:44s} {tms*1e3:8.1f} us", file=sys.stderr)
        z = chain(jnp.asarray(x), split)
        q = snr_db(want, np.asarray(z).reshape(-1)[:n_out])
        print(f"  snr vs oracle: {q:.1f} dB")


if __name__ == "__main__":
    main()
