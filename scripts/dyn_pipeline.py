"""Measured pipelined dynamic-serving cycle (round-5 VERDICT item 6).

Round 4 *computed* the pipelined cycle efficiency from component times
(bench.py); this harness RUNS the three loops and reports measured
ratios, absorbing the 2-5 ms host-numpy jitter:

  steady     — batches at fixed operators (the per-batch floor);
  serial     — per cycle: host-build ops(g_k) -> upload -> batch;
  pipelined  — per cycle: dispatch batch k, host-build g_{k+1} WHILE the
               device runs (async dispatch), then fetch + upload
               (double-buffered DynOperators).

All three loops pay identical tunnel/dispatch costs, so the ratios
isolate the overlap.  Device-side efficiency additionally comes from
profile_device_span over the pipelined loop.

Usage: python scripts/dyn_pipeline.py [cycles]
"""
from __future__ import annotations

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
from dsp_audio_project_tpu.utils.deviceprof import profile_device_span

FS = 44100
SECONDS = 60.0
B = 8


def log(m):
    print(m, file=sys.stderr, flush=True)


def main():
    cycles = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    n = int(SECONDS * FS)
    cfg = PipelineConfig(
        src=SRCConfig(L=160, M=147),
        eq=EQConfig.from_gains({"Sub-Bass": 6, "Bass": -3, "High Mids": 12,
                                "Presence": -15, "Brilliance": 4}),
        kernels=KernelConfig(eq_fast=True, src_fast=True),
    )
    pipe = AudioPipeline(cfg)
    rng = np.random.default_rng(0)
    xs = (0.3 * rng.standard_normal((B, n))).astype(np.float32)
    v = jax.device_put(jnp.asarray(xs))
    jax.block_until_ready(v)

    fwd = pipe.jit_forward_frames_dynamic_ops()
    run = jax.jit(lambda vv, oo: jnp.sum(fwd(vv, oo, FS)[0]))

    names = [nm for nm, _ in cfg.eq.band_centers]
    gain_seq = [
        np.asarray([float(((k * 7 + i * 3) % 31) - 15) for i in range(len(names))])
        for k in range(cycles + 1)
    ]

    def build(g):
        return pipe.dynamic_eq_operators(g, FS, n, builder="host")

    ops0 = build(gain_seq[0])
    jax.block_until_ready(ops0)
    float(run(v, ops0))  # compile + warm

    # steady: fixed operators
    t0 = time.perf_counter()
    for _ in range(cycles):
        float(run(v, ops0))
    t_steady = (time.perf_counter() - t0) / cycles

    # serial: build blocks the cycle
    t0 = time.perf_counter()
    for k in range(cycles):
        ops = build(gain_seq[k])
        jax.block_until_ready(ops)
        float(run(v, ops))
    t_serial = (time.perf_counter() - t0) / cycles

    # pipelined: the HOST-NUMPY phase of change k+1 runs while batch k is
    # on the device (async dispatch); only upload + expand serialize.
    from dsp_audio_project_tpu.ops.eq_dynamic import (
        _expand_dyn_operators, host_dyn_tables, upload_dyn_tables,
    )

    U_g, G_g, K_g = pipe.dynamic_eq_geometry(FS, n)
    fs_out = cfg.src.output_rate(FS)

    def build_host_phase(g):
        return host_dyn_tables(g, fs_out, cfg.eq, U_g, G_g, K_g)

    def finish_phase(tabs):
        return _expand_dyn_operators(*upload_dyn_tables(tabs))

    ops = build(gain_seq[0])
    jax.block_until_ready(ops)
    host_ms = []
    t0 = time.perf_counter()
    for k in range(cycles):
        out = run(v, ops)          # async dispatch
        th = time.perf_counter()
        tabs = build_host_phase(gain_seq[k + 1])  # overlaps device exec
        host_ms.append((time.perf_counter() - th) * 1e3)
        float(out)                 # fetch forces completion
        ops = finish_phase(tabs)
        jax.block_until_ready(ops)
    t_pipe = (time.perf_counter() - t0) / cycles

    log(f"cycles={cycles} batch={B} x {SECONDS:.0f}s  host-build "
        f"{min(host_ms):.1f}-{max(host_ms):.1f} ms (median "
        f"{sorted(host_ms)[len(host_ms)//2]:.1f})")
    log(f"wall per cycle: steady {t_steady*1e3:.1f} ms, serial "
        f"{t_serial*1e3:.1f} ms, pipelined {t_pipe*1e3:.1f} ms")
    log(f"measured cycle efficiency vs steady: serial "
        f"{t_steady/t_serial*100:.1f}%, pipelined "
        f"{t_steady/t_pipe*100:.1f}% (wall; tunnel costs identical in "
        f"all three loops)")

    # device-side: profile the pipelined loop, compare to steady batch
    def steady_thunk():
        for _ in range(3):
            float(run(v, ops0))

    ms_steady, _ = profile_device_span(steady_thunk)

    def pipe_thunk():
        o = build(gain_seq[0])
        jax.block_until_ready(o)
        for k in range(3):
            out = run(v, o)
            tabs = build_host_phase(gain_seq[k + 1])
            float(out)
            o = finish_phase(tabs)
            jax.block_until_ready(o)

    ms_pipe, _ = profile_device_span(pipe_thunk)
    log(f"device work per cycle: steady {ms_steady/3:.3f} ms, pipelined "
        f"{ms_pipe/3:.3f} ms -> device-side efficiency "
        f"{ms_steady/ms_pipe*100:.1f}%")


if __name__ == "__main__":
    main()
