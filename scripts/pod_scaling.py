"""Pod scaling harness: run one copy per host on a TPU slice.

Joins jax.distributed, builds the multihost (channel, block) mesh (block
within hosts on ICI, channels across hosts on DCN — see
parallel/distributed.py), runs the sharded fused chain, and reports
device time / samples/s / SNR / scaling efficiency vs the single-chip
extrapolation from docs/SCALING.md.

Usage (standard pod env autodetects the cluster):
    python scripts/pod_scaling.py --seconds 600 --channels 8
Manual CPU/bring-up cluster:
    python scripts/pod_scaling.py --coordinator host0:9999 \
        --num-processes 2 --process-id 0 ...
"""
from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Single-chip reference: bench.py device time per 60 s 44.1 kHz signal,
# read from the newest BENCH_r*.json at the repo root so the efficiency
# denominator tracks the measured chain instead of a stale constant.
_T1_FALLBACK = 0.180e-3  # round-4 SRC+EQ measurement (BENCH_r04.json
#                           extra.src_eq_ms_per_60s_signal); only consulted
#                           when no BENCH_r*.json is readable at the root.


def t1_per_60s() -> float:
    import glob
    import json as _json
    import re

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    best = None
    for path in glob.glob(os.path.join(root, "BENCH_r*.json")):
        m = re.search(r"BENCH_r(\d+)\.json$", path)
        if m:
            best = max(best or (0, ""), (int(m.group(1)), path))
    if not best:
        return _T1_FALLBACK
    try:
        with open(best[1]) as fh:
            parsed = _json.load(fh).get("parsed", {})
        extra = parsed.get("extra", {})
        if "src_eq_ms_per_60s_signal" in extra:
            return float(extra["src_eq_ms_per_60s_signal"]) * 1e-3
        # Only derive t1 from the headline metric when it measures the SAME
        # workload this harness times (SRC+EQ, no spectra).  The round-3+
        # metric "src_eq_fft_chain_..." includes the spectra stage — using
        # it here would overstate efficiency ~9% — so it falls through to
        # the measured SRC+EQ fallback constant instead.
        if parsed.get("metric") == "src_eq_chain_input_samples_per_sec_per_chip" \
                and float(parsed.get("value", 0)) > 0:
            return 60.0 * 44100.0 / float(parsed["value"])
    except (OSError, ValueError, KeyError):
        pass
    return _T1_FALLBACK


T1_PER_60S = t1_per_60s()


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--seconds", type=float, default=600.0)
    ap.add_argument("--channels", type=int, default=8)
    ap.add_argument("--coordinator", default=None)
    ap.add_argument("--num-processes", type=int, default=None)
    ap.add_argument("--process-id", type=int, default=None)
    ap.add_argument("--channel-hosts", type=int, default=None,
                    help="hosts on the channel axis (default: all)")
    ap.add_argument("--reps", type=int, default=5)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from dsp_audio_project_tpu import EQConfig, PipelineConfig, SRCConfig
    from dsp_audio_project_tpu.config import KernelConfig
    from dsp_audio_project_tpu.oracle import pipeline_oracle, snr_db
    from dsp_audio_project_tpu.parallel import distributed as dist
    from dsp_audio_project_tpu.parallel.pipeline import (
        BLOCK_AXIS, CHANNEL_AXIS, build_sharded_pipeline,
    )
    from jax.sharding import NamedSharding, PartitionSpec as P

    try:
        dist.initialize(args.coordinator, args.num_processes, args.process_id)
    except ValueError:
        # No pod env and no explicit coordinator: single-process run (the
        # harness still exercises the sharded path over local devices).
        if args.coordinator is not None:
            raise
        print("jax.distributed unavailable; single-process run", flush=True)
    mesh = dist.multihost_mesh(args.channel_hosts)
    n_dev = len(jax.devices())
    if dist.is_primary():
        print(f"mesh: {dict(zip(mesh.axis_names, mesh.devices.shape))} "
              f"over {n_dev} devices / {jax.process_count()} processes")

    fs = 44100
    n = int(args.seconds * fs)
    cfg = PipelineConfig(
        src=SRCConfig(L=160, M=147),
        eq=EQConfig.from_gains({"Sub-Bass": 6, "Bass": -3, "High Mids": 12,
                                "Presence": -15, "Brilliance": 4}),
        kernels=KernelConfig(eq_fast=True, src_fast=True),
    )
    rng = np.random.default_rng(0)
    x = (rng.standard_normal((args.channels, n)) * 0.4).astype(np.float32)

    # Build/compile ONCE; steady-state reps reuse the executable (run_sharded
    # wraps this but rebuilds the jit per call — wrong shape for timing).
    t0 = time.perf_counter()
    fn, sp = build_sharded_pipeline(mesh, cfg, fs, n, args.channels,
                                    fused=True)
    mesh_block = mesh.shape[BLOCK_AXIS]
    xp = np.zeros((sp.c_pad, sp.n_in_local * mesh_block), dtype=np.float32)
    xp[: args.channels, :n] = x
    sharding = NamedSharding(mesh, P(CHANNEL_AXIS, BLOCK_AXIS))
    xd = jax.device_put(xp, sharding)
    z, _ = fn(xd)
    jax.block_until_ready(z)
    fs_out = cfg.src.output_rate(fs)
    if dist.is_primary():
        print(f"compile+first-run {time.perf_counter() - t0:.1f}s "
              f"out={z.shape}@{fs_out}")

    # Steady-state timing (wall clock across reps; all processes in step).
    t0 = time.perf_counter()
    for _ in range(args.reps):
        z, _ = fn(xd)
        jax.block_until_ready(z)
    dt = (time.perf_counter() - t0) / args.reps
    z = np.asarray(z)[: args.channels, : sp.n_out]

    if dist.is_primary():
        total_in = args.channels * n
        sps = total_in / dt
        t1 = T1_PER_60S * (args.seconds / 60.0) * args.channels
        eff = (t1 / n_dev) / dt
        q = snr_db(
            pipeline_oracle(x[0], fs, cfg.src, cfg.eq, engine="fast")[0],
            np.asarray(z)[0],
        )
        print(f"steady-state: {dt*1e3:.3f} ms/rep -> {sps/1e9:.2f} G "
              f"input samples/s total ({sps/n_dev/1e9:.2f} G/chip)")
        if jax.process_count() == 1 and n_dev == 1:
            print("note: single chip behind a remote tunnel — wall clock "
                  "is dispatch-dominated; efficiency numbers are only "
                  "meaningful on locally-attached pod hosts")
        print(f"scaling efficiency vs single-chip extrapolation: "
              f"{100*eff:.1f}% (model: docs/SCALING.md)")
        print(f"snr vs oracle (ch 0): {q:.1f} dB (gate 60)")
        if q <= 60.0:
            return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
