"""Streaming super-step size sweep on the real chip.

Finds the frames_per_shard at which ShardedStreamProcessor's steady-state
device throughput approaches the one-shot chain (VERDICT r3 item 2: target
>= 60% of one-shot src+eq).  Larger super-steps amortize per-step fixed
costs (operator-bank DMA, small-grid launch overhead) at the price of
latency and host buffering.

Usage: python scripts/stream_sweep.py [FL ...]   (default 1024 2048 4096 8192)
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax

from dsp_audio_project_tpu import EQConfig, PipelineConfig, SRCConfig
from dsp_audio_project_tpu.config import KernelConfig, MeshConfig
from dsp_audio_project_tpu.parallel.mesh import build_mesh
from dsp_audio_project_tpu.streaming import ShardedStreamProcessor
from dsp_audio_project_tpu.utils.compcache import enable as _cc
from dsp_audio_project_tpu.utils.deviceprof import profile_device_span

_cc()

FS = 44100
GAINS = {"Sub-Bass": 6, "Bass": -3, "High Mids": 12, "Presence": -15,
         "Brilliance": 4}


def log(m):
    print(m, file=sys.stderr, flush=True)


def main():
    fls = [int(a) for a in sys.argv[1:]] or [1024, 2048, 4096, 8192]
    # Signal long enough for >= 3 steps at the largest requested step
    # (FL=16384 needs a 240 s signal — round-4 measurement note).
    global_need = max(fls) * 147 * 3.2 / FS
    cfg = PipelineConfig(
        src=SRCConfig(L=160, M=147), eq=EQConfig.from_gains(GAINS),
        kernels=KernelConfig(eq_fast=True, src_fast=True),
    )
    mesh1 = build_mesh(MeshConfig(channel_devices=1, block_devices=1))
    C = 8
    seconds = max(120.0, global_need)
    n = int(seconds * FS)
    rng = np.random.default_rng(3)
    xs = (rng.standard_normal((C, n)) * 0.4).astype(np.float32)
    one_shot_sps = 16.03e9  # BENCH r5 src+eq line (0.165 ms / 60 s signal)
    log(f"device: {jax.devices()[0]}  C={C}  signal={seconds:.0f}s")
    for fl in fls:
        sp = ShardedStreamProcessor(cfg, FS, mesh1, C, frames_per_shard=fl)
        in_step = fl * sp._s
        n_steps = n // in_step
        if n_steps < 3:
            log(f"FL={fl}: signal too short for steady state, skipping")
            continue
        sp.process(xs[:, :in_step])  # compile + warm

        def thunk(sp=sp, in_step=in_step, n_steps=n_steps):
            res = []
            for i in range(1, n_steps):
                res.append(sp.process(xs[:, i * in_step:(i + 1) * in_step]))
            return res

        t0 = time.perf_counter()
        ms, ops = profile_device_span(thunk)
        wall = (time.perf_counter() - t0) * 1e3
        steps = n_steps - 1
        sps = steps * C * in_step / (ms / 1e3)
        log(f"FL={fl}: {ms/steps:.3f} ms/step device -> {sps/1e9:.2f} G "
            f"({sps/one_shot_sps*100:.1f}% of one-shot)  wall "
            f"{wall/steps:.0f} ms/step")
        for op, t in ops[:6]:
            log(f"    {op}: {t/steps:.4f} ms/step")


if __name__ == "__main__":
    main()
