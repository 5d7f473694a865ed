"""Run the COMPILED sharded fused pipeline on the real TPU chip (1x1 mesh).

VERDICT round-1 item 3a: the shard_map + Pallas composition had only ever
executed in interpret mode on the virtual CPU mesh.  This script compiles
and runs it on the real chip over a 1x1 (channel x block) mesh — same code
path as a pod run, minus cross-chip traffic — checks SNR vs the oracle, and
reports its device-time overhead vs the unsharded fused path.

Usage:  python scripts/sharded_real_chip.py  [seconds]
"""
from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    import jax
    import jax.numpy as jnp

    from dsp_audio_project_tpu import EQConfig, PipelineConfig, SRCConfig
    from dsp_audio_project_tpu.utils.compcache import enable as _cc

    _cc()
    from dsp_audio_project_tpu.config import KernelConfig, MeshConfig
    from dsp_audio_project_tpu.models.chain import AudioPipeline
    from dsp_audio_project_tpu.oracle import pipeline_oracle, snr_db
    from dsp_audio_project_tpu.parallel.mesh import build_mesh
    from dsp_audio_project_tpu.parallel.pipeline import (
        build_sharded_pipeline, run_sharded,
    )
    from dsp_audio_project_tpu.utils.deviceprof import profile_device_ops

    seconds = float(sys.argv[1]) if len(sys.argv) > 1 else 10.0
    fs = 44100
    n = int(seconds * fs)
    assert jax.default_backend() == "tpu", "this script targets the real chip"

    cfg = PipelineConfig(
        src=SRCConfig(L=160, M=147),
        eq=EQConfig.from_gains(
            {"Sub-Bass": 6, "Bass": -3, "High Mids": 12, "Presence": -15,
             "Brilliance": 4}
        ),
        kernels=KernelConfig(eq_fast=True, src_fast=True),
    )
    channels = 8
    rng = np.random.default_rng(3)
    x = (rng.standard_normal((channels, n)) * 0.4).astype(np.float32)

    mesh = build_mesh(MeshConfig(channel_devices=1, block_devices=1))
    t0 = time.perf_counter()
    z, y, fs_out, sp = run_sharded(x, fs, cfg, mesh, fused=True)
    np.asarray(z)
    print(f"sharded compile+run: {time.perf_counter() - t0:.2f}s "
          f"out={z.shape}@{fs_out}Hz")

    want, _ = pipeline_oracle(x[0], fs, cfg.src, cfg.eq, engine="fast")
    q = min(
        snr_db(pipeline_oracle(x[c], fs, cfg.src, cfg.eq, engine="fast")[0],
               np.asarray(z)[c])
        for c in range(2)
    )
    print(f"sharded fused 1x1 on real chip: SNR >= {q:.1f} dB (gate 60)")
    assert q > 60.0

    # Device-time comparison vs the unsharded fused path on the same batch.
    fn_sharded, sp2 = build_sharded_pipeline(mesh, cfg, fs, n, channels,
                                             fused=True)
    xp = np.zeros((sp2.c_pad, sp2.n_in_local), dtype=np.float32)
    xp[:channels, :n] = x
    xd = jax.device_put(jnp.asarray(xp))

    def run_s(v):
        z, _ = fn_sharded(v)
        return jnp.sum(z)

    f_s = jax.jit(run_s)
    float(f_s(xd))
    ms_sharded, _ = profile_device_ops(f_s, xd)

    pipe = AudioPipeline(cfg)
    fn_flat = pipe.jit_forward_frames()
    xb = jax.device_put(jnp.asarray(x))

    def run_u(v):
        z, _ = fn_flat(v, fs)
        return jnp.sum(z)

    f_u = jax.jit(run_u)
    float(f_u(xb))
    ms_unsharded, _ = profile_device_ops(f_u, xb)

    ratio = ms_sharded / ms_unsharded
    print(
        f"device time ({channels} ch x {seconds:.0f}s): sharded 1x1 "
        f"{ms_sharded:.3f} ms vs unsharded {ms_unsharded:.3f} ms "
        f"-> overhead {100 * (ratio - 1):.1f}%"
    )

    # EQ-fused cat shards (round 5) vs the unsharded cat chain.
    z_cat, _, _, _ = run_sharded(x, fs, cfg, mesh, cat=True)
    q_cat = min(
        snr_db(pipeline_oracle(x[c], fs, cfg.src, cfg.eq, engine="fast")[0],
               np.asarray(z_cat)[c])
        for c in range(2)
    )
    print(f"sharded CAT 1x1 on real chip: SNR >= {q_cat:.1f} dB (gate 60)")
    assert q_cat > 60.0
    fn_cat, sp3 = build_sharded_pipeline(mesh, cfg, fs, n, channels,
                                         fused=True, cat=True)
    xp3 = np.zeros((sp3.c_pad, sp3.n_in_local), dtype=np.float32)
    xp3[:channels, :n] = x
    xd3 = jax.device_put(jnp.asarray(xp3))
    f_sc = jax.jit(lambda v: jnp.sum(fn_cat(v)))
    float(f_sc(xd3))
    ms_sharded_cat, _ = profile_device_ops(f_sc, xd3)

    fn_ucat = pipe.jit_forward_cat()
    f_uc = jax.jit(lambda v: jnp.sum(fn_ucat(v, fs)))
    float(f_uc(xb))
    ms_unsharded_cat, _ = profile_device_ops(f_uc, xb)
    r2 = ms_sharded_cat / ms_unsharded_cat
    print(
        f"device time CAT ({channels} ch x {seconds:.0f}s): sharded 1x1 "
        f"{ms_sharded_cat:.3f} ms vs unsharded {ms_unsharded_cat:.3f} ms "
        f"-> overhead {100 * (r2 - 1):.1f}%"
    )


if __name__ == "__main__":
    main()
