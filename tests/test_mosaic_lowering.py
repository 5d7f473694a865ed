"""Cross-lower every production Pallas kernel to TPU MLIR from CPU.

Interpret-mode tests run kernels as plain JAX on CPU and therefore can NOT
catch Mosaic lowering failures — round 3 shipped a kernel whose
``value.at[].add`` lowered to scatter-add (no Mosaic primitive) and it was
only caught on the real chip.  ``jax.jit(f).trace(x).lower(
lowering_platforms=("tpu",))`` runs the JAX->Mosaic MLIR lowering on a CPU
host, so unsupported primitives (scatter, gather, sorts, ...) fail HERE, in
CI.

Limits: the Mosaic pass pipeline itself (infer-vector-layout — e.g.
non-lane-width reshape "unsupported shape cast") runs inside libtpu at
compile time and still needs hardware; probe those with
``scripts/mosaic_capability.py`` before relying on a new in-kernel
relayout.  The supported-relayout rules found there are documented in that
script's docstring.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest


def lower_tpu(fn, *args):
    """Trace on CPU, lower for TPU; raises on unlowerable kernel bodies."""
    jax.jit(fn).trace(*args).lower(lowering_platforms=("tpu",))


def test_fir_kernels_lower_for_tpu():
    from dsp_audio_project_tpu.kernels import fir_frames
    from dsp_audio_project_tpu.kernels.fir_class import (
        class_flat_supported, polyphase_fir_class_flat,
    )
    from dsp_audio_project_tpu.kernels.fir_shear import (
        polyphase_fir_shear_frames,
    )
    from dsp_audio_project_tpu.ops.src import make_plan

    plan = make_plan(160, 147)
    n = 44100
    n_out = -(-n * 160 // 147)
    x = jnp.zeros((2, n), jnp.float32)
    for precision in (jax.lax.Precision.HIGHEST, "fast"):
        lower_tpu(lambda v: fir_frames(v, plan, n_out, kernel="class",
                                       precision=precision), x)
        lower_tpu(lambda v: fir_frames(v, plan, n_out, kernel="rect",
                                       precision=precision), x)
        lower_tpu(lambda v: polyphase_fir_shear_frames(
            v, plan, n_out, precision=precision), x)
        assert class_flat_supported(plan)
        lower_tpu(lambda v: polyphase_fir_class_flat(
            v, plan, n_out, precision=precision), x)


def test_rfft_kernels_lower_for_tpu():
    from dsp_audio_project_tpu.kernels.rfft import (
        rfft_pallas_four_step, rfft_pallas_four_step_tall,
    )

    for n, n1 in ((256, 2), (2048, 16)):
        x = jnp.zeros((4, n), jnp.float32)
        for mag in (False, True):
            lower_tpu(lambda v: rfft_pallas_four_step(
                v, n1=n1, magnitude=mag, precision="fast"), x)
    for n, (rt, n2) in ((16384, (16, 128)), (65536, (1, 128)),
                        (131072, (1, 256)), (262144, (1, 512)),
                        (524288, (1, 512))):   # 524288: bf16-pair D1 path
        x = jnp.zeros((rt, n), jnp.float32)
        lower_tpu(lambda v: rfft_pallas_four_step_tall(
            v, row_tile=rt, n2=n2, magnitude=True, precision="fast"), x)


def test_pipeline_forwards_lower_for_tpu():
    """The whole jitted serving programs (Pallas + XLA ops) cross-lower."""
    from dsp_audio_project_tpu import (
        AudioPipeline, EQConfig, PipelineConfig, SRCConfig,
    )
    from dsp_audio_project_tpu.config import KernelConfig

    cfg = PipelineConfig(
        src=SRCConfig(L=160, M=147),
        eq=EQConfig.from_gains({"Bass": 6, "High Mids": -4}),
        kernels=KernelConfig(eq_fast=True, src_fast=True),
    )
    pipe = AudioPipeline(cfg)
    n = 44100
    x = jnp.zeros((2, n), jnp.float32)
    assert pipe.frames_supported(n) and pipe.flat_supported(n)
    for fwd in (pipe._forward_frames, pipe._forward_frames_spectra,
                pipe._forward_flat, pipe._forward_flat_spectra):
        lower_tpu(lambda v, f=fwd: f(v, 44100), x)
