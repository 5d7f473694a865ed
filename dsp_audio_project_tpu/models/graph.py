"""Composable processing graphs: arbitrary chains of jittable DSP stages.

`AudioPipeline` (chain.py) is the fixed reference cascade (SRC -> EQ).  Real
deployments compose more: multi-stage rate ladders (44.1k -> 8k -> 44.1k
"telephone" effects), EQ before and after conversion, gain staging.  A
``Chain`` is itself a ``Stage``, so graphs nest; the whole chain traces into
ONE XLA program per (config, input shape) — stage boundaries cost nothing
at runtime.

Every stage maps ``(x, fs) -> (y, fs_out)`` on (..., N) float32 arrays with
a STATIC rate transform (known at trace time), which is what keeps shapes
static under jit.
"""
from __future__ import annotations

import dataclasses
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp

from ..config import EQConfig, KernelConfig, SRCConfig
from ..ops.eq import equalize
from ..ops.src import resample


class Stage:
    """Interface: ``apply`` under trace; ``output_rate`` on host."""

    def apply(self, x: jnp.ndarray, fs: int) -> Tuple[jnp.ndarray, int]:
        raise NotImplementedError

    def output_rate(self, fs: int) -> int:
        return fs


@dataclasses.dataclass(frozen=True)
class Resample(Stage):
    """L/M rate conversion (reference C5 semantics)."""

    config: SRCConfig

    def apply(self, x, fs):
        return resample(x, fs, self.config)

    def output_rate(self, fs):
        return self.config.output_rate(fs) if not self.config.bypass else fs


@dataclasses.dataclass(frozen=True)
class Equalize(Stage):
    """6-band peaking-EQ cascade (reference C8 semantics)."""

    config: EQConfig
    kernels: KernelConfig = KernelConfig()

    def apply(self, x, fs):
        return (
            equalize(x, fs, self.config, block=self.kernels.iir_block,
                     unroll=self.kernels.iir_unroll),
            fs,
        )


@dataclasses.dataclass(frozen=True)
class Gain(Stage):
    """Scalar gain in dB."""

    db: float

    def apply(self, x, fs):
        return x * jnp.float32(10.0 ** (self.db / 20.0)), fs


@dataclasses.dataclass(frozen=True)
class Clip(Stage):
    """Hard clip to [-limit, limit] (the reference clips at 1.0)."""

    limit: float = 1.0

    def apply(self, x, fs):
        return jnp.clip(x, -self.limit, self.limit), fs


@dataclasses.dataclass(frozen=True)
class Normalize(Stage):
    """Peak-normalize when the peak exceeds ``guard`` (C1 semantics)."""

    guard: float = 1e-6

    def apply(self, x, fs):
        peak = jnp.max(jnp.abs(x))
        scale = jnp.where(peak > self.guard, 1.0 / peak, 1.0)
        return x * scale.astype(jnp.float32), fs


class Chain(Stage):
    """A sequence of stages, jitted as one program.

    Usage:
        telephone = Chain([
            Resample(SRCConfig(L=20, M=147, taps_rule_factor=4)),  # 44.1k->6k
            Equalize(EQConfig.from_gains({"Low Mids": 6})),
            Resample(SRCConfig(L=147, M=20, taps_rule_factor=4)),  # back up
            Clip(),
        ])
        y, fs_out = telephone(x, 44100)
    """

    def __init__(self, stages: Sequence[Stage]):
        self.stages = tuple(stages)
        self._jitted = jax.jit(self._forward, static_argnums=(1,))

    def _forward(self, x, fs):
        for stage in self.stages:
            x, fs = stage.apply(x, fs)
        return x

    def apply(self, x, fs):
        return self._forward(x, fs), self.output_rate(fs)

    def output_rate(self, fs: int) -> int:
        for stage in self.stages:
            fs = stage.output_rate(fs)
        return fs

    def __call__(self, x, fs: int) -> Tuple[jnp.ndarray, int]:
        x = jnp.asarray(x, dtype=jnp.float32)
        return self._jitted(x, fs), self.output_rate(fs)
