"""Test harness configuration.

Tests run on CPU with 8 virtual devices (JAX's standard multi-device
simulation) so the same shard_map code paths that target a TPU pod slice are
exercised in CI without hardware.  Must run before anything touches a JAX
backend — pytest imports conftest first, and the environment's axon/TPU
plugin is overridden via the config API (the env var alone is not honored
in this image).
"""
import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
).strip()

import pathlib

import jax

jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: XLA:CPU compiles of the unrolled FFT stages
# cost ~20 s each; caching them makes repeated suite runs cheap.
_CACHE = pathlib.Path(__file__).parent / ".jax_cache"
jax.config.update("jax_compilation_cache_dir", str(_CACHE))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

import numpy as np
import pytest


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(1234)


def make_test_signal(n: int, fs: int, seed: int = 0) -> np.ndarray:
    """Deterministic broadband fixture: tones + sweep + noise, float32 in [-1,1].

    Synthesized because the reference's WAV fixtures were stripped from the
    mount (SURVEY.md file inventory)."""
    r = np.random.default_rng(seed)
    t = np.arange(n) / fs
    x = (
        0.35 * np.sin(2 * np.pi * 440.0 * t)
        + 0.25 * np.sin(2 * np.pi * 40.0 * t + 0.3)
        + 0.15 * np.sin(2 * np.pi * 9800.0 * t + 1.1)
        + 0.15 * np.sin(2 * np.pi * (200.0 + 4000.0 * t / t[-1]) * t)
        + 0.1 * r.standard_normal(n)
    )
    x = x / np.max(np.abs(x))
    return x.astype(np.float32)


@pytest.fixture(scope="session")
def audio_44k():
    return make_test_signal(44100, 44100, seed=7), 44100


@pytest.fixture(scope="session")
def audio_short():
    return make_test_signal(4096, 48000, seed=3), 48000
