"""Unit tier: block-parallel EQ vs golden sequential-lfilter oracle.

Gates (SURVEY.md §4): >= 60 dB SNR across gain presets, flat-EQ bypass
identity, Nyquist clamp behavior, clip bound, and block-size invariance
(the block decomposition must not change results).
"""
import numpy as np
import pytest
import jax.numpy as jnp

from dsp_audio_project_tpu import EQConfig, equalize
from dsp_audio_project_tpu.oracle import equalize_oracle, snr_db

SNR_GATE_DB = 60.0

PRESETS = [
    {"Sub-Bass": 6, "Bass": -3, "High Mids": 12, "Presence": -15, "Brilliance": 4},
    {"Sub-Bass": 15, "Bass": 15, "Low Mids": 15, "High Mids": 15,
     "Presence": 15, "Brilliance": 15},
    {"Sub-Bass": -15, "Brilliance": -15},
    {"Low Mids": 1},
]


@pytest.mark.parametrize("gains", PRESETS)
def test_eq_presets(audio_44k, gains):
    x, fs = audio_44k
    cfg = EQConfig.from_gains(gains)
    want = equalize_oracle(x, fs, cfg)
    got = np.asarray(equalize(jnp.asarray(x), fs, cfg))
    assert got.shape == want.shape
    assert snr_db(want, got) > SNR_GATE_DB


def test_eq_flat_bypass(audio_short):
    x, fs = audio_short
    cfg = EQConfig.from_gains({})
    got = np.asarray(equalize(jnp.asarray(x), fs, cfg))
    # dsp_core.py:222-223: bypass returns the input untouched (and unclipped).
    np.testing.assert_array_equal(got, x)


def test_eq_tiny_gains_bypass(audio_short):
    x, fs = audio_short
    cfg = EQConfig.from_gains({k: 0.05 for k in ("Bass", "Presence")})
    assert cfg.bypass
    np.testing.assert_array_equal(np.asarray(equalize(jnp.asarray(x), fs, cfg)), x)


def test_eq_clip_bound(audio_44k):
    x, fs = audio_44k
    cfg = EQConfig.from_gains({"Bass": 15, "Low Mids": 15})
    got = np.asarray(equalize(jnp.asarray(x), fs, cfg))
    assert np.all(got <= 1.0) and np.all(got >= -1.0)


def test_eq_nyquist_clamp(audio_short):
    # fs=48000 output: Brilliance at 10 kHz < 0.9*24 kHz stays; at fs=8000
    # both Presence and Brilliance clamp to 3600 Hz.
    x, _ = audio_short
    fs = 8000
    cfg = EQConfig.from_gains({"Presence": 5, "Brilliance": -7})
    bands = cfg.active_bands(fs)
    assert bands == ((3600.0, 5.0), (3600.0, -7.0))
    want = equalize_oracle(x, fs, cfg)
    got = np.asarray(equalize(jnp.asarray(x), fs, cfg))
    assert snr_db(want, got) > SNR_GATE_DB


@pytest.mark.parametrize("block", [128, 256, 1024, 4096])
def test_eq_block_invariance(audio_44k, block):
    x, fs = audio_44k
    cfg = EQConfig.from_gains(PRESETS[0])
    want = equalize_oracle(x, fs, cfg)
    got = np.asarray(equalize(jnp.asarray(x), fs, cfg, block=block))
    assert snr_db(want, got) > SNR_GATE_DB


def test_eq_ragged_length(audio_44k):
    # Non-multiple-of-block lengths must not perturb results.
    x, fs = audio_44k
    x = x[: 44100 - 337]
    cfg = EQConfig.from_gains(PRESETS[0])
    want = equalize_oracle(x, fs, cfg)
    got = np.asarray(equalize(jnp.asarray(x), fs, cfg))
    assert got.shape == want.shape
    assert snr_db(want, got) > SNR_GATE_DB


def test_eq_batched(audio_short):
    x, fs = audio_short
    xs = np.stack([x, -0.5 * x])
    cfg = EQConfig.from_gains(PRESETS[0])
    got = np.asarray(equalize(jnp.asarray(xs), fs, cfg))
    for c in range(2):
        want = equalize_oracle(xs[c], fs, cfg)
        assert snr_db(want, got[c]) > SNR_GATE_DB


@pytest.mark.parametrize("split", [1024, 1500, 3000])
def test_eq_streaming_matches_oneshot(audio_short, split):
    """Chunked processing with state carry == one-shot processing.

    This is the checkpoint/resume contract: the carry (2 states per band)
    plus an offset fully captures stream progress (SURVEY.md §5).
    """
    from dsp_audio_project_tpu.ops.eq import equalize_stream

    x, fs = audio_short
    cfg = EQConfig.from_gains({"Sub-Bass": 9, "Bass": 6, "Presence": -4})
    want = np.asarray(equalize(jnp.asarray(x), fs, cfg))

    y1, state = equalize_stream(jnp.asarray(x[:split]), fs, cfg)
    y2, _ = equalize_stream(jnp.asarray(x[split:]), fs, cfg, state)
    got = np.concatenate([np.asarray(y1), np.asarray(y2)])
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_eq_fast_mode(audio_44k):
    """bf16x3 output-FIR mode clears the oracle gate with wide margin and
    only perturbs the full-precision result at the bf16^2 level."""
    x, fs = audio_44k
    cfg = EQConfig.from_gains(PRESETS[0])
    want = equalize_oracle(x, fs, cfg)
    got = np.asarray(equalize(jnp.asarray(x), fs, cfg, fast=True))
    assert snr_db(want, got) > 80.0
    ref = np.asarray(equalize(jnp.asarray(x), fs, cfg))
    assert snr_db(ref, got) > 80.0


def test_equalize_frames_fast_matches_flat_fast():
    from dsp_audio_project_tpu.ops.eq import equalize_frames

    rng = np.random.default_rng(3)
    P, F = 160, 301
    fs = 48000
    cfg = EQConfig.from_gains(PRESETS[0])
    x = (0.4 * rng.standard_normal(F * P)).astype(np.float32)
    want = np.asarray(equalize(jnp.asarray(x), fs, cfg, fast=True))
    got = np.asarray(
        equalize_frames(jnp.asarray(x.reshape(F, P)), fs, cfg, fast=True)
    ).reshape(-1)
    assert snr_db(want, got) > 110.0


def test_equalize_frames_matches_flat():
    """Frame-major EQ (the fused SRC->EQ handoff) equals the flat path."""
    from dsp_audio_project_tpu.ops.eq import equalize_frames

    rng = np.random.default_rng(11)
    P, F = 160, 731
    fs = 48000
    cfg = EQConfig.from_gains({"Sub-Bass": 5.0, "Bass": -2.0,
                               "High Mids": 3.0, "Brilliance": -7.0})
    x = (0.4 * rng.standard_normal((2, F * P))).astype(np.float32)
    want = np.asarray(equalize(jnp.asarray(x), fs, cfg))
    got = np.asarray(
        equalize_frames(jnp.asarray(x.reshape(2, F, P)), fs, cfg)
    ).reshape(2, -1)
    assert snr_db(want, got) > 110.0

    # bypass semantics
    flat_cfg = EQConfig.from_gains({})
    fr = jnp.asarray(x.reshape(2, F, P))
    out = equalize_frames(fr, fs, flat_cfg)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(fr))
