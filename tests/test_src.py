"""Unit tier: polyphase SRC vs golden oracle.

Gates (SURVEY.md §4): output length ceil(N*L/M), 'same' centering parity,
L=M=1 bypass identity, and >= 60 dB SNR on the full factor grid (the
reference UI exposes L, M in [1, 8], app.py:149-150).
"""
import numpy as np
import pytest
import jax.numpy as jnp

from dsp_audio_project_tpu import SRCConfig, resample
from dsp_audio_project_tpu.oracle import resample_oracle, snr_db

SNR_GATE_DB = 60.0


def _run(x, fs, L, M):
    cfg = SRCConfig(L=L, M=M)
    want, fs_want = resample_oracle(x, fs, cfg)
    got, fs_got = resample(jnp.asarray(x), fs, cfg)
    got = np.asarray(got)
    assert fs_got == fs_want
    assert got.shape == want.shape, (got.shape, want.shape)
    return want, got


@pytest.mark.parametrize("L,M", [(1, 2), (2, 1), (2, 3), (3, 2), (8, 7),
                                 (7, 8), (1, 8), (8, 1), (4, 6), (2, 2)])
def test_src_factor_grid(audio_short, L, M):
    x, fs = audio_short
    want, got = _run(x, fs, L, M)
    assert snr_db(want, got) > SNR_GATE_DB


def test_src_441_to_48(audio_44k):
    # The headline config: 44.1k -> 48k is L=160/M=147 (BASELINE.json config 1).
    x, fs = audio_44k
    cfg = SRCConfig(L=160, M=147)
    want, fs_want = resample_oracle(x, fs, cfg)
    got, fs_got = resample(jnp.asarray(x), fs, cfg)
    got = np.asarray(got)
    assert fs_got == fs_want == 48000
    assert got.shape == want.shape == (48000,)
    assert snr_db(want, got) > SNR_GATE_DB


def test_src_bypass_identity(audio_short):
    x, fs = audio_short
    got, fs_got = resample(jnp.asarray(x), fs, SRCConfig(L=1, M=1))
    assert fs_got == fs
    np.testing.assert_array_equal(np.asarray(got), x)


def test_src_batched(audio_short):
    x, fs = audio_short
    xs = np.stack([x, x[::-1].copy()])
    cfg = SRCConfig(L=3, M=2)
    got, _ = resample(jnp.asarray(xs), fs, cfg)
    got = np.asarray(got)
    for c in range(2):
        want, _ = resample_oracle(xs[c], fs, cfg)
        assert snr_db(want, got[c]) > SNR_GATE_DB


@pytest.mark.parametrize("n", [1, 7, 100, 1000])
def test_src_short_signals(n):
    x = np.linspace(-1, 1, n, dtype=np.float32)
    cfg = SRCConfig(L=3, M=4)
    want, _ = resample_oracle(x, 44100, cfg)
    got, _ = resample(jnp.asarray(x), 44100, cfg)
    got = np.asarray(got)
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=1e-5)
