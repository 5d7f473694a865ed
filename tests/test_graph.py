"""Composable-graph tier: chained stages vs sequential oracle application."""
import numpy as np

from dsp_audio_project_tpu import EQConfig, SRCConfig
from dsp_audio_project_tpu.models.graph import (
    Chain, Clip, Equalize, Gain, Normalize, Resample,
)
from dsp_audio_project_tpu.oracle import (
    equalize_oracle, resample_oracle, snr_db,
)

from conftest import make_test_signal


def test_chain_matches_stagewise_oracle():
    fs = 44100
    x = make_test_signal(20000, fs, seed=31)
    chain = Chain([
        Resample(SRCConfig(L=2, M=3)),
        Equalize(EQConfig.from_gains({"Bass": 6})),
        Resample(SRCConfig(L=3, M=2)),
    ])
    y, fs_out = chain(x, fs)
    assert fs_out == fs  # down then up restores the rate

    o1, f1 = resample_oracle(x, fs, SRCConfig(L=2, M=3), engine="fast")
    o2 = equalize_oracle(o1, f1, EQConfig.from_gains({"Bass": 6}))
    o3, f3 = resample_oracle(o2.astype(np.float32), f1, SRCConfig(L=3, M=2),
                             engine="fast")
    assert f3 == fs_out
    got = np.asarray(y)
    assert got.shape == o3.shape
    assert snr_db(o3, got) > 60.0


def test_gain_clip_normalize():
    fs = 48000
    x = make_test_signal(4096, fs, seed=2) * 0.5
    y, _ = Chain([Gain(12.0), Clip(1.0)])(x, fs)
    y = np.asarray(y)
    assert np.max(np.abs(y)) <= 1.0
    want = np.clip(x * 10 ** (12 / 20), -1, 1)
    np.testing.assert_allclose(y, want, atol=1e-5)

    z, _ = Chain([Gain(-40.0), Normalize()])(x, fs)
    assert abs(np.max(np.abs(np.asarray(z))) - 1.0) < 1e-5


def test_nested_chains():
    fs = 44100
    x = make_test_signal(8192, fs, seed=9)
    inner = Chain([Equalize(EQConfig.from_gains({"Presence": -6}))])
    outer = Chain([Resample(SRCConfig(L=1, M=2)), inner])
    y, fs_out = outer(x, fs)
    assert fs_out == fs // 2
    o1, f1 = resample_oracle(x, fs, SRCConfig(L=1, M=2), engine="fast")
    o2 = equalize_oracle(o1, f1, EQConfig.from_gains({"Presence": -6}))
    assert snr_db(o2, np.asarray(y)) > 60.0


def test_telephone_effect_rates():
    # 44.1k -> 6.3k -> 44.1k rate ladder compiles and restores the rate.
    fs = 44100
    x = make_test_signal(8192, fs, seed=3)
    phone = Chain([
        Resample(SRCConfig(L=1, M=7, taps_rule_factor=10)),
        Resample(SRCConfig(L=7, M=1, taps_rule_factor=10)),
        Clip(),
    ])
    y, fs_out = phone(x, fs)
    assert fs_out == fs
    # band-limited to ~3.15 kHz: high-frequency energy must collapse
    spec = np.abs(np.fft.rfft(np.asarray(y)))
    freqs = np.fft.rfftfreq(len(np.asarray(y)), 1 / fs)
    hi = spec[freqs > 5000].sum()
    lo = spec[freqs < 3000].sum()
    assert hi < 0.05 * lo
