"""Unit tier: spectrum op vs golden oracle."""
import numpy as np
import pytest
import jax.numpy as jnp

from dsp_audio_project_tpu import magnitude_spectrum, angular_spectrum
from dsp_audio_project_tpu.oracle import spectrum_oracle


@pytest.mark.parametrize("n", [100, 1000, 2048, 5000, 150000])
def test_magnitude_spectrum(n, rng):
    fs = 44100
    x = rng.standard_normal(n).astype(np.float32)
    fw, mw = spectrum_oracle(x[: min(n, 100000)], fs)
    fg, mg = magnitude_spectrum(jnp.asarray(x), fs)
    mg = np.asarray(mg)
    np.testing.assert_allclose(fg, fw)
    assert mg.shape == mw.shape
    assert np.max(np.abs(mg - mw)) / max(np.max(mw), 1e-9) < 1e-4


def test_magnitude_spectrum_bin_counts(rng):
    # 1025 bins for long signals (2048-pt window); 513 for 1000 -> padded 1024.
    fs = 44100
    f1, m1 = magnitude_spectrum(jnp.asarray(rng.standard_normal(5000).astype(np.float32)), fs)
    assert m1.shape[-1] == 1025 and len(f1) == 1025
    f2, m2 = magnitude_spectrum(jnp.asarray(rng.standard_normal(1000).astype(np.float32)), fs)
    assert m2.shape[-1] == 513 and len(f2) == 513


def test_magnitude_spectrum_batched(rng):
    fs = 48000
    x = rng.standard_normal((5, 8192)).astype(np.float32)
    _, mg = magnitude_spectrum(jnp.asarray(x), fs)
    mg = np.asarray(mg)
    for c in range(5):
        _, mw = spectrum_oracle(x[c], fs)
        assert np.max(np.abs(mg[c] - mw)) / np.max(mw) < 1e-4


def test_angular_spectrum(rng):
    x = rng.standard_normal(1024).astype(np.float32)
    w, mag = angular_spectrum(jnp.asarray(x))
    want = np.abs(np.fft.fftshift(np.fft.fft(x)))
    assert w[0] == -np.pi and w[-1] == np.pi
    assert np.max(np.abs(np.asarray(mag) - want)) / np.max(want) < 1e-5


def test_short_tail_segment(rng):
    """nfft < N < mid + nfft: the reference crashes here (short non-pow2
    center segment into its recursive FFT); the build pads cleanly."""
    fs = 48000
    x = rng.standard_normal(2731).astype(np.float32)
    f, m = magnitude_spectrum(jnp.asarray(x), fs)
    # tail = 2731 - 1365 = 1366 -> padded to 2048 -> 1025 bins
    assert m.shape[-1] == 1025
    want = np.abs(np.fft.rfft(
        np.pad(x[1365:], (0, 2048 - 1366)) * np.hanning(2048)))
    np.testing.assert_allclose(np.asarray(m), want, rtol=1e-3, atol=1e-3)


def test_stft_matches_direct_windows(rng):
    from dsp_audio_project_tpu.ops.spectrum import stft

    n, nfft, hop = 10000, 1024, 256
    x = rng.standard_normal(n).astype(np.float32)
    got = np.asarray(stft(jnp.asarray(x), nfft=nfft, hop=hop))
    frames = -(-n // hop)
    assert got.shape == (frames, nfft // 2 + 1)
    win = 0.5 - 0.5 * np.cos(2 * np.pi * np.arange(nfft) / (nfft - 1))
    xp = np.pad(x, (0, (frames + nfft // hop - 1) * hop - n))
    for k in [0, 3, frames // 2, frames - 1]:
        want = np.fft.rfft(xp[k * hop : k * hop + nfft] * win)
        err = np.max(np.abs(got[k] - want)) / max(1e-9, np.max(np.abs(want)))
        assert err < 1e-4, (k, err)


def test_stft_batched_and_spectrogram(rng):
    from dsp_audio_project_tpu.ops.spectrum import spectrogram, stft

    x = rng.standard_normal((3, 8192)).astype(np.float32)
    s = np.asarray(stft(jnp.asarray(x), nfft=512, hop=128))
    assert s.shape == (3, 64, 257)
    p = np.asarray(spectrogram(jnp.asarray(x), nfft=512, hop=128))
    np.testing.assert_allclose(p, np.abs(s) ** 2, rtol=1e-4, atol=1e-4)


def test_stft_hop_validation(rng):
    from dsp_audio_project_tpu.ops.spectrum import stft

    with pytest.raises(ValueError, match="divide"):
        stft(jnp.zeros(1000), nfft=1024, hop=300)


def test_stft_planes_matches_stft(rng):
    """Fetch-safe planes form recombines to the complex STFT exactly."""
    from dsp_audio_project_tpu.ops.spectrum import stft, stft_planes

    x = jnp.asarray(rng.standard_normal((2, 5000)).astype(np.float32))
    want = np.asarray(stft(x, nfft=1024, hop=256))
    p = np.asarray(stft_planes(x, nfft=1024, hop=256))
    assert p.dtype == np.float32
    assert p.shape == want.shape[:-2] + (2,) + want.shape[-2:]
    got = p[..., 0, :, :] + 1j * p[..., 1, :, :]
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("n_flat", [1500, 3000, 2048, 50000, 130000])
def test_spectrum_mag_frames_matches_flat(n_flat, rng):
    """Frame-sliced spectrum == spectrum of the flat view (all segment
    regimes: pad-to-pow2, short-tail pad corner, center window, analysis
    cap)."""
    from dsp_audio_project_tpu.ops.spectrum import (
        spectrum_mag, spectrum_mag_frames,
    )

    P = 160
    x = rng.standard_normal(n_flat).astype(np.float32)
    F = -(-n_flat // P)
    frames = jnp.asarray(
        np.pad(x, (0, F * P - n_flat)).reshape(F, P)
    )
    want = np.asarray(spectrum_mag(jnp.asarray(x)))
    got = np.asarray(spectrum_mag_frames(frames, n_flat))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_spectrum_mag_frames_batched(rng):
    from dsp_audio_project_tpu.ops.spectrum import (
        spectrum_mag, spectrum_mag_frames,
    )

    P, n_flat, B = 160, 20000, 3
    xs = rng.standard_normal((B, n_flat)).astype(np.float32)
    F = -(-n_flat // P)
    frames = jnp.asarray(
        np.pad(xs, ((0, 0), (0, F * P - n_flat))).reshape(B, F, P)
    )
    want = np.asarray(spectrum_mag(jnp.asarray(xs)))
    got = np.asarray(spectrum_mag_frames(frames, n_flat))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_spectrum_freqs_matches_magnitude_spectrum(rng):
    from dsp_audio_project_tpu.ops.spectrum import spectrum_freqs

    fs = 44100
    for n in (1000, 5000, 130000):
        x = rng.standard_normal(n).astype(np.float32)
        fw, _ = magnitude_spectrum(jnp.asarray(x), fs)
        np.testing.assert_allclose(spectrum_freqs(n, fs), fw)


def test_spectra_mag_stacked_matches_separate():
    """One-launch stacked spectra == per-signal spectrum_mag exactly."""
    import jax.numpy as jnp

    from dsp_audio_project_tpu.config import SpectrumConfig
    from dsp_audio_project_tpu.ops.spectrum import (
        spectra_mag_stacked, spectrum_mag, spectrum_window,
    )

    rng = np.random.default_rng(0)
    cfg = SpectrumConfig()
    sigs = [jnp.asarray(rng.standard_normal((2, n)).astype(np.float32))
            for n in (50000, 50000, 50000)]
    stacked = spectra_mag_stacked([spectrum_window(s, cfg) for s in sigs])
    for got, s in zip(stacked, sigs):
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(spectrum_mag(s, cfg)), rtol=0,
            atol=1e-5,
        )
    # Mixed widths fall back to per-segment calls, same results.
    mixed = [jnp.asarray(rng.standard_normal((500,)).astype(np.float32)),
             jnp.asarray(rng.standard_normal((50000,)).astype(np.float32))]
    outs = spectra_mag_stacked([spectrum_window(s, cfg) for s in mixed])
    for got, s in zip(outs, mixed):
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(spectrum_mag(s, cfg)), atol=1e-5,
        )
