"""FLAC codec: lossless roundtrips through every decoder path + fuzz.

The reference's loader delegates to libsndfile (dsp_core.py:20), which also
accepts FLAC; io/flacio.py closes that loader-contract gap.  With no FLAC
oracle in the image, coverage comes from the in-repo fixture encoder
(bit-exact by construction) plus structural fuzz: truncation sweeps and
byte mutations must raise ValueError or decode cleanly — never crash, hang,
or overread.
"""
import io

import numpy as np
import pytest

from dsp_audio_project_tpu.io.flacio import read_flac, write_flac
from dsp_audio_project_tpu.io.signal_io import load_signal


def _rand_int(rng, n, c, bits):
    lim = 1 << (bits - 1)
    shape = (n,) if c == 1 else (n, c)
    return rng.integers(-lim, lim, size=shape, dtype=np.int64)


@pytest.mark.parametrize("bits", [8, 16, 24, 32])
@pytest.mark.parametrize("channels", [1, 2])
def test_flac_verbatim_roundtrip(bits, channels, rng):
    x = _rand_int(rng, 1000, channels, bits)
    buf = io.BytesIO()
    write_flac(buf, 44100, x, bits=bits, blocksize=256, subframe="verbatim")
    y, fs = read_flac(buf.getvalue())
    assert fs == 44100
    want = x.astype(np.float64) / (1 << (bits - 1))
    np.testing.assert_array_equal(np.asarray(y), want)


@pytest.mark.parametrize("subframe", ["constant", "fixed", "auto"])
def test_flac_subframe_modes_roundtrip(subframe, rng):
    n = 700
    if subframe == "constant":
        x = np.full((n, 2), -123, dtype=np.int64)
    else:
        # Smooth signal: FIXED order-2 prediction leaves small residuals,
        # exercising the Rice path at realistic parameters.
        t = np.arange(n)
        x = np.stack([
            (3000 * np.sin(2 * np.pi * t / 50)).astype(np.int64),
            (2000 * np.cos(2 * np.pi * t / 37)).astype(np.int64),
        ], axis=1)
    buf = io.BytesIO()
    write_flac(buf, 48000, x, bits=16, blocksize=192, subframe=subframe)
    y, fs = read_flac(buf.getvalue())
    assert fs == 48000
    np.testing.assert_array_equal(np.asarray(y) * (1 << 15), x)


@pytest.mark.parametrize(
    "mode", ["independent", "left_side", "right_side", "mid_side"]
)
def test_flac_stereo_decorrelation_roundtrip(mode, rng):
    x = _rand_int(rng, 900, 2, 16)
    buf = io.BytesIO()
    write_flac(buf, 44100, x, bits=16, blocksize=256, subframe="verbatim",
               stereo_mode=mode)
    y, fs = read_flac(buf.getvalue())
    np.testing.assert_array_equal(np.asarray(y) * (1 << 15), x)


def test_flac_24bit_stereo_fixed(rng):
    t = np.arange(2000)
    x = np.stack([
        (400000 * np.sin(2 * np.pi * t / 441)).astype(np.int64),
        (300000 * np.sin(2 * np.pi * t / 300)).astype(np.int64),
    ], axis=1)
    buf = io.BytesIO()
    write_flac(buf, 44100, x, bits=24, subframe="fixed",
               stereo_mode="mid_side")
    y, _ = read_flac(buf.getvalue())
    np.testing.assert_array_equal(np.asarray(y) * (1 << 23), x)


def test_flac_nonstandard_rate_and_multiframe(rng):
    x = _rand_int(rng, 5000, 1, 16)
    buf = io.BytesIO()
    write_flac(buf, 12345, x, bits=16, blocksize=1024)
    y, fs = read_flac(buf.getvalue())
    assert fs == 12345
    np.testing.assert_array_equal(np.asarray(y) * (1 << 15), x)


def test_flac_through_load_signal(rng):
    """Magic-sniffed FLAC through the reference load contract: mono mean,
    f32 cast, peak normalize — identical to the WAV path on equal samples."""
    from dsp_audio_project_tpu.io.wavio import write_wav

    x = _rand_int(rng, 3000, 2, 16).astype(np.int16)
    fbuf, wbuf = io.BytesIO(), io.BytesIO()
    write_flac(fbuf, 44100, x.astype(np.int64), bits=16)
    write_wav(wbuf, 44100, x)
    got_f, fs_f = load_signal(fbuf.getvalue())
    got_w, fs_w = load_signal(wbuf.getvalue())
    assert fs_f == fs_w == 44100
    np.testing.assert_allclose(got_f, got_w, atol=2e-7)
    assert got_f.dtype == np.float32
    assert np.max(np.abs(got_f)) <= 1.0 + 1e-6

    got_c, _ = load_signal(fbuf.getvalue(), mono=False)
    assert got_c.shape == (2, 3000)


def test_flac_corruption_detection(rng):
    """CRC-protected: flipping any frame byte raises, never mis-decodes."""
    x = _rand_int(rng, 500, 1, 16)
    buf = io.BytesIO()
    write_flac(buf, 44100, x, bits=16, blocksize=256)
    data = bytearray(buf.getvalue())
    frame_start = 4 + 4 + 34  # fLaC + block header + STREAMINFO
    hits = 0
    for off in range(frame_start, min(len(data), frame_start + 64)):
        bad = bytearray(data)
        bad[off] ^= 0x40
        try:
            read_flac(bytes(bad))
        except ValueError:
            hits += 1
    assert hits >= 60  # essentially every header/payload flip is caught


def test_flac_truncation_sweep(rng):
    x = _rand_int(rng, 400, 2, 16)
    buf = io.BytesIO()
    write_flac(buf, 44100, x, bits=16, blocksize=128)
    data = buf.getvalue()
    for cut in list(range(0, 60)) + list(range(60, len(data), 97)):
        try:
            read_flac(data[:cut])
        except ValueError:
            continue  # clean rejection


def test_flac_mutation_fuzz(rng):
    x = _rand_int(rng, 600, 2, 16)
    buf = io.BytesIO()
    write_flac(buf, 44100, x, bits=16, blocksize=192)
    data = bytearray(buf.getvalue())
    for trial in range(300):
        bad = bytearray(data)
        for _ in range(int(rng.integers(1, 4))):
            bad[int(rng.integers(0, len(bad)))] = int(rng.integers(0, 256))
        try:
            y, fs = read_flac(bytes(bad))
            assert np.all(np.isfinite(np.asarray(y, dtype=np.float64)))
        except ValueError:
            pass  # clean rejection is the expected common case


def test_flac_load_signal_fallback_on_garbage():
    x, fs = load_signal(b"fLaC" + b"\x00" * 64)
    assert fs == 44100 and len(x) == 100 and not x.any()
