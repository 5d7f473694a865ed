"""Codec robustness: structured + random fuzz of both WAV codecs, AIFF.

The reference's loader wraps decode in a bare ``except`` returning silence
(dsp_core.py:34-35) — so the framework contract is: a hostile byte stream
may FAIL CLEANLY (ValueError / struct.error from the numpy codec, a negative
return code from the native engine) but must never crash the process, hang,
or read out of bounds.  Both codecs see the same corpus; whenever both
accept an input they must agree bit-for-bit.
"""
import io
import struct

import numpy as np
import pytest

from dsp_audio_project_tpu.io import native
from dsp_audio_project_tpu.io.signal_io import load_signal
from dsp_audio_project_tpu.io.wavio import read_wav, write_wav

_OK_ERRORS = (ValueError, struct.error)


def _valid_wav(fs=8000, n=200, channels=2, dtype=np.int16) -> bytes:
    rng = np.random.default_rng(0)
    x = (rng.standard_normal((n, channels)) * 0.4).astype(np.float64)
    if dtype == np.int16:
        x = (x * 30000).astype(np.int16)
    else:
        x = x.astype(dtype)
    buf = io.BytesIO()
    write_wav(buf, fs, x)
    return buf.getvalue()


def _numpy_verdict(blob: bytes):
    """('ok', samples) or ('err', exc_type) — anything else is a bug."""
    try:
        x, fs = read_wav(blob)
        return ("ok", x)
    except _OK_ERRORS as e:
        return ("err", type(e))


def _native_verdict(blob: bytes):
    if not native.available():
        return None
    try:
        out = native.decode(blob, mono=False, normalize=False)
    except ValueError:
        return ("err", ValueError)
    return ("ok", out[0])


def _check_both(blob: bytes):
    """Run both codecs; assert parity when both accept."""
    nv = _numpy_verdict(blob)
    cv = _native_verdict(blob)
    if cv is not None and nv[0] == "ok" and cv[0] == "ok":
        got = cv[1]
        want = nv[1].astype(np.float32)
        if want.ndim == 1:
            want = want[None, :]
        else:
            want = np.ascontiguousarray(want.T)
        assert got.shape == want.shape
        np.testing.assert_array_equal(got, want)
    return nv, cv


def test_truncation_sweep():
    """Every prefix of a valid file fails cleanly or decodes a prefix."""
    blob = _valid_wav()
    for cut in range(0, len(blob), 7):
        _check_both(blob[:cut])


def test_bogus_block_align():
    """block_align inconsistent with channels*bits must be rejected.

    (An accepting decoder would misread frames; the native engine would
    read past the data chunk — the heap-over-read class of bug.)
    """
    blob = bytearray(_valid_wav(channels=2))
    # fmt chunk starts at 12+8; block_align is at offset 12 within it.
    ba_off = 12 + 8 + 12
    for bogus in (0, 1, 2, 3, 5, 65535):
        b = bytearray(blob)
        struct.pack_into("<H", b, ba_off, bogus)
        nv, cv = _check_both(bytes(b))
        assert nv[0] == "err"
        if cv is not None:
            assert cv[0] == "err"


def test_zero_channels():
    blob = bytearray(_valid_wav())
    struct.pack_into("<H", blob, 12 + 8 + 2, 0)  # channels field
    nv, cv = _check_both(bytes(blob))
    assert nv[0] == "err"
    if cv is not None:
        assert cv[0] == "err"


def test_oversized_chunk_sizes():
    """csize fields pointing past EOF must not read out of bounds."""
    blob = bytearray(_valid_wav())
    # data chunk size field: find the 'data' tag.
    off = bytes(blob).index(b"data") + 4
    for huge in (0xFFFFFFFF, 0x7FFFFFFF, len(blob) * 2):
        b = bytearray(blob)
        struct.pack_into("<I", b, off, huge)
        _check_both(bytes(b))
    # fmt chunk size too small for its own header.
    b = bytearray(blob)
    struct.pack_into("<I", b, 12 + 4, 4)
    nv, _ = _check_both(bytes(b))
    assert nv[0] == "err"


def test_extensible_short_fmt():
    """WAVE_FORMAT_EXTENSIBLE with a 16-byte fmt chunk is malformed."""
    blob = bytearray(_valid_wav())
    struct.pack_into("<H", blob, 12 + 8, 0xFFFE)  # tag field
    nv, _ = _check_both(bytes(blob))
    assert nv[0] == "err"


def test_random_mutation_fuzz():
    """Seeded random corruption: no hang, no crash, parity when both pass."""
    rng = np.random.default_rng(1234)
    corpus = [
        _valid_wav(),
        _valid_wav(channels=1, dtype=np.float32),
        _valid_wav(channels=3, dtype=np.float64),
    ]
    for _ in range(300):
        base = bytearray(corpus[rng.integers(len(corpus))])
        for _ in range(rng.integers(1, 4)):
            pos = rng.integers(len(base))
            base[pos] = rng.integers(256)
        _check_both(bytes(base))


def test_float64_write_roundtrip():
    """float64 arrays round-trip bit-exactly through IEEE float64 WAV."""
    rng = np.random.default_rng(7)
    x = rng.standard_normal((500, 2))
    buf = io.BytesIO()
    write_wav(buf, 48000, x)
    y, fs = read_wav(buf.getvalue())
    assert fs == 48000
    np.testing.assert_array_equal(y, x)


def test_aiff_roundtrip_and_load():
    """AIFF PCM16 write -> read parity, and load_signal sniffs the container."""
    from dsp_audio_project_tpu.io.aiffio import read_aiff, write_aiff

    rng = np.random.default_rng(9)
    x = (rng.standard_normal((400, 2)) * 20000).astype(np.int16)
    buf = io.BytesIO()
    write_aiff(buf, 22050, x)
    blob = buf.getvalue()
    y, fs = read_aiff(blob)
    assert fs == 22050 and y.shape == (400, 2)
    np.testing.assert_array_equal((y * 32768).astype(np.int16), x)

    # load_signal: mono mean + normalize, same conditioning as WAV.
    sig, fs2 = load_signal(blob)
    assert fs2 == 22050 and sig.ndim == 1 and len(sig) == 400
    want = y.mean(axis=1).astype(np.float32)
    peak = np.max(np.abs(want))
    np.testing.assert_allclose(sig, want / peak, rtol=0, atol=0)


def test_aiff_ext80_rates():
    """The 80-bit extended sample-rate field is exact for every common rate."""
    from dsp_audio_project_tpu.io.aiffio import _ext80_decode, _ext80_encode

    for fs in (8000, 11025, 16000, 22050, 44100, 48000, 96000, 192000):
        assert _ext80_decode(_ext80_encode(float(fs))) == float(fs)


def test_aiff_fuzz():
    from dsp_audio_project_tpu.io.aiffio import read_aiff, write_aiff

    x = (np.sin(np.arange(300) * 0.1) * 20000).astype(np.int16)
    buf = io.BytesIO()
    write_aiff(buf, 44100, x)
    blob = buf.getvalue()
    rng = np.random.default_rng(77)
    for cut in range(0, len(blob), 11):
        try:
            read_aiff(blob[:cut])
        except _OK_ERRORS:
            pass
    for _ in range(150):
        b = bytearray(blob)
        for _ in range(rng.integers(1, 4)):
            b[rng.integers(len(b))] = rng.integers(256)
        try:
            read_aiff(bytes(b))
        except _OK_ERRORS:
            pass


def test_load_signal_fallback_still_holds():
    """Hostile bytes through the full loader -> the reference's silence."""
    sig, fs = load_signal(b"RIFF\x10\x00\x00\x00WAVEjunkjunk")
    assert fs == 44100 and sig.shape == (100,) and not sig.any()
    sig, fs = load_signal(b"FORMgarbage")
    assert fs == 44100 and sig.shape == (100,)
