"""I/O layer: WAV codec round-trips and conditioning semantics."""
import io

import numpy as np

from dsp_audio_project_tpu.io.signal_io import export_wav, load_signal
from dsp_audio_project_tpu.io.wavio import read_wav, write_wav


def test_pcm16_roundtrip(rng):
    x = (rng.standard_normal((1000, 2)) * 12000).astype(np.int16)
    buf = io.BytesIO()
    write_wav(buf, 44100, x)
    y, fs = read_wav(buf.getvalue())
    assert fs == 44100 and y.shape == (1000, 2)
    np.testing.assert_allclose(y, x.astype(np.float64) / 32768.0)


def test_float32_roundtrip(rng):
    x = rng.standard_normal(777).astype(np.float32) * 0.5
    buf = io.BytesIO()
    write_wav(buf, 48000, x)
    y, fs = read_wav(buf.getvalue())
    assert fs == 48000
    np.testing.assert_allclose(y, x.astype(np.float64), atol=1e-7)


def test_pcm24_decode():
    # Hand-build a tiny 24-bit PCM file.
    import struct

    vals = [0, 1, -1, (1 << 23) - 1, -(1 << 23)]
    payload = b""
    for v in vals:
        payload += struct.pack("<I", v & 0xFFFFFFFF)[:3]
    fmt = struct.pack("<HHIIHH", 1, 1, 8000, 8000 * 3, 3, 24)
    data = (
        b"RIFF" + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(payload)) + b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(payload)) + payload
    )
    y, fs = read_wav(data)
    np.testing.assert_allclose(y, np.array(vals) / float(1 << 23))


def test_load_signal_mono_mean_before_normalize(tmp_path, rng):
    stereo = np.stack(
        [0.5 * np.sin(np.linspace(0, 20, 2000)), -0.2 * np.cos(np.linspace(0, 20, 2000))],
        axis=1,
    ).astype(np.float32)
    p = str(tmp_path / "s.wav")
    write_wav(p, 16000, stereo)
    x, fs = load_signal(p)
    want = stereo.astype(np.float64).mean(axis=1)
    want = (want / np.max(np.abs(want))).astype(np.float32)
    np.testing.assert_allclose(x, want, atol=2e-6)


def test_load_signal_multichannel_layout(tmp_path, rng):
    multi = rng.standard_normal((300, 4)).astype(np.float32) * 0.3
    p = str(tmp_path / "m.wav")
    write_wav(p, 8000, multi)
    x, fs = load_signal(p, mono=False)
    assert x.shape == (4, 300)  # channel-major for mesh sharding


def test_load_silence_guard(tmp_path):
    quiet = np.full(100, 1e-8, dtype=np.float32)
    p = str(tmp_path / "q.wav")
    write_wav(p, 8000, quiet)
    x, _ = load_signal(p)
    # peak <= 1e-6: no normalization applied
    assert np.max(np.abs(x)) < 1e-6


def test_export_wav_semantics(rng):
    z = rng.standard_normal(500) * 3.0
    z[10] = np.nan
    data = export_wav(z, 22050)
    y, fs = read_wav(data)
    assert fs == 22050
    assert np.max(np.abs(y)) <= 1.0
    # NaN scrubbed to 0
    assert y[10] == 0.0


def test_unknown_chunks_skipped(rng):
    x = (rng.standard_normal(64) * 1000).astype(np.int16)
    buf = io.BytesIO()
    write_wav(buf, 8000, x)
    raw = bytearray(buf.getvalue())
    # splice a LIST chunk between fmt and data
    import struct

    fmt_end = 12 + 8 + 16
    junk = b"LIST" + struct.pack("<I", 6) + b"junk12"
    patched = bytes(raw[:fmt_end]) + junk + bytes(raw[fmt_end:])
    y, fs = read_wav(patched)
    assert fs == 8000 and len(y) == 64
