"""Native C++ codec engine vs the numpy oracle codec."""
import io
import struct

import numpy as np
import pytest

from dsp_audio_project_tpu.io import native
from dsp_audio_project_tpu.io.signal_io import load_signal
from dsp_audio_project_tpu.io.wavio import write_wav

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native codec library not built"
)


def _wav_bytes(samples, fs=44100):
    buf = io.BytesIO()
    write_wav(buf, fs, samples)
    return buf.getvalue()


@pytest.mark.parametrize("channels", [1, 2, 4])
def test_native_decode_matches_numpy_pcm16(rng, channels):
    x = (rng.standard_normal((1000, channels)) * 12000).astype(np.int16)
    data = _wav_bytes(x, 22050)
    got, fs = native.decode(data, mono=True)
    assert fs == 22050
    ref = x.astype(np.float64) / 32768.0
    want = ref.mean(axis=1).astype(np.float32)
    peak = np.max(np.abs(want))
    if peak > 1e-6:
        want = want / peak
    np.testing.assert_array_equal(got, want)


def test_native_decode_float32(rng):
    x = (rng.standard_normal(500) * 0.3).astype(np.float32)
    data = _wav_bytes(x, 48000)
    got, fs = native.decode(data, mono=True)
    want = x.astype(np.float64).astype(np.float32)
    peak = np.max(np.abs(want))
    want = (want / peak).astype(np.float32) if peak > 1e-6 else want
    np.testing.assert_array_equal(got, want)


def test_native_decode_pcm24():
    vals = [0, 1, -1, (1 << 23) - 1, -(1 << 23)]
    payload = b"".join(struct.pack("<I", v & 0xFFFFFFFF)[:3] for v in vals)
    fmt = struct.pack("<HHIIHH", 1, 1, 8000, 8000 * 3, 3, 24)
    data = (
        b"RIFF" + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(payload)) + b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(payload)) + payload
    )
    got, fs = native.decode(data, mono=True, normalize=False)
    want = np.array(vals) / float(1 << 23)
    np.testing.assert_allclose(got, want.astype(np.float32), atol=1e-7)


def test_native_multichannel_layout(rng):
    x = (rng.standard_normal((300, 3)) * 0.4).astype(np.float32)
    data = _wav_bytes(x, 8000)
    got, _ = native.decode(data, mono=False)
    assert got.shape == (3, 300)
    # parity vs the numpy multichannel path
    want, _ = load_signal(data, mono=False, engine="numpy")
    np.testing.assert_allclose(got, want, atol=2e-7)


def test_load_signal_auto_uses_native(rng, tmp_path):
    x = (rng.standard_normal(2000) * 9000).astype(np.int16)
    p = str(tmp_path / "n.wav")
    write_wav(p, 16000, x)
    a, fs_a = load_signal(p, engine="auto")
    b, fs_b = load_signal(p, engine="numpy")
    assert fs_a == fs_b
    np.testing.assert_array_equal(a, b)


def test_native_encode_pcm16(rng):
    z = rng.standard_normal((2, 400)).astype(np.float32) * 3.0
    z[0, 10] = np.nan
    out = native.encode_pcm16(z)
    assert out.shape == (400, 2) and out.dtype == np.int16
    assert np.abs(out).max() == 32767
    assert out[10, 0] == 0  # NaN scrubbed


def test_native_rejects_garbage():
    with pytest.raises(ValueError):
        native.decode(b"RIFFxxxxWAVEjunkjunkjunk")
