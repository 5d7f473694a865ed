"""ctypes bindings for the native (C++) audio codec engine.

Loads ``native/build/libwavcodec.so``, building it on first use when a
toolchain is present (``make -C native``).  All entry points degrade to the
pure-numpy codec (wavio.py) when the library is unavailable, and the numpy
codec remains the behavioral oracle — parity is enforced in
tests/test_native.py.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional, Tuple

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(__file__)), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "build", "libwavcodec.so")

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> bool:
    try:
        subprocess.run(
            ["make", "-C", _NATIVE_DIR],
            check=True,
            capture_output=True,
            timeout=120,
        )
        return os.path.exists(_LIB_PATH)
    except Exception:
        return False


def load_library() -> Optional[ctypes.CDLL]:
    """The codec library, building lazily; None when unavailable."""
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.exists(_LIB_PATH) and not _build():
            return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
        except OSError:
            return None
        lib.wav_probe.restype = ctypes.c_int
        lib.wav_probe.argtypes = [
            ctypes.c_char_p, ctypes.c_uint64,
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int32),
        ]
        lib.wav_decode_f32.restype = ctypes.c_int
        lib.wav_decode_f32.argtypes = [
            ctypes.c_char_p, ctypes.c_uint64, ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_float),
        ]
        lib.encode_pcm16.restype = None
        lib.encode_pcm16.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_int32,
            ctypes.POINTER(ctypes.c_int16),
        ]
        _lib = lib
        return _lib


def available() -> bool:
    return load_library() is not None


def decode(
    data: bytes, *, mono: bool = True, normalize: bool = True
) -> Optional[Tuple[np.ndarray, int]]:
    """Decode WAV bytes natively -> (float32 signal, fs); None if no lib.

    mono=True: (N,) channel-mean signal; else channel-major (C, N).
    """
    lib = load_library()
    if lib is None:
        return None
    channels = ctypes.c_int32()
    frames = ctypes.c_int64()
    fs = ctypes.c_int32()
    rc = lib.wav_probe(data, len(data), ctypes.byref(channels),
                       ctypes.byref(frames), ctypes.byref(fs))
    if rc != 0:
        raise ValueError(f"native WAV probe failed (code {rc})")
    c, n = channels.value, frames.value
    if mono:
        out = np.empty(n, dtype=np.float32)
    else:
        out = np.empty((c, n), dtype=np.float32)
    rc = lib.wav_decode_f32(
        data, len(data), 1 if mono else 0, 1 if normalize else 0,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
    )
    if rc != 0:
        raise ValueError(f"native WAV decode failed (code {rc})")
    return out, fs.value


def encode_pcm16(x: np.ndarray) -> Optional[np.ndarray]:
    """Output-stage conversion: channel-major float32 -> interleaved int16.

    Applies the reference's NaN-scrub + peak-normalize + 32767 truncation
    contract in native code.  None if no lib.
    """
    lib = load_library()
    if lib is None:
        return None
    x = np.ascontiguousarray(x, dtype=np.float32)
    if x.ndim == 1:
        x = x[None, :]
    c, n = x.shape
    out = np.empty((n, c), dtype=np.int16)
    lib.encode_pcm16(
        x.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        n, c, out.ctypes.data_as(ctypes.POINTER(ctypes.c_int16)),
    )
    return out
