"""Batched radix-2 FFT as XLA-friendly vectorized butterflies.

The reference computes spectra with a *recursive Python* radix-2 DIT FFT
(dsp_core.py:41-66) — O(N log N) flops buried under ~2N interpreter frames.
Here the same algorithm is expressed the TPU way: a host-precomputed
bit-reversal permutation (one gather) followed by log2(N) fully vectorized
butterfly stages, batched over arbitrary leading dims.  Twiddles are baked as
compile-time constants.  Real input uses the packed-real trick (N-real ->
N/2-complex FFT + untwiddle) so the conjugate-symmetric half is never
computed.

Sizes must be powers of two, matching the reference's constraint (its FFT
raises on non-pow2 input; callers here zero-pad, as the reference's spectrum
path does at dsp_core.py:81-82).
"""
from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np


def _check_pow2(n: int) -> int:
    if n <= 0 or (n & (n - 1)) != 0:
        raise ValueError(f"FFT size must be a power of two, got {n}")
    return int(np.log2(n))


@functools.lru_cache(maxsize=None)
def _bit_reversal(n: int) -> np.ndarray:
    bits = _check_pow2(n)
    idx = np.arange(n, dtype=np.int64)
    rev = np.zeros_like(idx)
    for _ in range(bits):
        rev = (rev << 1) | (idx & 1)
        idx >>= 1
    return rev.astype(np.int32)


@functools.lru_cache(maxsize=None)
def _stage_twiddles(half: int) -> np.ndarray:
    # e^{-j pi k / half}, k < half: stage with butterfly span `half`.
    k = np.arange(half)
    return np.exp(-1j * np.pi * k / half).astype(np.complex64)


def fft(x: jnp.ndarray) -> jnp.ndarray:
    """Complex FFT over the last axis (power-of-two length), batched."""
    n = x.shape[-1]
    _check_pow2(n)
    y = x.astype(jnp.complex64)[..., _bit_reversal(n)]
    half = 1
    while half < n:
        y = y.reshape(y.shape[:-1] + (n // (2 * half), 2, half))
        a = y[..., 0, :]
        t = y[..., 1, :] * jnp.asarray(_stage_twiddles(half))
        y = jnp.concatenate([a + t, a - t], axis=-1)
        y = y.reshape(y.shape[:-2] + (n,))
        half *= 2
    return y


def ifft(x: jnp.ndarray) -> jnp.ndarray:
    """Inverse complex FFT over the last axis (power-of-two length)."""
    n = x.shape[-1]
    return jnp.conj(fft(jnp.conj(x.astype(jnp.complex64)))) / n


@functools.lru_cache(maxsize=None)
def _rfft_untwiddle(n: int) -> np.ndarray:
    # e^{-2j pi k / n} for k = 0..n/2 (bin count of the real spectrum).
    k = np.arange(n // 2 + 1)
    return np.exp(-2j * np.pi * k / n).astype(np.complex64)


def rfft(x: jnp.ndarray) -> jnp.ndarray:
    """Real-input FFT over the last axis; returns the first N//2+1 bins.

    Packs even/odd real samples into one complex sequence of length N/2,
    runs a half-size complex FFT, and untwiddles — half the flops and
    bandwidth of a full complex FFT, exploiting conjugate symmetry
    (the symmetry the reference notes at dsp_core.py:96-98).
    """
    n = x.shape[-1]
    _check_pow2(n)
    if n == 1:
        return x.astype(jnp.complex64)
    xr = x.astype(jnp.float32)
    z = jnp.asarray(xr[..., 0::2] + 1j * xr[..., 1::2], dtype=jnp.complex64)
    zf = fft(z)  # (..., n/2)
    # Z[k] for k = 0..n/2 with wraparound (Z[n/2] == Z[0]).
    zk = jnp.concatenate([zf, zf[..., :1]], axis=-1)
    zrev = jnp.conj(zk[..., ::-1])  # conj(Z[n/2 - k])
    even = 0.5 * (zk + zrev)
    odd = -0.5j * (zk - zrev)
    return even + jnp.asarray(_rfft_untwiddle(n)) * odd


def rfft_magnitude(x: jnp.ndarray) -> jnp.ndarray:
    """|rfft(x)| — the spectrum op's workhorse."""
    return jnp.abs(rfft(x))
