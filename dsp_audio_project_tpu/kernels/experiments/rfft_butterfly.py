"""EXPERIMENT: Pallas radix-2 butterfly rFFT (superseded; kept with numbers).

Keeps a tile of rows VMEM-resident for all log2(N/2) butterfly stages — the
first kernel formulation.  Status: CORRECT in interpret mode and on CPU, but
real-TPU Mosaic rejects its per-stage reshapes (unsupported shape casts), so
it never lowered on hardware; the production path is the four-step family
in kernels/rfft.py (DFT-as-matmul: classic to N=8192, tall for 16384/32768,
measured 1.3-2.3x over the XLA butterfly).  Retained as the reference
implementation of the packed-real untwiddle algebra and for CPU research.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...ops.fft import _bit_reversal

DEFAULT_ROW_TILE = 128


@functools.lru_cache(maxsize=None)
def _packed_twiddles(nh: int) -> np.ndarray:
    """(2, nh) stage twiddles: w[s][k] = e^{-j pi k / half} at offset half."""
    out = np.zeros((2, max(nh, 2)), dtype=np.float32)
    half = 1
    while half < nh:
        k = np.arange(half)
        w = np.exp(-1j * np.pi * k / half)
        out[0, half : 2 * half] = w.real
        out[1, half : 2 * half] = w.imag
        half *= 2
    return out


@functools.lru_cache(maxsize=None)
def _untwiddle(n: int) -> np.ndarray:
    """(2, n//2+1): e^{-2j pi k / n} for the packed-real reconstruction."""
    k = np.arange(n // 2 + 1)
    w = np.exp(-2j * np.pi * k / n)
    return np.stack([w.real, w.imag]).astype(np.float32)


def _fft_stages_kernel(zr_ref, zi_ref, tw_ref, or_ref, oi_ref, *, nh: int):
    """All log2(nh) butterfly stages on a VMEM-resident row tile."""
    yr = zr_ref[0, :, :]
    yi = zi_ref[0, :, :]
    rows = yr.shape[0]

    half = 1
    while half < nh:
        nb = nh // (2 * half)
        # 3-D view (rows, nb, 2*half): the butterfly partners are the two
        # halves of each group.  (A 4-D split with a unit/tiny trailing dim
        # is an unsupported Mosaic shape cast.)
        yr3 = yr.reshape(rows, nb, 2 * half)
        yi3 = yi.reshape(rows, nb, 2 * half)
        ar, ai = yr3[:, :, :half], yi3[:, :, :half]
        br, bi = yr3[:, :, half:], yi3[:, :, half:]
        wr = tw_ref[0, half : 2 * half][None, None, :]
        wi = tw_ref[1, half : 2 * half][None, None, :]
        tr = br * wr - bi * wi
        ti = br * wi + bi * wr
        yr = jnp.concatenate([ar + tr, ar - tr], axis=-1).reshape(rows, nh)
        yi = jnp.concatenate([ai + ti, ai - ti], axis=-1).reshape(rows, nh)
        half *= 2

    or_ref[0, :, :] = yr
    oi_ref[0, :, :] = yi


def rfft_pallas(
    x: jnp.ndarray,
    *,
    row_tile: int = DEFAULT_ROW_TILE,
    interpret: bool = False,
) -> jnp.ndarray:
    """Batched rfft of real (..., N) -> complex64 (..., N//2+1).

    Matches ops/fft.rfft (the jnp fallback) to float32 rounding.
    """
    n = x.shape[-1]
    if n < 4 or (n & (n - 1)) != 0:
        raise ValueError(f"rfft_pallas needs power-of-two N >= 4, got {n}")
    nh = n // 2
    lead = x.shape[:-1]
    x2 = x.reshape((-1, n)).astype(jnp.float32)
    rows = x2.shape[0]

    perm = jnp.asarray(_bit_reversal(nh))
    zr = x2[:, 0::2][:, perm]
    zi = x2[:, 1::2][:, perm]

    RT = min(row_tile, rows)
    r_tiles = -(-rows // RT)
    if r_tiles * RT != rows:
        pad = r_tiles * RT - rows
        zr = jnp.pad(zr, ((0, pad), (0, 0)))
        zi = jnp.pad(zi, ((0, pad), (0, 0)))
    zr = zr.reshape(r_tiles, RT, nh)
    zi = zi.reshape(r_tiles, RT, nh)

    tw = jnp.asarray(_packed_twiddles(nh))

    kernel = functools.partial(_fft_stages_kernel, nh=nh)
    yr, yi = pl.pallas_call(
        kernel,
        grid=(r_tiles,),
        in_specs=[
            pl.BlockSpec((1, RT, nh), lambda r: (r, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, RT, nh), lambda r: (r, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(tw.shape, lambda r: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, RT, nh), lambda r: (r, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, RT, nh), lambda r: (r, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((r_tiles, RT, nh), jnp.float32),
            jax.ShapeDtypeStruct((r_tiles, RT, nh), jnp.float32),
        ),
        interpret=interpret,
    )(zr, zi, tw)

    yr = yr.reshape(r_tiles * RT, nh)[:rows]
    yi = yi.reshape(r_tiles * RT, nh)[:rows]

    # Packed-real untwiddle on the host side of the kernel boundary — the
    # lane-axis reversal (lax.rev) isn't lowerable inside Mosaic, and this is
    # one cheap fused elementwise pass over (rows, nh+1).
    zk = jnp.concatenate([yr, yr[:, :1]], axis=-1) + 1j * jnp.concatenate(
        [yi, yi[:, :1]], axis=-1
    )
    zrev = jnp.conj(zk[:, ::-1])
    even = 0.5 * (zk + zrev)
    odd = -0.5j * (zk - zrev)
    un = _untwiddle(n)
    w = jnp.asarray(un[0] + 1j * un[1], dtype=jnp.complex64)
    out = even + w * odd
    return out.reshape(lead + (nh + 1,))
