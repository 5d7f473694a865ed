"""Pallas TPU kernels: block-parallel IIR (biquad-cascade) recurrence.

The jnp path (ops/eq.py) runs the zero-init block recurrence as a lax.scan
producing provisional outputs y0, then fixes them up with a correction
matmul — HBM sees x once, y0 twice (write+read), two transposes, and the
corrected y.  These kernels restructure the same math into two passes that
each touch HBM exactly once:

  Phase A  (``block_end_states``): per-block end states from zero init —
           reads x, writes only the tiny (K, d) state matrix.
  Phase B  (caller, ops/eq-style): log-depth associative scan over the
           (K, d) states -> true per-block initial states sigma.  Tiny.
  Phase C  (``block_apply``): re-runs the recurrence with the TRUE initial
           state per block, writing final outputs directly — no correction
           matmul, no y0 round-trip.

Within a kernel the recurrence is vectorized across the K-block lane axis
(the VPU's natural shape): state (KT, d), one small HIGHEST-precision matmul
per sample step.  Layout note: tiles arrive as (KT, B) rows-of-blocks and
are transposed once in VMEM so each step reads a contiguous (KT,) row.

Numerically identical to the jnp path (same quantized operators from
``design.biquad.block_operators``); gated in tests/test_kernels.py.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...design.biquad import BlockOperators

# Blocks-per-tile: the K axis is the vector-parallel axis, so the tile should
# cover as much of it as VMEM allows — tiling K serializes work the VPU could
# do in one step (measured 2x+ slower with small tiles).  With B=256 samples
# per block, 2048 blocks keeps x-tile (x2 double-buffered) + transposed
# scratch + output (x2) within ~11 MB of VMEM.
DEFAULT_BLOCK_TILE = 2048

_HI = jax.lax.Precision.HIGHEST


def _end_state_kernel(x_ref, a_ref, b_ref, e_ref, xT_scr, *, B: int, d: int, KT: int):
    # Stage the transposed tile once so each step reads a contiguous row
    # via ref indexing (dynamic_slice on values isn't lowered by Mosaic).
    xT_scr[:, :] = x_ref[0, :, :].T  # (B, KT)
    a_t = a_ref[:, :]                # (d, d), pre-transposed A
    b_v = b_ref[0, :]                # (d,)

    def step(j, s):
        xj = xT_scr[pl.ds(j, 1), :]  # (1, KT)
        return (
            jnp.dot(s, a_t, preferred_element_type=jnp.float32, precision=_HI)
            + xj.T * b_v[None, :]
        )

    s0 = jnp.zeros((KT, d), dtype=jnp.float32)
    e_ref[0, :, :] = jax.lax.fori_loop(0, B, step, s0)


def _apply_kernel(
    x_ref, sig_ref, a_ref, b_ref, c_ref, o_ref, xT_scr, *,
    B: int, d: int, KT: int, D: float,
):
    xT_scr[:, :] = x_ref[0, :, :].T  # (B, KT)
    a_t = a_ref[:, :]                # (d, d), pre-transposed A
    b_v = b_ref[0, :]                # (d,)
    c_m = c_ref[:, :]                # (d, 1)

    def step(j, s):
        xj = xT_scr[pl.ds(j, 1), :]  # (1, KT)
        y = (
            jnp.dot(s, c_m, preferred_element_type=jnp.float32,
                    precision=_HI).T
            + jnp.float32(D) * xj
        )  # (1, KT)
        # Row j of x was just consumed; reuse its slot for y (saves a buffer).
        xT_scr[pl.ds(j, 1), :] = y
        return (
            jnp.dot(s, a_t, preferred_element_type=jnp.float32, precision=_HI)
            + xj.T * b_v[None, :]
        )

    s0 = sig_ref[0, :, :]            # (KT, d) true initial states
    jax.lax.fori_loop(0, B, step, s0)
    o_ref[0, :, :] = xT_scr[:, :].T  # back to (KT, B)


def _operator_consts(ops: BlockOperators):
    d = ops.A.shape[0]
    a_t = jnp.asarray(ops.A.T, dtype=jnp.float32)          # used as s @ A^T
    b_v = jnp.asarray(ops.B[None, :], dtype=jnp.float32)    # (1, d)
    c_m = jnp.asarray(ops.C[:, None], dtype=jnp.float32)    # (d, 1)
    return d, a_t, b_v, c_m


def block_end_states(
    xb: jnp.ndarray,
    ops: BlockOperators,
    *,
    block_tile: int = DEFAULT_BLOCK_TILE,
    interpret: bool = False,
) -> jnp.ndarray:
    """Zero-init end state per block.  xb: (batch, K, B) -> (batch, K, d)."""
    Bt, K, B = xb.shape
    d, a_t, b_v, _ = _operator_consts(ops)
    KT = min(block_tile, K)
    k_tiles = -(-K // KT)
    if k_tiles * KT != K:
        pad = k_tiles * KT - K
        xb = jnp.pad(xb, ((0, 0), (0, pad), (0, 0)))
    kernel = functools.partial(_end_state_kernel, B=B, d=d, KT=KT)
    e = pl.pallas_call(
        kernel,
        grid=(Bt, k_tiles),
        in_specs=[
            pl.BlockSpec((1, KT, B), lambda b, k: (b, k, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((d, d), lambda b, k: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda b, k: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, KT, d), lambda b, k: (b, k, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Bt, k_tiles * KT, d), jnp.float32),
        scratch_shapes=[pltpu.VMEM((B, KT), jnp.float32)],
        interpret=interpret,
    )(xb, a_t, b_v)
    return e[:, :K, :]


def block_apply(
    xb: jnp.ndarray,
    sigma: jnp.ndarray,
    ops: BlockOperators,
    *,
    block_tile: int = DEFAULT_BLOCK_TILE,
    interpret: bool = False,
) -> jnp.ndarray:
    """Run the recurrence per block from TRUE initial states.

    xb: (batch, K, B), sigma: (batch, K, d) -> y: (batch, K, B).
    """
    Bt, K, B = xb.shape
    d, a_t, b_v, c_m = _operator_consts(ops)
    KT = min(block_tile, K)
    k_tiles = -(-K // KT)
    if k_tiles * KT != K:
        pad = k_tiles * KT - K
        xb = jnp.pad(xb, ((0, 0), (0, pad), (0, 0)))
        sigma = jnp.pad(sigma, ((0, 0), (0, pad), (0, 0)))
    kernel = functools.partial(_apply_kernel, B=B, d=d, KT=KT, D=float(ops.D))
    y = pl.pallas_call(
        kernel,
        grid=(Bt, k_tiles),
        in_specs=[
            pl.BlockSpec((1, KT, B), lambda b, k: (b, k, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, KT, d), lambda b, k: (b, k, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((d, d), lambda b, k: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda b, k: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((d, 1), lambda b, k: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, KT, B), lambda b, k: (b, k, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Bt, k_tiles * KT, B), jnp.float32),
        scratch_shapes=[pltpu.VMEM((B, KT), jnp.float32)],
        interpret=interpret,
    )(xb, sigma, a_t, b_v, c_m)
    return y[:, :K, :]
