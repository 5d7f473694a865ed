"""Pallas TPU kernel: polyphase FIR resampling as tiled MXU matmuls.

The jnp path (ops/src.py) materializes the (K, W) frame matrix in HBM via a
gather before its matmul — ~2.3x the minimal HBM traffic and a gather op the
TPU dislikes.  This kernel exploits the frame geometry instead:

With frame stride s, a width-W frame is a run of ceil(W/s) consecutive
s-sample groups of the padded input.  So the input is laid out once as
groups x2[g, :] = x[g*s : (g+1)*s], tiled per grid step, and each program
computes

    acc[t, p] = sum_j  x2_tile[j + t, :] . G_j[:, p]       j = 0..J-1

i.e. J shifted (TK, s) @ (s, P) MXU matmuls over the SAME VMEM-resident
tile — frames are never materialized anywhere.  HBM traffic is one read of
the input (+J/TK duplication, <1%) and one write of the output: bandwidth-
bound speed of light for this op.

Numerics: float32 operands with HIGHEST-precision dots — bit-comparable to
the jnp path (same G, same summation structure), gated vs the golden oracle
in tests/test_kernels.py.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...ops.src import PolyphasePlan

DEFAULT_FRAME_TILE = 512


def _fir_kernel(x_ref, g_ref, o_ref, *, J: int, TK: int, s: int, P: int):
    acc = jnp.zeros((TK, P), dtype=jnp.float32)
    for j in range(J):
        chunk = x_ref[0, 0, j : j + TK, :]          # (TK, s)
        g_j = g_ref[j * s : (j + 1) * s, :]         # (s, P)
        acc = acc + jnp.dot(
            chunk,
            g_j,
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
    o_ref[0, 0, :, :] = acc


@functools.lru_cache(maxsize=None)
def _padded_g(plan: PolyphasePlan) -> np.ndarray:
    """(J*s, P) float32 operator, zero-padded from the plan's (W, P)."""
    J = -(-plan.W // plan.s)
    g = np.zeros((J * plan.s, plan.P), dtype=np.float32)
    g[: plan.W] = plan.G.astype(np.float32)
    return g


def polyphase_fir(
    x: jnp.ndarray,
    plan: PolyphasePlan,
    n_out: int,
    *,
    frame_tile: int = DEFAULT_FRAME_TILE,
    interpret: bool = False,
) -> jnp.ndarray:
    """Resample (..., N) -> (..., n_out) through the Pallas frame kernel.

    Semantics identical to ops/src._resample_frames (the jnp fallback).
    """
    s, P, W = plan.s, plan.P, plan.W
    J = -(-W // s)
    TK = frame_tile
    n = x.shape[-1]
    lead = x.shape[:-1]
    x2d = x.reshape((-1, n)).astype(jnp.float32)
    B = x2d.shape[0]

    num_frames = -(-n_out // P)
    k_tiles = -(-num_frames // TK)
    groups_total = k_tiles * TK + J

    # Padded input covering every group, aligned so group g starts at
    # x[g*s + lo] (matching the jnp path's pad_left/pad_right).
    pad_left = max(0, -plan.lo)
    total_len = groups_total * s
    pad_right = total_len - pad_left - n
    assert pad_right >= 0, "frame tiling must cover the whole input"
    xp = jnp.pad(x2d, ((0, 0), (pad_left, pad_right)))
    x2 = xp.reshape(B, groups_total, s)

    main = x2[:, : k_tiles * TK, :].reshape(B, k_tiles, TK, s)
    extra_rows = (
        np.arange(k_tiles, dtype=np.int32)[:, None] * TK
        + TK
        + np.arange(J, dtype=np.int32)[None, :]
    )
    extras = jnp.take(x2, jnp.asarray(extra_rows), axis=1)  # (B, k_tiles, J, s)
    tiles = jnp.concatenate([main, extras], axis=2)  # (B, k_tiles, TK+J, s)

    g_mat = jnp.asarray(_padded_g(plan))

    kernel = functools.partial(_fir_kernel, J=J, TK=TK, s=s, P=P)
    out = pl.pallas_call(
        kernel,
        grid=(B, k_tiles),
        in_specs=[
            pl.BlockSpec(
                (1, 1, TK + J, s),
                lambda b, k: (b, k, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (J * s, P), lambda b, k: (0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, TK, P), lambda b, k: (b, k, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((B, k_tiles, TK, P), jnp.float32),
        interpret=interpret,
    )(tiles, g_mat)

    y = out.reshape(B, k_tiles * TK * P)[:, :n_out]
    return y.reshape(lead + (n_out,))
