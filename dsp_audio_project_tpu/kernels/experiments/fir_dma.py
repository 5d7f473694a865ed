"""Pallas TPU kernel: polyphase FIR with manual double-buffered DMA.

The XLA path (ops/src.py) and the BlockSpec kernel (kernels/fir.py) both pay
an extra HBM pass staging shifted/overlapping frame views before the matmul
— XLA cannot express "tile k covers rows [k*TK, k*TK + TK + J)" without a
copy, because consecutive tiles overlap by J rows.

This kernel owns the movement instead: the input is laid out once as
(B, groups, s_pad) — contiguous s-sample rows zero-padded to a 128-aligned
lane width (Mosaic requires DMA slice shapes aligned to the (8, 128) tile;
the pad columns multiply zero filter rows, so no in-kernel slicing) — and
each grid step DMAs its overlapping (TK + JP, s_pad) window straight into
VMEM before computing.  The copy is synchronous within the step: per-tile
DMA (~270 KB) is microseconds against the tile's matmuls, and cross-step
prefetch chains deadlock under the compiled grid pipeline (bisected), so
the simple form wins.  HBM traffic is one cheap pad pass + one read of the
padded input + one write of y, and the J shifted (TK, s_pad) x (s_pad, P)
matmuls run from VMEM.

Output ordering matches ops/src exactly: tile k emits frames
[k*TK, (k+1)*TK), each frame contributing P consecutive output samples.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...ops.src import PolyphasePlan

DEFAULT_FRAME_TILE = 1024


def _dma_kernel(x_hbm, g_ref, o_ref, xbuf, sem, *, J, JP, TK, sp, P, precision):
    b = pl.program_id(0)
    k = pl.program_id(1)
    cp = pltpu.make_async_copy(
        x_hbm.at[b, pl.ds(k * TK, TK + JP), :], xbuf, sem
    )
    cp.start()
    cp.wait()

    tile = xbuf[:, :]  # (TK + JP, sp) value; shifted views relayout on VPU
    acc = jnp.zeros((TK, P), dtype=jnp.float32)
    for j in range(J):
        acc = acc + jnp.dot(
            tile[j : j + TK, :],
            g_ref[j * sp : (j + 1) * sp, :],
            preferred_element_type=jnp.float32,
            precision=precision,
        )
    o_ref[0, 0] = acc


@functools.lru_cache(maxsize=None)
def _padded_g(plan: PolyphasePlan, sp: int) -> np.ndarray:
    """(J*sp, P): branch j's rows at [j*sp, j*sp+s); lane-pad rows are 0."""
    J = -(-plan.W // plan.s)
    g = np.zeros((J * sp, plan.P), dtype=np.float32)
    for j in range(J):
        rows = plan.G[j * plan.s : min((j + 1) * plan.s, plan.W)]
        g[j * sp : j * sp + rows.shape[0]] = rows
    return g


def polyphase_fir_dma(
    x: jnp.ndarray,
    plan: PolyphasePlan,
    n_out: int,
    *,
    frame_tile: int = DEFAULT_FRAME_TILE,
    precision=jax.lax.Precision.HIGHEST,
    interpret: bool = False,
) -> jnp.ndarray:
    """Resample (..., N) -> (..., n_out); semantics match ops/src exactly."""
    s, P, W = plan.s, plan.P, plan.W
    J = -(-W // s)
    TK = frame_tile
    n = x.shape[-1]
    lead = x.shape[:-1]
    x2d = x.reshape((-1, n)).astype(jnp.float32)
    B = x2d.shape[0]

    num_frames = -(-n_out // P)
    k_tiles = -(-num_frames // TK)
    JP = -(-J // 8) * 8       # sublane-aligned window extension
    sp = -(-s // 128) * 128   # lane-aligned group width
    groups_total = k_tiles * TK + JP
    pad_left = max(0, -plan.lo)
    pad_right = groups_total * s - pad_left - n
    assert pad_right >= 0
    xp = jnp.pad(x2d, ((0, 0), (pad_left, pad_right)))
    x3 = jnp.pad(
        xp.reshape(B, groups_total, s), ((0, 0), (0, 0), (0, sp - s))
    )

    g_mat = jnp.asarray(_padded_g(plan, sp))
    kernel = functools.partial(
        _dma_kernel, J=J, JP=JP, TK=TK, sp=sp, P=P, precision=precision
    )
    out = pl.pallas_call(
        kernel,
        grid=(B, k_tiles),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),   # x stays in HBM
            pl.BlockSpec((J * sp, P), lambda b, k: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, TK, P), lambda b, k: (b, k, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((B, k_tiles, TK, P), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((TK + JP, sp), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=interpret,
    )(x3, g_mat)

    y = out.reshape(B, k_tiles * TK * P)[:, :n_out]
    return y.reshape(lead + (n_out,))
