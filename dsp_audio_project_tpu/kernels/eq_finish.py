"""Pallas EQ finish: y0 + state readout + clip in one pass (round 5).

The XLA finish fusion (fusion.1) measured 42.3 us/signal against a ~29 us
HBM floor (read y0 11.8 MB + write z 11.8 MB): its correction matmul
s_true @ group_out contracts over d ~ 10, which XLA pads to a 128-wide
MXU contraction, and the fused clip keeps the whole thing one
memory-bound pass with MXU bubbles.  The VPU broadcast-multiply-reduce
rewrite measured WORSE (226 us — STATUS round-5 dead ends).  This kernel
owns the pass instead:

  * ``s_true`` arrives PACKED-TRANSPOSED at the exact state width:
    st[b, k, dd*128 + g] is state component dd of frame 128k + g (ops/eq
    builds it with packed weight tables — the group shift and the sigma
    correction fold into the tables, so XLA emits the packed layout
    directly from lane-aligned matmuls, no relayout);
  * in-kernel, a block's states reshape (KT, d, 128) -> batched
    transpose -> (KT*128, d) — both Mosaic-lowerable (128-lane chunks
    only) — and ONE (FT, d) @ (d, U) matmul serves the whole block;
  * y0 read + clip + z write happen in the same VMEM pass.

Consumed by ops/eq.equalize_frames_cat(finish='pallas').
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

FT = 1024          # frames per grid step


def _finish_kernel(y0_ref, st_ref, gout_ref, o_ref, *, KT, U, d):
    # (KT, d*128) -> (KT, d, 128) -> (KT, 128, d) -> (FT, d): the reshape
    # splits lanes in 128-chunks and the swap is a batched 2-D transpose —
    # both Mosaic-lowerable — then ONE (FT, d) @ (d, U) matmul serves the
    # whole block.
    st3 = st_ref[0].reshape(KT, d, 128)
    stT = jnp.swapaxes(st3, -1, -2).reshape(KT * 128, d)
    corr = jnp.dot(
        stT, gout_ref[...], preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )                                                     # (FT, U)
    o_ref[0] = jnp.clip(y0_ref[0] + corr, -1.0, 1.0)


def eq_finish_pallas(
    y0_frames: jnp.ndarray,
    st_packed: jnp.ndarray,
    group_out: np.ndarray,
    *,
    interpret: bool = False,
) -> jnp.ndarray:
    """z = clip(y0 + unpack(st) @ group_out) over (..., F, U) frames.

    ``st_packed`` (..., F // 128, 128 * d) in the transposed packing
    (see module docstring); ``group_out`` (d, U) float.
    """
    U = y0_frames.shape[-1]
    F = y0_frames.shape[-2]
    d = group_out.shape[0]
    if F % FT:
        raise ValueError(f"frame count {F} not a multiple of {FT}")
    if st_packed.shape[-2:] != (F // 128, 128 * d):
        raise ValueError(
            f"packed state shape {st_packed.shape[-2:]} != "
            f"{(F // 128, 128 * d)}"
        )
    gout = np.ascontiguousarray(group_out, np.float32)
    lead = y0_frames.shape[:-2]
    B = int(np.prod(lead)) if lead else 1
    y0 = y0_frames.reshape(B, F, U)
    st = st_packed.reshape(B, F // 128, 128 * d)
    KT = FT // 128
    kern = functools.partial(_finish_kernel, KT=KT, U=U, d=d)
    z = pl.pallas_call(
        kern,
        grid=(B, F // FT),
        in_specs=[
            pl.BlockSpec((1, FT, U), lambda b, t: (b, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, KT, 128 * d), lambda b, t: (b, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((d, U), lambda b, t: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, FT, U), lambda b, t: (b, t, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, F, U), jnp.float32),
        interpret=interpret,
    )(y0, st, jnp.asarray(gout))
    return z.reshape(lead + (F, U))
