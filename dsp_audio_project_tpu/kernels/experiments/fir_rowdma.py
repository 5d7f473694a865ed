"""Row-DMA rect FIR: manual DMA from the UNTRANSPOSED staging (round 5).

The production rect kernel stages the padded input through one XLA
pad+transpose pass ((B, J, s, 128) -> (B, s, J, 128), ~17.6 us/signal of
copy_bitcast on the 60 s serving config) so its group rectangle is ONE
contiguous-row DMA.  This variant deletes the transpose: the padded input
stays (B, J0, s, 128) (a free reshape of the flat signal) and each grid
step issues RG+wr per-row DMAs — row r of the rectangle is the strided
source x[b, 0:Kp, r, :] (Kp rows of 512 B, stride s*512 B).

Trade under test: one big contiguous DMA + a 17.6 us XLA pass vs ~14
strided 512 B-burst DMAs per step with no staging pass at all.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..fir_class import (
    CLASS_GROUP, NUM_CLASSES, _class_banks, _class_banks_split,
    _class_rect_geometry,
)
from ...ops.src import PolyphasePlan


def _kernel(r0_ref, rrel_ref, x_hbm, bank_ref, out_ref, xbuf, sems, *,
            nc, Kp, P, RG, wr, B, n_groups, precision):
    t = pl.program_id(0)
    b = pl.program_id(1)
    step = t * B + b
    slot = jax.lax.rem(step, 2)
    RW = RG + wr

    def dma_row(t_i, b_i, slot_i, rl):
        if rl < RG:
            return pltpu.make_async_copy(
                x_hbm.at[b_i, 0:Kp, r0_ref[t_i] + rl, :],
                xbuf.at[slot_i, rl], sems.at[slot_i, rl],
            )
        return pltpu.make_async_copy(
            x_hbm.at[b_i, 1 : Kp + 1, rl - RG, :],
            xbuf.at[slot_i, rl], sems.at[slot_i, rl],
        )

    def start_all(t_i, b_i, slot_i):
        for rl in range(RW):
            dma_row(t_i, b_i, slot_i, rl).start()

    @pl.when(step == 0)
    def _():
        start_all(t, b, slot)

    for rl in range(RW):
        dma_row(t, b, slot, rl).wait()

    @pl.when(step + 1 < n_groups * B)
    def _():
        last_b = b == B - 1
        start_all(jnp.where(last_b, t + 1, t),
                  jnp.where(last_b, 0, b + 1), 1 - slot)

    for j in range(CLASS_GROUP):
        rho = t * CLASS_GROUP + j
        acc = None
        for c in range(nc):
            sl = xbuf[slot, rrel_ref[c, rho]]
            if precision == "fast":
                fh = sl.astype(jnp.bfloat16)
                fl = (sl - fh.astype(jnp.float32)).astype(jnp.bfloat16)
                gh = bank_ref[0, j, 0, c * 128:(c + 1) * 128, :]
                gl = bank_ref[0, j, 1, c * 128:(c + 1) * 128, :]
                term = jnp.dot(fh, gh, preferred_element_type=jnp.float32)
                term += jnp.dot(fl, gh, preferred_element_type=jnp.float32)
                term += jnp.dot(fh, gl, preferred_element_type=jnp.float32)
            else:
                term = jnp.dot(
                    sl, bank_ref[0, j, c * 128:(c + 1) * 128, :],
                    preferred_element_type=jnp.float32, precision=precision,
                )
            acc = term if acc is None else acc + term
        out_ref[0, :, j, :] = acc


def polyphase_fir_rect_rowdma(
    x: jnp.ndarray,
    plan: PolyphasePlan,
    n_out: int,
    *,
    precision=jax.lax.Precision.HIGHEST,
    interpret: bool = False,
    pad_frames: bool = False,
    num_frames: int | None = None,
    pad_left: int | None = None,
) -> jnp.ndarray:
    """rect_frames without the staging transpose (see module docstring)."""
    s, P, W = plan.s, plan.P, plan.W
    if s < 8 or W > 128 * s:
        raise ValueError("class-kernel regime required")
    if x.ndim == 1:
        return polyphase_fir_rect_rowdma(
            x[None], plan, n_out, precision=precision, interpret=interpret,
            pad_frames=pad_frames, num_frames=num_frames, pad_left=pad_left,
        )[0]
    lead = x.shape[:-1]
    B = int(np.prod(lead))
    x = x.reshape(B, x.shape[-1])
    if pad_left is None:
        pad_left = max(0, -plan.lo)
    if pad_left < 0:
        x = x[..., -pad_left:]
        pad_left = 0
    w0 = 0
    n = x.shape[-1]
    if num_frames is None:
        num_frames = -(-n_out // P)
    Kp = 8 * -(-(-(-num_frames // NUM_CLASSES)) // 8)
    nc, r0c, rrel2, RG, wr = _class_rect_geometry(s, W, w0)
    J0 = Kp + 1
    total = 128 * s * J0
    pad_right = total - pad_left - n
    if pad_right < 0:
        x = x[..., : n + pad_right]
        pad_right = 0
    xp = jnp.pad(x.astype(jnp.float32), ((0, 0), (pad_left, pad_right)))
    x4 = xp.reshape(B, J0, s, 128)          # NO transpose

    CG = CLASS_GROUP
    n_groups = NUM_CLASSES // CG
    RW = RG + wr
    if precision == "fast":
        banks = jnp.asarray(_class_banks_split(plan, w0))
        banks = banks.reshape(n_groups, CG, 2, nc * 128, P)
        bank_spec = pl.BlockSpec(
            (1, CG, 2, nc * 128, P), lambda t, b, r_, rr_: (t, 0, 0, 0, 0),
            memory_space=pltpu.VMEM,
        )
    else:
        banks = jnp.asarray(_class_banks(plan, w0))
        banks = banks.reshape(n_groups, CG, nc * 128, P)
        bank_spec = pl.BlockSpec(
            (1, CG, nc * 128, P), lambda t, b, r_, rr_: (t, 0, 0, 0),
            memory_space=pltpu.VMEM,
        )
    kern = functools.partial(
        _kernel, nc=nc, Kp=Kp, P=P, RG=RG, wr=wr, B=B,
        n_groups=n_groups, precision=precision,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_groups, B),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY), bank_spec],
        out_specs=pl.BlockSpec(
            (1, Kp, CG, P), lambda t, b, r_, rr_: (b, 0, t, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((2, max(RW, 1), Kp, 128), jnp.float32),
            pltpu.SemaphoreType.DMA((2, max(RW, 1))),
        ],
    )
    params = {}
    if not interpret:
        params["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=28 * 1024 * 1024,
        )
    out4 = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((B, Kp, NUM_CLASSES, P), jnp.float32),
        grid_spec=grid_spec, interpret=interpret, **params,
    )(jnp.asarray(r0c), jnp.asarray(rrel2), x4, banks)
    frames = out4.reshape(B, Kp * NUM_CLASSES, P)
    if pad_frames:
        return frames.reshape(lead + (Kp * NUM_CLASSES, P))
    return frames[:, :num_frames].reshape(lead + (num_frames, P))
