"""Split-bank rect FIR variant (round-5 VERDICT item 2b) — measured equal.

Hypothesis under test: the production kernels' 160 -> 256 MXU output-lane
pad (62.5% column utilization, STATUS round 4) could be cheaper as a
P = 128 + 32 split bank pair, accumulating each class's result from a
full (128-wide) matmul plus a narrow (P-128)-wide one instead of one
256-padded matmul.

Expectation (and measurement — see __init__ table): NO WIN.  The MXU
processes output lanes in 128-wide passes, so 128 + 32->128pad is still
two passes, exactly like 160->256pad — the split only adds a second
result staging and a VMEM concat.  This module exists so the claim is a
measured number instead of an argument.

Drop-in twin of kernels/fir_class.polyphase_fir_class_rect_frames with
the per-class dot split column-wise; bitwise-comparable output (same
banks, same accumulation order per half).
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
            nc, Kp, P, RG, wr, B, n_groups, precision, split_at):
    t = pl.program_id(0)
    b = pl.program_id(1)
    step = t * B + b
    slot = jax.lax.rem(step, 2)

    def dma_main(t_i, b_i, slot_i):
        return pltpu.make_async_copy(
            x_hbm.at[b_i, pl.ds(r0_ref[t_i], RG), 0:Kp, :],
            xbuf.at[slot_i, 0:RG], sems.at[slot_i, 0],
        )

    def dma_wrap(b_i, slot_i):
        return pltpu.make_async_copy(
            x_hbm.at[b_i, 0:wr, 1 : Kp + 1, :],
            xbuf.at[slot_i, RG : RG + wr], sems.at[slot_i, 1],
        )

    def start_all(t_i, b_i, slot_i):
        dma_main(t_i, b_i, slot_i).start()
        if wr:
            dma_wrap(b_i, slot_i).start()

    @pl.when(step == 0)
    def _():
        start_all(t, b, slot)

    dma_main(t, b, slot).wait()
    if wr:
        dma_wrap(b, slot).wait()

    @pl.when(step + 1 < n_groups * B)
    def _():
        last_b = b == B - 1
        start_all(jnp.where(last_b, t + 1, t),
                  jnp.where(last_b, 0, b + 1), 1 - slot)

    for j in range(CLASS_GROUP):
        rho = t * CLASS_GROUP + j
        halves = []
        for lo, hi in ((0, split_at), (split_at, P)):
            acc = None
            for c in range(nc):
                sl = xbuf[slot, rrel_ref[c, rho]]
                if precision == "fast":
                    fh = sl.astype(jnp.bfloat16)
                    fl = (sl - fh.astype(jnp.float32)).astype(jnp.bfloat16)
                    gh = bank_ref[0, j, 0, c * 128:(c + 1) * 128, lo:hi]
                    gl = bank_ref[0, j, 1, c * 128:(c + 1) * 128, lo:hi]
                    term = jnp.dot(fh, gh, preferred_element_type=jnp.float32)
                    term += jnp.dot(fl, gh,
                                    preferred_element_type=jnp.float32)
                    term += jnp.dot(fh, gl,
                                    preferred_element_type=jnp.float32)
                else:
                    term = jnp.dot(
                        sl, bank_ref[0, j, c * 128:(c + 1) * 128, lo:hi],
                        preferred_element_type=jnp.float32,
                        precision=precision,
                    )
                acc = term if acc is None else acc + term
            halves.append(acc)
        out_ref[0, :, j, :split_at] = halves[0]
        out_ref[0, :, j, split_at:] = halves[1]


def polyphase_fir_rect_splitbank(
    x: jnp.ndarray,
    plan: PolyphasePlan,
    n_out: int,
    *,
    precision=jax.lax.Precision.HIGHEST,
    interpret: bool = False,
    pad_frames: bool = False,
    num_frames: int | None = None,
    pad_left: int | None = None,
    split_at: int = 128,
) -> jnp.ndarray:
    """rect_frames with the per-class matmul split at column ``split_at``."""
    s, P, W = plan.s, plan.P, plan.W
    if s < 8 or W > 128 * s:
        raise ValueError("class-kernel regime required")
    if not 0 < split_at < P:
        raise ValueError(f"split_at {split_at} outside (0, {P})")
    if x.ndim == 1:
        return polyphase_fir_rect_splitbank(
            x[None], plan, n_out, precision=precision, interpret=interpret,
            pad_frames=pad_frames, num_frames=num_frames,
            pad_left=pad_left, split_at=split_at,
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
    xv = xp.reshape(B, J0, s, 128).transpose(0, 2, 1, 3)

    CG = CLASS_GROUP
    n_groups = NUM_CLASSES // CG
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
        n_groups=n_groups, precision=precision, split_at=split_at,
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
            pltpu.VMEM((2, RG + max(wr, 1), Kp, 128), jnp.float32),
            pltpu.SemaphoreType.DMA((2, 2)),
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
    )(jnp.asarray(r0c), jnp.asarray(rrel2), xv, banks)
    frames = out4.reshape(B, Kp * NUM_CLASSES, P)
    if pad_frames:
        return frames.reshape(lead + (Kp * NUM_CLASSES, P))
    return frames[:, :num_frames].reshape(lead + (num_frames, P))
