"""Pallas TPU kernel (EXPERIMENT — does not lower on real-TPU Mosaic):
one-sweep sequential-carry block IIR on flat 128-lane input.

DEMOTED round 3 with a measured/analyzed dead end:

* Lowering: the (G, d) -> (1, G*d) group flatten (in ``_seq_kernel``) is an
  "infer-vector-layout: unsupported shape cast".  Probing Mosaic on this
  toolchain (scripts/mosaic_capability.py): only 128-lane-wide chunks move
  across the sublane/lane boundary — reshape (R*k, 128) <-> (R, k*128) and
  arbitrary 2D transposes lower; (64, 12) -> (1, 768), (64, 16) -> (8, 128)
  and every other non-lane-width merge do not.
* Performance (why we did not redesign around the constraint): a legal
  layout needs G a multiple of 128 -> U = block/G = 64, which DOUBLES the
  dense group-Toeplitz FLOPs per sample (G*d*d/U), and the in-kernel solve
  can batch at most one grid-step's super-blocks as matmul rows (VMEM-
  bound, <= 32 rows -> <= 25% MXU row utilization).  The production XLA
  two-sweep (ops/eq) batches the whole signal's 323 blocks as rows at full
  MXU utilization; its extra HBM sweep (~46 vs 23 MB) costs ~28 us while
  the kernel's utilization loss costs more.  Analysis in STATUS.md r3.

Original design notes follow; the kernel stays correct in interpret mode
(tests/test_kernels.py::test_iir_seq_kernel_matches_oracle).


The XLA fused EQ (ops/eq) is a TWO-sweep algorithm: a state pass (read x,
write injections/states) and an apply pass (read x again, write y) — ~46 MB
of HBM for an 11.5 MB signal, measured at its own roofline (STATUS round-2).
This kernel exploits a TPU property XLA can't: **Pallas grids execute
sequentially**, so a VMEM scratch carries the running cascade state across
grid steps and the whole EQ becomes ONE sweep — read x once, write y once
(23 MB), with the per-block algebra (state injection, dense group-Toeplitz
solve, FIR + state-readout matmuls) running on the MXU while the next
super-block's DMA streams in.

Input is the FLAT signal (the class FIR kernel's flat emission,
kernels/fir_class.polyphase_fir_class_flat) — every matmul and DMA here is
128-lane aligned; the frames-layout 160->256 lane pad that sank the round-1
Pallas EQ (kernels/experiments/iir.py) never exists.

Algebra identical to ops/eq._grouped_run with the block carry resolved
sequentially (exact, no associative-scan rounding): per block
    inj_v   = x_g[v] @ group_in                      (U, d) rows
    s_tail  = inj_flat @ toe                         zero-entry group states
    s_true  = shift(s_tail) + sigma @ pows_gT        carry folded in
    y       = x_g @ fir^T + s_true @ group_out       two MXU matmuls
    sigma'  = sigma @ A_blk^T + s_tail[G-1]          next block's entry
Workload: the reference's 6-band lfilter cascade (dsp_core.py:216-254).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...design.biquad import BlockOperators


def _seq_kernel(x_ref, gin_ref, toe_ref, powsT_ref, fir_ref, gout_ref,
                ablkT_ref, o_ref, state_ref, *, SB, G, U, d, fast):
    k = pl.program_id(1)

    @pl.when(k == 0)
    def _():
        state_ref[...] = jnp.zeros_like(state_ref)

    sigma = state_ref[0:1, :d]                       # (1, d)
    hi = jax.lax.Precision.HIGHEST
    for sb in range(SB):
        x_g = x_ref[0, 0, sb * G : (sb + 1) * G, :]  # (G, U)
        inj = jnp.dot(x_g, gin_ref[...], precision=hi,
                      preferred_element_type=jnp.float32)      # (G, d)
        inj_flat = inj.reshape(1, G * d)
        s_tail_flat = jnp.dot(inj_flat, toe_ref[...], precision=hi,
                              preferred_element_type=jnp.float32)
        # Zero-entry group states shifted one group right + the carry term.
        s_in_flat = jnp.pad(s_tail_flat[:, : (G - 1) * d], ((0, 0), (d, 0)))
        corr_flat = jnp.dot(sigma, powsT_ref[...], precision=hi,
                            preferred_element_type=jnp.float32)
        s_true = (s_in_flat + corr_flat).reshape(G, d)
        if fast:
            xh = x_g.astype(jnp.bfloat16)
            xl = (x_g - xh.astype(jnp.float32)).astype(jnp.bfloat16)
            fh = fir_ref[0]
            fl = fir_ref[1]
            y0 = jnp.dot(xh, fh, preferred_element_type=jnp.float32)
            y0 += jnp.dot(xl, fh, preferred_element_type=jnp.float32)
            y0 += jnp.dot(xh, fl, preferred_element_type=jnp.float32)
        else:
            y0 = jnp.dot(x_g, fir_ref[...], precision=hi,
                         preferred_element_type=jnp.float32)
        y = y0 + jnp.dot(s_true, gout_ref[...], precision=hi,
                         preferred_element_type=jnp.float32)
        o_ref[0, 0, sb * G : (sb + 1) * G, :] = jnp.clip(y, -1.0, 1.0)
        e_zero = s_tail_flat[:, (G - 1) * d :]
        sigma = jnp.dot(sigma, ablkT_ref[...], precision=hi,
                        preferred_element_type=jnp.float32) + e_zero
    state_ref[0:1, :d] = sigma


@functools.lru_cache(maxsize=None)
def _seq_tables(ops: BlockOperators):
    """Host f32 tables in the kernel's layouts (cached per BlockOperators
    singleton).  Returns (gin, toe, powsT, fir_pair, fir_f32, gout, ablkT)."""
    import ml_dtypes

    d = ops.A.shape[0]
    U = ops.unroll
    G = ops.block // U
    f32 = np.float32
    gin = ops.group_in.astype(f32)                       # (U, d)
    toe = ops.group_toeplitz.astype(f32)                 # (G d, G d)
    # corr_flat = sigma @ powsT with powsT[j, g*d + e] = A^{gU}[e, j].
    powsT = np.transpose(ops.group_pows, (2, 0, 1)).reshape(d, G * d)
    fir = ops.group_fir.T.astype(f32)                    # (U, U)
    fh = fir.astype(ml_dtypes.bfloat16)
    fl = (fir - fh.astype(f32)).astype(ml_dtypes.bfloat16)
    gout = ops.group_out.astype(f32)                     # (d, U)
    ablkT = ops.state_corr.T.astype(f32)                 # (d, d)
    return (gin, toe, powsT.astype(f32), np.stack([fh, fl]), fir, gout,
            ablkT)


def equalize_seq_flat(
    x: jnp.ndarray,
    ops: BlockOperators,
    *,
    super_blocks: int = 10,
    fast: bool = True,
    interpret: bool = False,
) -> jnp.ndarray:
    """One-sweep EQ on flat (..., L) input; L must be a multiple of
    super_blocks * ops.block (the class FIR's padded flat length is, with
    the default geometry).  Returns the clipped output, same shape.

    The trailing pad region's outputs are garbage-in-garbage-out (cropped
    by the caller); the running state resets per leading-axis element.
    """
    U = ops.unroll
    G = ops.block // U
    d = ops.A.shape[0]
    SB = super_blocks
    lead = x.shape[:-1]
    L = x.shape[-1]
    B = int(np.prod(lead)) if lead else 1
    if L % (SB * ops.block):
        raise ValueError(
            f"flat length {L} must be a multiple of {SB}*{ops.block}"
        )
    Ks = L // (SB * ops.block)
    x4 = x.reshape(B, Ks, SB * G, U)

    gin, toe, powsT, fir_pair, fir_f32, gout, ablkT = _seq_tables(ops)
    fir_arg = jnp.asarray(fir_pair if fast else fir_f32)
    fir_spec = pl.BlockSpec(
        fir_arg.shape, (lambda b, k: (0, 0, 0) if fast else (0, 0)),
        memory_space=pltpu.VMEM,
    )

    def table_spec(shape):
        return pl.BlockSpec(shape, lambda b, k: (0,) * len(shape),
                            memory_space=pltpu.VMEM)

    kern = functools.partial(_seq_kernel, SB=SB, G=G, U=U, d=d, fast=fast)
    out = pl.pallas_call(
        kern,
        grid=(B, Ks),
        in_specs=[
            pl.BlockSpec((1, 1, SB * G, U), lambda b, k: (b, k, 0, 0),
                         memory_space=pltpu.VMEM),
            table_spec(gin.shape),
            table_spec(toe.shape),
            table_spec(powsT.shape),
            fir_spec,
            table_spec(gout.shape),
            table_spec(ablkT.shape),
        ],
        out_specs=pl.BlockSpec((1, 1, SB * G, U), lambda b, k: (b, k, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, Ks, SB * G, U), jnp.float32),
        scratch_shapes=[pltpu.VMEM((8, 128), jnp.float32)],
        interpret=interpret,
    )(x4, jnp.asarray(gin), jnp.asarray(toe), jnp.asarray(powsT), fir_arg,
      jnp.asarray(gout), jnp.asarray(ablkT))
    return out.reshape(lead + (L,))
