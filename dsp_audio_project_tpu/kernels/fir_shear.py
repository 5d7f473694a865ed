"""Pallas TPU kernel: polyphase FIR via in-VMEM shear — no HBM retile.

The XLA path (ops/src.py) must materialize the (frames, s) view of the
input, and for s not a multiple of 128 XLA lowers that to generic
linearize/retile while-loops — measured at ~half the whole SRC+EQ chain's
device time at batch size 8.  This kernel never materializes the view in
HBM: each grid step DMAs one slab of the *flat* input (viewed as 128-lane
groups, a free reshape) and builds the frame matrix in VMEM with a static
shear, then runs the polyphase matmul on the MXU.

Shear construction (the heart of the kernel).  Within a 128-frame subtile,
frame r starts at flat offset s*r; write s r = 128 g(r) + o(r):

  * A_j[r] = slab_group[g(r) + j] for j < num_cols gathers the groups each
    frame touches.  g(r) - r is a monotone staircase with few distinct
    values, so the "gather" is a fixed list of contiguous sublane slices
    (one per staircase run) — no dynamic indexing at all.
  * o(r) = s r mod 128 is a fixed per-row lane rotation, applied with a
    7-stage barrel shifter: stage b rotates the whole tile by 2^b lanes
    and keeps the rotated rows only where bit b of o(r) is set — all masks
    are compile-time constants.

Mosaic DMA slices must start/size-align to the (8, 128) tile, and subtile
group offsets u*s are generally odd — so each grid step fetches a SUPER
(= 8/gcd(s,8)) subtile slab whose start IS aligned, shears all SUPER
subtiles (static in-slab offsets), and runs ONE (SUPER*128, wp) @ (wp, P)
MXU matmul.

Everything in the kernel is a static-shape slice/roll/select/matmul, which
is exactly what Mosaic compiles well.  Output is emitted frame-major
(..., frames, P): consumers either reshape once (standalone resample) or —
in the fused pipeline — feed the EQ directly at unroll = P, making every
layout change between SRC and EQ a free leading-axis regroup.

Semantics match ops/src._resample_frames exactly (same plan.G, same
windows); parity is gated in tests/test_kernels.py.
"""
from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..ops.src import PolyphasePlan

TILE_FRAMES = 128  # frames per subtile


@functools.lru_cache(maxsize=None)
def _shear_geometry(s: int, W: int):
    """Static staircase/rotation tables; see module docstring.

    Returns (wp, num_cols, super_, rows_fetch, runs, rot_bits).
    """
    wp = 128 * -(-W // 128)
    r = np.arange(TILE_FRAMES)
    g = (s * r) // 128
    o = (s * r) % 128
    jump = g - r
    num_cols = int(np.ceil((int(o.max()) + wp) / 128.0))
    rows_sub = int(g.max()) + num_cols      # slab rows one subtile reads
    runs = []
    start = 0
    for i in range(1, TILE_FRAMES + 1):
        if i == TILE_FRAMES or jump[i] != jump[start]:
            runs.append((start, i, int(jump[start])))
            start = i
    super_ = 8 // math.gcd(s, 8)            # subtiles per aligned grid step
    rows_fetch = 8 * -(-((super_ - 1) * s + rows_sub) // 8)
    rot_bits = np.zeros((7, TILE_FRAMES, 1), dtype=np.float32)
    for b in range(7):
        rot_bits[b, :, 0] = (o >> b) & 1
    return wp, num_cols, super_, rows_fetch, tuple(runs), rot_bits


def _shear_kernel(x_hbm, g_ref, m_ref, o_ref, xbuf, sem, *, s, runs,
                  num_cols, wp, super_, rows_fetch, precision,
                  split_subtiles=False):
    b = pl.program_id(0)
    t = pl.program_id(1)
    cp = pltpu.make_async_copy(
        x_hbm.at[b, pl.ds(t * (super_ * s), rows_fetch), :], xbuf, sem
    )
    cp.start()
    cp.wait()

    slab = xbuf[:, :]                                  # (rows_fetch, 128)
    width = 128 * num_cols

    def matmul(f):
        if precision == "fast":
            # bf16x3: split the frame matrix, host-split filter — ~1e-5
            # relative instead of f32, at half of HIGHEST's six MXU passes.
            fh = f.astype(jnp.bfloat16)
            fl = (f - fh.astype(jnp.float32)).astype(jnp.bfloat16)
            gh = g_ref[0]
            gl = g_ref[1]
            acc = jnp.dot(fh, gh, preferred_element_type=jnp.float32)
            acc += jnp.dot(fl, gh, preferred_element_type=jnp.float32)
            acc += jnp.dot(fh, gl, preferred_element_type=jnp.float32)
            return acc
        return jnp.dot(
            f, g_ref[:, :], preferred_element_type=jnp.float32,
            precision=precision,
        )

    def shear_tile(u):
        base = u * s
        cols = []
        for j in range(num_cols):
            parts = [
                slab[base + a + off + j: base + b2 + off + j, :]
                for (a, b2, off) in runs
            ]
            cols.append(
                parts[0] if len(parts) == 1
                else jnp.concatenate(parts, axis=0)
            )
        return cols[0] if num_cols == 1 else jnp.concatenate(cols, axis=1)

    if split_subtiles:
        # Per-subtile shear -> rotate -> matmul chains are independent, so
        # Mosaic can overlap subtile u's MXU matmul with u+1's VPU shear.
        outs = []
        for u in range(super_):
            fw = shear_tile(u)
            mref_u = m_ref[:, u * TILE_FRAMES:(u + 1) * TILE_FRAMES]
            for bit in range(7):
                rolled = pltpu.roll(fw, width - (1 << bit), 1)
                fw = jnp.where(mref_u[bit] > 0, rolled, fw)
            outs.append(matmul(fw[:, :wp]))
        o_ref[0] = jnp.concatenate(outs, axis=0)
        return

    tiles = [shear_tile(u) for u in range(super_)]
    fw = tiles[0] if super_ == 1 else jnp.concatenate(tiles, axis=0)
    for bit in range(7):
        # left-rotate by 2^bit == roll forward by width - 2^bit
        rolled = pltpu.roll(fw, width - (1 << bit), 1)
        fw = jnp.where(m_ref[bit] > 0, rolled, fw)
    o_ref[0] = matmul(fw[:, :wp])


@functools.lru_cache(maxsize=None)
def _padded_g_wp(plan: PolyphasePlan, wp: int):
    g = np.zeros((wp, plan.P), dtype=np.float32)
    g[: plan.W] = plan.G.astype(np.float32)
    return g


@functools.lru_cache(maxsize=None)
def _padded_g_wp_split(plan: PolyphasePlan, wp: int):
    """(2, wp, P) bf16 exact hi/lo split of the filter for fast mode."""
    import ml_dtypes

    g = _padded_g_wp(plan, wp)
    gh = g.astype(ml_dtypes.bfloat16)
    gl = (g - gh.astype(np.float32)).astype(ml_dtypes.bfloat16)
    return np.stack([gh, gl])


def polyphase_fir_shear_frames(
    x: jnp.ndarray,
    plan: PolyphasePlan,
    n_out: int,
    *,
    precision=jax.lax.Precision.HIGHEST,
    interpret: bool = False,
    pad_frames: bool = False,
    num_frames: int | None = None,
    pad_left: int | None = None,
    split_subtiles: bool = False,
) -> jnp.ndarray:
    """Resample (..., N) -> frames (..., ceil(n_out/P), P).

    Frame-major output: frames.reshape(..., -1)[..., :n_out] equals
    ops/src.resample's flat output.  Requires s >= 8 (below that the XLA
    gather path already wins).

    ``pad_frames=True`` returns the full tile-aligned frame count (a
    multiple of super*128) instead of slicing to ceil(n_out/P): the tail
    frames hold convolution of the zero padding — callers that slice by
    n_out downstream (the fused pipeline) skip a pad/slice HBM round trip.

    ``pad_left`` overrides the implicit zero extension max(0, -lo): a
    shard-local caller (parallel/pipeline.py) hands in the halo-EXTENDED
    signal, where frame 0's window already starts at index lo + pad_left
    == 0 of real neighbor data, and passes pad_left=0.  ``num_frames``
    likewise overrides ceil(n_out/P) for shards whose frame count is
    fixed by the shard plan rather than by an output length.
    """
    s, P, W = plan.s, plan.P, plan.W
    if s < 8:
        raise ValueError("shear kernel targets the wide-stride regime s>=8")
    if x.ndim == 1:
        return polyphase_fir_shear_frames(
            x[None], plan, n_out, precision=precision, interpret=interpret,
            pad_frames=pad_frames, num_frames=num_frames, pad_left=pad_left,
            split_subtiles=split_subtiles,
        )[0]
    lead = x.shape[:-1]
    n = x.shape[-1]
    B = int(np.prod(lead))

    wp, num_cols, super_, rows_fetch, runs, rot_bits = _shear_geometry(s, W)
    frames_per_step = super_ * TILE_FRAMES
    if num_frames is None:
        num_frames = -(-n_out // P)
    T = -(-num_frames // frames_per_step)

    if pad_left is None:
        pad_left = max(0, -plan.lo)
    if pad_left < 0:  # window start lies inside x: drop the lead instead
        x = x[..., -pad_left:]
        n = x.shape[-1]
        pad_left = 0
    total = ((T - 1) * super_ * s + rows_fetch) * 128
    # Kernel reads exactly `total` samples; a longer input (halo-extended
    # shards) still needs the group view to stay 128-divisible.
    total = max(total, 128 * -(-(pad_left + n) // 128))
    pad_right = total - pad_left - n
    xp = jnp.pad(
        x.reshape(B, n).astype(jnp.float32), ((0, 0), (pad_left, pad_right))
    )
    xg = xp.reshape(B, -1, 128)                    # free lane-aligned view

    kern = functools.partial(
        _shear_kernel, s=s, runs=runs, num_cols=num_cols, wp=wp,
        super_=super_, rows_fetch=rows_fetch, precision=precision,
        split_subtiles=split_subtiles,
    )
    if precision == "fast":
        gp = jnp.asarray(_padded_g_wp_split(plan, wp))
        g_spec = pl.BlockSpec((2, wp, P), lambda b, t: (0, 0, 0),
                              memory_space=pltpu.VMEM)
    else:
        gp = jnp.asarray(_padded_g_wp(plan, wp))
        g_spec = pl.BlockSpec((wp, P), lambda b, t: (0, 0),
                              memory_space=pltpu.VMEM)
    masks = jnp.asarray(np.tile(rot_bits, (1, super_, 1)))  # (7, S*128, 1)

    frames = pl.pallas_call(
        kern,
        grid=(B, T),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),     # flat x stays in HBM
            g_spec,
            pl.BlockSpec((7, frames_per_step, 1), lambda b, t: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, frames_per_step, P), lambda b, t: (b, t, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct(
            (B, T * frames_per_step, P), jnp.float32
        ),
        scratch_shapes=[
            pltpu.VMEM((rows_fetch, 128), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=interpret,
    )(xg, gp, masks)
    if pad_frames:
        return frames.reshape(lead + (T * frames_per_step, P))
    return frames[:, :num_frames].reshape(lead + (num_frames, P))
