"""Pallas TPU kernel: class-major polyphase FIR with pre-rotated G banks.

The shear kernel (kernels/fir_shear.py) tiles frames in time order, so each
128-frame subtile mixes all 128 lane offsets o(r) = (w0 + s*r) mod 128 and
must physically rotate every row with a 7-stage barrel shifter — measured at
~2/3 of its kernel time (VPU-bound).  This kernel removes the rotation
entirely by choosing a tiling in which the offset is CONSTANT per grid step:

    o(f) depends only on f mod 128   (because 128*s*k = 0 mod 128),

so frames of one residue class rho = f mod 128 all start at the same lane
offset o(rho).  Each grid step processes one class:

  * input rows: frame f = 128k + rho starts at flat group row
    gbase(rho) + s*k — an s-strided row sequence.  A one-time XLA staging
    transpose re-groups the flat input as xT[b, m, j, :] = groups[m + s*j],
    making each class's rows a CONTIGUOUS slab xT[b, m_c, d_c:d_c+K, :]
    that a plain BlockSpec fetches (m_c/d_c come from scalar-prefetch
    tables, per Pallas' PrefetchScalarGridSpec index-map mechanism);
  * operator: a host-precomputed bank stack banks[rho][q, p] =
    G[q - o(rho), p] — the lane rotation lives in the operator, not the
    data path.  One (B*K, 128) @ (128, P) MXU matmul per fetched column
    block, accumulated in float32.

Per grid step the kernel does nc block DMAs, nc (or 3*nc in bf16x3 fast
mode) matmuls, and one output write — no rolls, no staircase concats, no
per-row select masks.  The cost model is pure HBM bandwidth + MXU.

Semantics are identical to ops/src._resample_frames (same plan.G, same
window alignment); parity is gated in tests/test_kernels.py.  Replaces the
workload of /root/reference/modules/dsp_core.py:166 (full-rate 'same'
convolution) like the shear kernel does.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..ops.src import PolyphasePlan

NUM_CLASSES = 128  # one residue class per lane offset


@functools.lru_cache(maxsize=None)
def _class_geometry(s: int, W: int, w0: int):
    """Static per-class tables.

    Returns (nc, m_tab, d_tab, dmax, o) where for class rho and column
    block c, the rows of the staged transpose xT[b, m, j, :] needed are
    m = m_tab[c, rho], j = d_tab[c, rho] + k (k = super index), and the
    operator bank for rho is G shifted to lane offset o[rho].
    """
    rho = np.arange(NUM_CLASSES)
    start = w0 + s * rho          # flat offset of frame rho's window start
    o = start % 128
    gb = start // 128
    nc = int(np.ceil((int(o.max()) + W) / 128.0))
    m_tab = np.zeros((nc, NUM_CLASSES), np.int32)
    d_tab = np.zeros((nc, NUM_CLASSES), np.int32)
    for c in range(nc):
        m_tab[c] = (gb + c) % s
        d_tab[c] = (gb + c) // s
    return nc, m_tab, d_tab, int(d_tab.max()), o


@functools.lru_cache(maxsize=None)
def _class_banks(plan: PolyphasePlan, w0: int) -> np.ndarray:
    """(128, nc*128, P) float32 pre-rotated operator banks."""
    nc, _, _, _, o = _class_geometry(plan.s, plan.W, w0)
    banks = np.zeros((NUM_CLASSES, nc * 128, plan.P), np.float32)
    for r in range(NUM_CLASSES):
        banks[r, o[r] : o[r] + plan.W, :] = plan.G
    return banks


@functools.lru_cache(maxsize=None)
def _class_banks_split(plan: PolyphasePlan, w0: int) -> np.ndarray:
    """(128, 2, nc*128, P) bf16 exact hi/lo split for fast mode."""
    import ml_dtypes

    b = _class_banks(plan, w0)
    bh = b.astype(ml_dtypes.bfloat16)
    bl = (b - bh.astype(np.float32)).astype(ml_dtypes.bfloat16)
    return np.stack([bh, bl], axis=1)


# ---- EQ-epilogue-fused (cat) banks ------------------------------------------
#
# The fused frame-major chain's next op after the FIR is the EQ's per-frame
# weight-concat matmul  frames @ [group_fir^T | group_in]  (ops/eq
# _grouped_parts fast mode) — frame-independent weights, so by matmul
# distributivity it folds into the operator bank on the HOST:
#
#     cat[f] = (x_win[f] @ G) @ w_cat = x_win[f] @ (G @ w_cat),
#
# composed in float64 at design time.  The kernel then emits [y0 | inj]
# directly and the frames tensor never round-trips through HBM (write
# 11.8 MB + read ~11.8 MB on the 60 s serving config).  MXU cost is
# UNCHANGED: the output width grows P -> P + DPAD (160 -> 176 for the
# serving EQ), and both pad to the same 256 MXU lanes.
#
# Emission layout (round-5 measurement): a SINGLE (..., F, P+d) cat array
# forces XLA to materialize lane-misaligned y0/inj slices downstream
# (slice.11 + copy.10 + slice.19 ~ 23 us/signal — the round trip came
# back as slices).  So the kernel writes TWO arrays, each consumed with
# zero slicing:
#   * y0 frames (..., F, P) — byte-identical layout to the frames output;
#     the EQ's final fusion reads it directly;
#   * inj packed (..., Kp, 128*DPAD) with inj_p[b, k, rho*DPAD + dd] =
#     inj[frame 128k+rho][dd] — CLASS_GROUP*DPAD = 128 lanes per grid
#     step, so out blocks stay lane-aligned; the group-Toeplitz solve
#     consumes it flat against a DPAD-strided weight table
#     (ops/eq._toe_padded) with no reshape and no slice.
#
# Cache keyed on the w_cat bytes: BlockOperators singletons produce a
# stable small (P, P+d) float64 array per (bands, fs, q, block, unroll).

DPAD = 16  # packed per-class stride of the inj output (CLASS_GROUP*DPAD=128)

_banks_cat_cache: dict = {}


def _class_banks_cat(plan: PolyphasePlan, w0: int, w_cat: np.ndarray,
                     split: bool) -> np.ndarray:
    """Pre-rotated banks of G2 = G @ [w_cat | 0-pad]: (128, nc*128, P+DPAD)
    f32, or the (128, 2, nc*128, P+DPAD) bf16 hi/lo split when ``split``.
    Columns [P : P+d] hold the inj weights, [P+d : P+DPAD] are zero."""
    key = (plan, w0, bool(split), w_cat.tobytes())
    cached = _banks_cat_cache.get(key)
    if cached is not None:
        return cached
    P = plan.P
    if w_cat.shape[0] != P:
        raise ValueError(
            f"w_cat rows {w_cat.shape[0]} must equal plan.P {P}"
        )
    d = w_cat.shape[1] - P
    if not 0 < d <= DPAD:
        raise ValueError(f"inj width {d} outside (0, {DPAD}]")
    G2 = (plan.G.astype(np.float64) @ w_cat.astype(np.float64)).astype(
        np.float32
    )
    Vp = P + DPAD
    nc, _, _, _, o = _class_geometry(plan.s, plan.W, w0)
    banks = np.zeros((NUM_CLASSES, nc * 128, Vp), np.float32)
    for r in range(NUM_CLASSES):
        banks[r, o[r] : o[r] + plan.W, : P + d] = G2
    if split:
        import ml_dtypes

        bh = banks.astype(ml_dtypes.bfloat16)
        bl = (banks - bh.astype(np.float32)).astype(ml_dtypes.bfloat16)
        banks = np.stack([bh, bl], axis=1)
    _banks_cat_cache[key] = banks
    return banks


def class_supported(plan: PolyphasePlan) -> bool:
    """True when this kernel covers the plan's geometry (wide stride)."""
    return plan.s >= 8 and plan.W <= 128 * plan.s


def rect_supported(plan: PolyphasePlan) -> bool:
    """True when the rect (manual-DMA) variant covers the plan: the class
    envelope AND the class-group row rectangle fits inside the s staged
    rows (see _class_rect_geometry)."""
    if not class_supported(plan):
        return False
    try:
        _class_rect_geometry(plan.s, plan.W, 0)
    except ValueError:
        return False
    return True


# ---- flat-output variant ---------------------------------------------------
#
# The frames layout (..., F, 160) costs every downstream op a 160->256 lane
# pad (STATUS round-2 headroom #1).  This variant emits the FLAT signal
# directly, 128-lane aligned, at ~zero extra kernel cost via two facts:
#
#   * the MXU already pads the output dim 160 -> 256, so shifting a class's
#     bank COLUMNS by its flat lane offset w(rho) = (160*rho) mod 128
#     (always in {0, 32, 64, 96}, and w + 160 <= 256) is free — the matmul
#     lands the class's outputs exactly lane-aligned;
#   * flat positions of class rho cover lane-groups [g(rho), g(rho)+2) with
#     g(rho) = (160*rho) >> 7, and a CLASS_GROUP of 8 consecutive classes
#     tiles exactly 10 groups (4 classes x 160 = 5 x 128), so per grid step
#     the 8 shifted (Kp, 256) results accumulate into one (Kp, 1280) block
#     at static 128-aligned offsets — plain VPU adds, no shuffles, and the
#     output array IS the flat signal: out[b, k, rho*160 + p].


@functools.lru_cache(maxsize=None)
def _class_banks_flat(plan: PolyphasePlan, w0: int) -> np.ndarray:
    """(128, nc*128, 256) banks with both rotations folded in:
    rows shifted by the input offset o(rho), columns by (160*rho) mod 128."""
    nc, _, _, _, o = _class_geometry(plan.s, plan.W, w0)
    P = plan.P
    wb = 256 if P > 128 else 128
    banks = np.zeros((NUM_CLASSES, nc * 128, wb), np.float32)
    for r in range(NUM_CLASSES):
        wout = (P * r) % 128
        banks[r, o[r] : o[r] + plan.W, wout : wout + P] = plan.G
    return banks


@functools.lru_cache(maxsize=None)
def _class_banks_flat_split(plan: PolyphasePlan, w0: int) -> np.ndarray:
    import ml_dtypes

    b = _class_banks_flat(plan, w0)
    bh = b.astype(ml_dtypes.bfloat16)
    bl = (b - bh.astype(np.float32)).astype(ml_dtypes.bfloat16)
    return np.stack([bh, bl], axis=1)


CLASS_GROUP = 8  # classes per grid step (Mosaic sublane-dim block minimum)


def _class_kernel(m_ref, d_ref, *refs, nc, Kp, P, precision):
    """One grid step: CLASS_GROUP classes x one batch row.

    refs = [x_{c=0,j=0} ... x_{c=nc-1,j=CLASS_GROUP-1}, banks, out].
    Each x slab is (1, 1, J, 128); out block is (1, Kp, CLASS_GROUP, P).
    """
    bank_ref = refs[nc * CLASS_GROUP]
    out_ref = refs[nc * CLASS_GROUP + 1]
    t = pl.program_id(0)
    for j in range(CLASS_GROUP):
        rho = t * CLASS_GROUP + j
        acc = None
        for c in range(nc):
            sl = refs[c * CLASS_GROUP + j][
                0, 0, pl.ds(d_ref[c, rho], Kp), :
            ]                                         # (Kp, 128)
            if precision == "fast":
                fh = sl.astype(jnp.bfloat16)
                fl = (sl - fh.astype(jnp.float32)).astype(jnp.bfloat16)
                gh = bank_ref[0, j, 0, c * 128 : (c + 1) * 128, :]
                gl = bank_ref[0, j, 1, c * 128 : (c + 1) * 128, :]
                term = jnp.dot(fh, gh, preferred_element_type=jnp.float32)
                term += jnp.dot(fl, gh, preferred_element_type=jnp.float32)
                term += jnp.dot(fh, gl, preferred_element_type=jnp.float32)
            else:
                term = jnp.dot(
                    sl, bank_ref[0, j, c * 128 : (c + 1) * 128, :],
                    preferred_element_type=jnp.float32, precision=precision,
                )
            acc = term if acc is None else acc + term
        out_ref[0, :, j, :] = acc


def class_flat_supported(plan: PolyphasePlan) -> bool:
    """Flat emission needs every class's 256-wide MXU result to stay
    lane-aligned inside the class-group block (see the section comment)."""
    import math

    P = plan.P
    if not class_supported(plan):
        return False
    if P == 128:
        return True
    return P % 16 == 0 and 128 < P <= 128 + math.gcd(P, 128)


def _class_kernel_flat(m_ref, d_ref, *refs, nc, Kp, P, Wb, precision):
    """One grid step: CLASS_GROUP classes assembled into one flat block.

    Each class's matmul output (Kp, Wb) is already shifted to its flat lane
    offset (column-rotated bank); the 8 results accumulate into the
    (Kp, CLASS_GROUP*P) block at static 128-aligned offsets — overlap lanes
    are zero in exactly one operand, so add == concat.
    """
    bank_ref = refs[nc * CLASS_GROUP]
    out_ref = refs[nc * CLASS_GROUP + 1]
    t = pl.program_id(0)
    # Accumulate straight into the VMEM output block with static 128-aligned
    # slice read-modify-writes (a jnp buffer with .at[].add would lower to
    # scatter-add, which Mosaic TC has no primitive for).
    out_ref[0] = jnp.zeros((Kp, CLASS_GROUP * P), jnp.float32)
    for j in range(CLASS_GROUP):
        rho = t * CLASS_GROUP + j
        acc = None
        for c in range(nc):
            sl = refs[c * CLASS_GROUP + j][
                0, 0, pl.ds(d_ref[c, rho], Kp), :
            ]                                         # (Kp, 128)
            if precision == "fast":
                fh = sl.astype(jnp.bfloat16)
                fl = (sl - fh.astype(jnp.float32)).astype(jnp.bfloat16)
                gh = bank_ref[0, j, 0, c * 128 : (c + 1) * 128, :]
                gl = bank_ref[0, j, 1, c * 128 : (c + 1) * 128, :]
                term = jnp.dot(fh, gh, preferred_element_type=jnp.float32)
                term += jnp.dot(fl, gh, preferred_element_type=jnp.float32)
                term += jnp.dot(fh, gl, preferred_element_type=jnp.float32)
            else:
                term = jnp.dot(
                    sl, bank_ref[0, j, c * 128 : (c + 1) * 128, :],
                    preferred_element_type=jnp.float32, precision=precision,
                )
            acc = term if acc is None else acc + term
        a = j * P - (P * j) % 128          # 128-aligned block offset
        out_ref[0, :, a : a + Wb] += acc


def polyphase_fir_class_flat(
    x: jnp.ndarray,
    plan: PolyphasePlan,
    n_out: int,
    *,
    precision=jax.lax.Precision.HIGHEST,
    interpret: bool = False,
    pad_out: bool = False,
    num_frames: int | None = None,
    pad_left: int | None = None,
) -> jnp.ndarray:
    """Resample (..., N) -> FLAT (..., n_out) output, 128-lane aligned.

    Identical samples to polyphase_fir_class_frames(...).reshape(..., -1)
    [..., :n_out], but the kernel writes the flat layout directly (no
    160-lane frame structure anywhere), so downstream EQ/spectrum/export
    read a clean (..., 128)-tiled signal.  With ``pad_out=True`` returns
    the padded (..., Kp*128*P) buffer (tail holds zero-padding convolution).
    """
    s, P, W = plan.s, plan.P, plan.W
    if not class_flat_supported(plan):
        raise ValueError("plan geometry unsupported by the flat class kernel")
    if x.ndim == 1:
        return polyphase_fir_class_flat(
            x[None], plan, n_out, precision=precision, interpret=interpret,
            pad_out=pad_out, num_frames=num_frames, pad_left=pad_left,
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

    nc, m_tab, d_tab, dmax, _ = _class_geometry(s, W, w0)
    J = Kp + dmax + 1
    total = 128 * s * J
    pad_right = total - pad_left - n
    if pad_right < 0:
        x = x[..., : n + pad_right]
        pad_right = 0
    xp = jnp.pad(x.astype(jnp.float32), ((0, 0), (pad_left, pad_right)))
    xT = xp.reshape(B, J, s, 128).transpose(0, 2, 1, 3)

    CG = CLASS_GROUP
    n_groups = NUM_CLASSES // CG
    Wb = 256 if P > 128 else 128
    if precision == "fast":
        banks = jnp.asarray(_class_banks_flat_split(plan, w0))
        banks = banks.reshape(n_groups, CG, 2, nc * 128, Wb)
        bank_spec = pl.BlockSpec(
            (1, CG, 2, nc * 128, Wb), lambda t, b, m, d: (t, 0, 0, 0, 0),
            memory_space=pltpu.VMEM,
        )
    else:
        banks = jnp.asarray(_class_banks_flat(plan, w0))
        banks = banks.reshape(n_groups, CG, nc * 128, Wb)
        bank_spec = pl.BlockSpec(
            (1, CG, nc * 128, Wb), lambda t, b, m, d: (t, 0, 0, 0),
            memory_space=pltpu.VMEM,
        )

    def x_spec(c, j):
        return pl.BlockSpec(
            (1, 1, J, 128),
            lambda t, b, m, d, c=c, j=j: (b, m[c, t * CG + j], 0, 0),
            memory_space=pltpu.VMEM,
        )

    kern = functools.partial(
        _class_kernel_flat, nc=nc, Kp=Kp, P=P, Wb=Wb, precision=precision,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_groups, B),
        in_specs=[x_spec(c, j) for c in range(nc) for j in range(CG)]
        + [bank_spec],
        out_specs=pl.BlockSpec(
            (1, Kp, CG * P), lambda t, b, m, d: (b, 0, t),
            memory_space=pltpu.VMEM,
        ),
    )
    out3 = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct(
            (B, Kp, NUM_CLASSES * P), jnp.float32
        ),
        grid_spec=grid_spec,
        interpret=interpret,
    )(jnp.asarray(m_tab), jnp.asarray(d_tab), *([xT] * (nc * CG)), banks)

    flat = out3.reshape(B, Kp * NUM_CLASSES * P)
    if pad_out:
        return flat.reshape(lead + (Kp * NUM_CLASSES * P,))
    return flat[:, :n_out].reshape(lead + (n_out,))


# ---- group-rectangle manual-DMA variant (round 4) --------------------------
#
# The BlockSpec kernel above fetches nc slabs per class: every (t, b) step
# DMAs 24 (1, J, 128) slabs whose rows overlap heavily between classes —
# measured ~2.6x refetch of the staged input (~27 MB/signal vs 10.9 unique).
# Reformulating rows in VIRTUAL row space removes the mod-s wrap entirely:
#
#   frame f = 128k + rho starts at flat chunk  gb(rho) + s*k,
#   so with  xv[b, r, j] = x_chunks[b, r + s*j]        (r = virtual row)
#   class rho's slab for column c is  xv[b, gb(rho)+c, 0:Kp, :]  — the
#   J-offset tables (d_tab) vanish, and one class GROUP's 24 slabs live in
#   a contiguous row rectangle [r0(t), r0(t)+RG) with RG ~ ceil(7s/128)+nc.
#
# The kernel fetches that rectangle with ONE manually double-buffered DMA
# per grid step (~RG*Kp*512 B, contiguous) — cutting x traffic to ~1.25x
# unique — while banks/outputs keep their auto-pipelined BlockSpecs.


@functools.lru_cache(maxsize=None)
def _class_rect_geometry(s: int, W: int, w0: int):
    """(nc, r0c, rrel2, RG, wr): virtual-row tables for the rect kernel.

    Class rho, column c reads staged row gb[rho] + c in VIRTUAL row space
    (gb = (w0 + s*rho) // 128; rows r >= s alias (r - s, j + 1) of the
    standard (B, s, J, 128) staging — no extra staging buffer needed).
    r0c[t] is group t's clamped rectangle base (min(r0, s - RG), so the
    main rectangle stays inside [0, s)); rrel2[c, rho] is the scratch row
    holding class rho's column c: gb+c - r0c in the main rectangle, or
    RG + (gb+c - s) in the wrap tail fetched by a second tiny DMA from
    rows [0, wr) at J-offset 1.
    """
    rho = np.arange(NUM_CLASSES)
    start = w0 + s * rho
    o = start % 128
    gb = start // 128
    nc = int(np.ceil((int(o.max()) + W) / 128.0))
    n_groups = NUM_CLASSES // CLASS_GROUP
    g = gb.reshape(n_groups, CLASS_GROUP)
    RG = int((g[:, -1] - g[:, 0]).max()) + nc
    if RG > s:
        # The clamped rectangle base min(g[:,0], s - RG) would go negative
        # and the main DMA would read out of bounds.  class_supported admits
        # W up to 128*s, where RG ~ (W + CLASS_GROUP*s)/128 can exceed s —
        # fail loudly; fir_frames routes such plans to the BlockSpec kernel.
        raise ValueError(
            f"rect kernel rectangle ({RG} rows) exceeds the staged row count "
            f"s={s}; route this plan to the 'class' kernel"
        )
    r0c = np.minimum(g[:, 0], s - RG).astype(np.int32)
    wr = max(0, int(gb.max()) + nc - s)   # wrap rows (rows >= s)
    rrel2 = np.zeros((nc, NUM_CLASSES), np.int32)
    for c in range(nc):
        r = gb + c
        base = np.repeat(r0c, CLASS_GROUP)
        rrel2[c] = np.where(r < s, r - base, RG + (r - s))
        assert (rrel2[c] >= 0).all() and (rrel2[c] < RG + max(wr, 1)).all()
    return nc, r0c, rrel2, RG, wr


def _class_rect_kernel(r0_ref, rrel_ref, x_hbm, bank_ref, out_ref, xbuf,
                       sems, *, nc, Kp, P, RG, wr, B, n_groups, precision):
    """One grid step: CLASS_GROUP classes from one row-rectangle.

    xbuf: (2, RG + wr, Kp, 128) VMEM scratch, double-buffered; sems:
    DMA((2, 2)).  The rectangle for step (t, b) is started by the PREVIOUS
    step (prologue starts the first); each step waits its slot, kicks off
    the next step's copies, then runs the same per-class matmuls as
    _class_kernel with slabs sliced out of the resident rectangle.  Two
    DMAs per step: the main rows [r0c, r0c+RG) x J[0:Kp], plus (wr > 0)
    the wrap rows 0..wr at J[1:Kp+1] into the scratch tail.
    """
    t = pl.program_id(0)
    b = pl.program_id(1)
    step = t * B + b
    slot = jax.lax.rem(step, 2)

    def dma_main(t_i, b_i, slot_i):
        return pltpu.make_async_copy(
            x_hbm.at[b_i, pl.ds(r0_ref[t_i], RG), 0:Kp, :],
            xbuf.at[slot_i, 0:RG],
            sems.at[slot_i, 0],
        )

    def dma_wrap(b_i, slot_i):
        return pltpu.make_async_copy(
            x_hbm.at[b_i, 0:wr, 1 : Kp + 1, :],
            xbuf.at[slot_i, RG : RG + wr],
            sems.at[slot_i, 1],
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
        t_n = jnp.where(last_b, t + 1, t)
        b_n = jnp.where(last_b, 0, b + 1)
        start_all(t_n, b_n, 1 - slot)

    for j in range(CLASS_GROUP):
        rho = t * CLASS_GROUP + j
        acc = None
        for c in range(nc):
            sl = xbuf[slot, rrel_ref[c, rho]]         # (Kp, 128)
            if precision == "fast":
                fh = sl.astype(jnp.bfloat16)
                fl = (sl - fh.astype(jnp.float32)).astype(jnp.bfloat16)
                gh = bank_ref[0, j, 0, c * 128 : (c + 1) * 128, :]
                gl = bank_ref[0, j, 1, c * 128 : (c + 1) * 128, :]
                term = jnp.dot(fh, gh, preferred_element_type=jnp.float32)
                term += jnp.dot(fl, gh, preferred_element_type=jnp.float32)
                term += jnp.dot(fh, gl, preferred_element_type=jnp.float32)
            else:
                term = jnp.dot(
                    sl, bank_ref[0, j, c * 128 : (c + 1) * 128, :],
                    preferred_element_type=jnp.float32, precision=precision,
                )
            acc = term if acc is None else acc + term
        out_ref[0, :, j, :] = acc


def _class_rect_cat_kernel(r0_ref, rrel_ref, x_hbm, bank_ref, out_ref,
                           inj_ref, xbuf, sems, *, nc, Kp, P, RG, wr, B,
                           n_groups, precision):
    """Rect kernel body with fused-EQ dual emission.

    Same DMA pipeline as _class_rect_kernel; the banks are the G @ w_cat
    composition (width P + DPAD), and each class's (Kp, P+DPAD) matmul
    result splits into out_ref[0, :, j, :] = acc[:, :P] (y0 frames) and
    inj_ref[0, :, j*DPAD:(j+1)*DPAD] = acc[:, P:] (packed inj) — static
    lane moves inside VMEM, never a downstream XLA slice.
    """
    t = pl.program_id(0)
    b = pl.program_id(1)
    step = t * B + b
    slot = jax.lax.rem(step, 2)

    def dma_main(t_i, b_i, slot_i):
        return pltpu.make_async_copy(
            x_hbm.at[b_i, pl.ds(r0_ref[t_i], RG), 0:Kp, :],
            xbuf.at[slot_i, 0:RG],
            sems.at[slot_i, 0],
        )

    def dma_wrap(b_i, slot_i):
        return pltpu.make_async_copy(
            x_hbm.at[b_i, 0:wr, 1 : Kp + 1, :],
            xbuf.at[slot_i, RG : RG + wr],
            sems.at[slot_i, 1],
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
        t_n = jnp.where(last_b, t + 1, t)
        b_n = jnp.where(last_b, 0, b + 1)
        start_all(t_n, b_n, 1 - slot)

    # (Round-5 measured dead end: splitting the WHOLE rectangle to bf16
    # hi/lo once per step — via VMEM scratch refs, since value-side slab
    # gathers don't lower — saved ~40% of the cast work but measured
    # 167.9 vs 165.1 us/signal src+eq: the up-front split serializes
    # against the matmuls, where the per-slab casts pipeline with them.)
    for j in range(CLASS_GROUP):
        rho = t * CLASS_GROUP + j
        acc = None
        for c in range(nc):
            sl = xbuf[slot, rrel_ref[c, rho]]         # (Kp, 128)
            if precision == "fast":
                fh = sl.astype(jnp.bfloat16)
                fl = (sl - fh.astype(jnp.float32)).astype(jnp.bfloat16)
                gh = bank_ref[0, j, 0, c * 128 : (c + 1) * 128, :]
                gl = bank_ref[0, j, 1, c * 128 : (c + 1) * 128, :]
                term = jnp.dot(fh, gh, preferred_element_type=jnp.float32)
                term += jnp.dot(fl, gh, preferred_element_type=jnp.float32)
                term += jnp.dot(fh, gl, preferred_element_type=jnp.float32)
            else:
                term = jnp.dot(
                    sl, bank_ref[0, j, c * 128 : (c + 1) * 128, :],
                    preferred_element_type=jnp.float32, precision=precision,
                )
            acc = term if acc is None else acc + term
        out_ref[0, :, j, :] = acc[:, :P]
        inj_ref[0, :, j * DPAD : (j + 1) * DPAD] = acc[:, P : P + DPAD]


def _class_rect_cat_kernel_split(r0_ref, rrel_ref, x_hbm, xw_hbm, bank_ref,
                                 out_ref, inj_ref, xbuf, sems, *, nc, Kp, P,
                                 RG, wr, B, n_groups):
    """Cat kernel body on PRE-SPLIT bf16 staging — pure DMA + MXU.

    The in-kernel hi/lo casts of _class_rect_cat_kernel are VPU work that
    sits on the MXU's critical path (and each staged row is re-cast ~1.85x
    across the classes that share it).  Here the STAGING pass emits the
    split instead — xv[..., 0:128] = bf16 hi (low-16-mantissa truncation),
    xv[..., 128:256] = bf16 lo, same total bytes as the f32 staging — so
    the kernel reads 128-aligned lane halves of each slab and goes straight
    to the three bf16 matmuls.  The wrap rows arrive as their own tiny
    staged tensor ``xw_hbm`` (= xv[:, :wr, 1:Kp+1]): 16-bit tiled HBM
    arrays reject the f32 kernel's J-offset-1 wrap slice (Mosaic cannot
    prove sublane-tile divisibility for packed dtypes), and the wr*Kp-chunk
    copy is noise in the staging pass.  Only meaningful for
    precision='fast'.
    """
    t = pl.program_id(0)
    b = pl.program_id(1)
    step = t * B + b
    slot = jax.lax.rem(step, 2)

    def dma_main(t_i, b_i, slot_i):
        return pltpu.make_async_copy(
            x_hbm.at[b_i, pl.ds(r0_ref[t_i], RG), 0:Kp, :],
            xbuf.at[slot_i, 0:RG],
            sems.at[slot_i, 0],
        )

    def dma_wrap(b_i, slot_i):
        return pltpu.make_async_copy(
            xw_hbm.at[b_i, 0:wr, :, :],
            xbuf.at[slot_i, RG : RG + wr],
            sems.at[slot_i, 1],
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
        t_n = jnp.where(last_b, t + 1, t)
        b_n = jnp.where(last_b, 0, b + 1)
        start_all(t_n, b_n, 1 - slot)

    for j in range(CLASS_GROUP):
        rho = t * CLASS_GROUP + j
        acc = None
        for c in range(nc):
            pair = xbuf[slot, rrel_ref[c, rho]]       # (Kp, 256) bf16
            fh = pair[:, 0:128]
            fl = pair[:, 128:256]
            gh = bank_ref[0, j, 0, c * 128 : (c + 1) * 128, :]
            gl = bank_ref[0, j, 1, c * 128 : (c + 1) * 128, :]
            term = jnp.dot(fh, gh, preferred_element_type=jnp.float32)
            term += jnp.dot(fl, gh, preferred_element_type=jnp.float32)
            term += jnp.dot(fh, gl, preferred_element_type=jnp.float32)
            acc = term if acc is None else acc + term
        out_ref[0, :, j, :] = acc[:, :P]
        inj_ref[0, :, j * DPAD : (j + 1) * DPAD] = acc[:, P : P + DPAD]


def split_bf16_pair(xp: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Exact-ish bf16 (hi, lo) split that survives XLA simplification.

    The naive round-trip form (x - hi.astype(f32)) is algebraically
    simplified by TPU XLA into an effectively-zero low half (STATUS r5, a
    measured 56.6 dB regression); truncating the low 16 mantissa bits via
    bitcast+mask produces an hi exactly representable in bf16 that no
    simplifier pattern folds, and the residual subtraction stays real.
    """
    u = jax.lax.bitcast_convert_type(xp, jnp.uint32)
    hi_f32 = jax.lax.bitcast_convert_type(
        u & jnp.uint32(0xFFFF0000), jnp.float32
    )
    return hi_f32.astype(jnp.bfloat16), (xp - hi_f32).astype(jnp.bfloat16)


def cat_bank_row_index(plan: PolyphasePlan, w0: int = 0) -> np.ndarray:
    """(128, nc*128) int32: row r of class rho's bank = G2_ext[idx[rho, r]]
    (index W selects the zero guard row) — the device-side bank builder's
    gather table (ops/eq_dynamic.build_cat_banks_dyn rebuilds the banks
    from TRACED dynamic-EQ weights with one row-gather per gain change).
    """
    nc, _, _, _, o = _class_geometry(plan.s, plan.W, w0)
    q = np.arange(nc * 128)[None, :]
    rel = q - o[:, None]
    return np.where(
        (rel >= 0) & (rel < plan.W), rel, plan.W
    ).astype(np.int32)


def polyphase_fir_class_rect_cat(
    x: jnp.ndarray,
    plan: PolyphasePlan,
    n_out: int,
    w_cat: np.ndarray | None,
    *,
    banks: jnp.ndarray | None = None,
    precision=jax.lax.Precision.HIGHEST,
    interpret: bool = False,
    num_frames: int | None = None,
    pad_left: int | None = None,
    staged_split: bool | None = None,
):
    """Rect FIR kernel with the EQ's weight-concat matmul folded in.

    ``w_cat`` = [group_fir^T | group_in] (P, P+d) float64 — see
    ops/eq.eq_cat_weights.  Returns
      * y0 frames (..., F_pad, P): frames @ group_fir^T (the EQ's
        zero-state within-group response) — same padded frame grid as
        polyphase_fir_class_rect_frames(pad_frames=True);
      * inj packed (..., Kp, 128*DPAD): inj[..., k, rho*DPAD + dd] is the
        state injection of frame 128k+rho (dd < d; the DPAD tail is zero).
    ops/eq.equalize_frames_cat consumes the pair with zero slicing.
    Raw-frames identity: y0|inj = (x_win @ G) @ w_cat composed in float64
    per bank column, quantized once (measures ~2 dB ABOVE the two-stage
    path's SNR).  Workload: /root/reference/modules/dsp_core.py:166 +
    216-254 first matmul.

    ``banks``: optional TRACED pre-rotated bank stack ((128, 2, nc*128,
    P+DPAD) bf16 pair in fast mode, (128, nc*128, P+DPAD) f32 otherwise),
    replacing the host-composed w_cat banks — the dynamic-gains serving
    path rebuilds them on device per gain change
    (ops/eq_dynamic.build_cat_banks_dyn).
    """
    if w_cat is not None:
        w_cat = np.ascontiguousarray(w_cat, dtype=np.float64)
    elif banks is None:
        raise ValueError("pass w_cat (host fold) or banks (traced)")
    if staged_split is None:
        # Measured OFF (round 5, 60 s serving config, batch-8): src+eq
        # 198.3 vs 165.1 us/signal.  The kernel itself is UNCHANGED
        # (580.6 vs 583.1 us batch-8) — the in-kernel hi/lo casts pipeline
        # behind the matmuls and cost ~nothing — while the staging side
        # fissions: XLA splits the 5-D stack+transpose into an extra
        # full-size pass (fusion.4 263 + copy.12 157 us vs the f32
        # staging's 269 us total).  Kept selectable for study; the kernel
        # floor is the MXU pad + ~75%-efficient DMA overlap, not VPU.
        staged_split = False
    if staged_split and precision != "fast":
        raise ValueError("staged_split only composes with precision='fast'")
    s, P, W = plan.s, plan.P, plan.W
    if s < 8:
        raise ValueError("class kernels target the wide-stride regime s>=8")
    if W > 128 * s:
        raise ValueError(f"frame width {W} exceeds one super-group {128*s}")
    if x.ndim == 1:
        y0, inj = polyphase_fir_class_rect_cat(
            x[None], plan, n_out, w_cat, banks=banks, precision=precision,
            interpret=interpret, num_frames=num_frames, pad_left=pad_left,
            staged_split=staged_split,
        )
        return y0[0], inj[0]
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
    Vp = P + DPAD

    nc, r0c, rrel2, RG, wr = _class_rect_geometry(s, W, w0)
    J0 = Kp + 1
    total = 128 * s * J0
    pad_right = total - pad_left - n
    if pad_right < 0:
        x = x[..., : n + pad_right]
        pad_right = 0
    xp = jnp.pad(x.astype(jnp.float32), ((0, 0), (pad_left, pad_right)))
    if staged_split:
        # (B, s, J0, 256) bf16: lanes [0:128] hi, [128:256] lo — the hi/lo
        # split rides the (bandwidth-bound) staging pass at the same byte
        # count, and the kernel body is pure DMA + MXU.
        xh, xl = split_bf16_pair(xp)
        xs = jnp.stack([xh, xl], axis=1)                 # (B, 2, total)
        xv = (
            xs.reshape(B, 2, J0, s, 128)
            .transpose(0, 3, 2, 1, 4)
            .reshape(B, s, J0, 256)
        )
        # Wrap rows (virtual rows r >= s alias (r - s, j + 1)) as their own
        # tensor at J-offset ZERO — see _class_rect_cat_kernel_split.
        nwr = max(wr, 1)
        xw = xv[:, :nwr, 1 : Kp + 1, :]
    else:
        xv = xp.reshape(B, J0, s, 128).transpose(0, 2, 1, 3)  # (B,s,J0,128)

    CG = CLASS_GROUP
    n_groups = NUM_CLASSES // CG
    if precision == "fast":
        if banks is None:
            banks = jnp.asarray(
                _class_banks_cat(plan, w0, w_cat, split=True)
            )
        elif banks.shape != (NUM_CLASSES, 2, nc * 128, Vp):
            raise ValueError(
                f"traced banks shape {banks.shape} != "
                f"{(NUM_CLASSES, 2, nc * 128, Vp)}"
            )
        banks = banks.reshape(n_groups, CG, 2, nc * 128, Vp)
        bank_spec = pl.BlockSpec(
            (1, CG, 2, nc * 128, Vp), lambda t, b, r_, rr_: (t, 0, 0, 0, 0),
            memory_space=pltpu.VMEM,
        )
    else:
        if banks is None:
            banks = jnp.asarray(
                _class_banks_cat(plan, w0, w_cat, split=False)
            )
        elif banks.shape != (NUM_CLASSES, nc * 128, Vp):
            raise ValueError(
                f"traced banks shape {banks.shape} != "
                f"{(NUM_CLASSES, nc * 128, Vp)}"
            )
        banks = banks.reshape(n_groups, CG, nc * 128, Vp)
        bank_spec = pl.BlockSpec(
            (1, CG, nc * 128, Vp), lambda t, b, r_, rr_: (t, 0, 0, 0),
            memory_space=pltpu.VMEM,
        )

    if staged_split:
        kern = functools.partial(
            _class_rect_cat_kernel_split, nc=nc, Kp=Kp, P=P, RG=RG, wr=wr,
            B=B, n_groups=n_groups,
        )
        xbuf_shape = pltpu.VMEM(
            (2, RG + max(wr, 1), Kp, 256), jnp.bfloat16
        )
    else:
        kern = functools.partial(
            _class_rect_cat_kernel, nc=nc, Kp=Kp, P=P, RG=RG, wr=wr, B=B,
            n_groups=n_groups, precision=precision,
        )
        xbuf_shape = pltpu.VMEM((2, RG + max(wr, 1), Kp, 128), jnp.float32)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_groups, B),
        in_specs=(
            [pl.BlockSpec(memory_space=pltpu.ANY)] * (2 if staged_split else 1)
            + [bank_spec]
        ),
        out_specs=[
            pl.BlockSpec(
                (1, Kp, CG, P), lambda t, b, r_, rr_: (b, 0, t, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, Kp, CG * DPAD), lambda t, b, r_, rr_: (b, 0, t),
                memory_space=pltpu.VMEM,
            ),
        ],
        scratch_shapes=[
            xbuf_shape,
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
    )
    params = {}
    if not interpret:
        params["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=28 * 1024 * 1024,
        )
    operands = (
        (xv, xw, banks) if staged_split else (xv, banks)
    )
    out4, inj3 = pl.pallas_call(
        kern,
        out_shape=[
            jax.ShapeDtypeStruct((B, Kp, NUM_CLASSES, P), jnp.float32),
            jax.ShapeDtypeStruct((B, Kp, NUM_CLASSES * DPAD), jnp.float32),
        ],
        grid_spec=grid_spec,
        interpret=interpret,
        **params,
    )(jnp.asarray(r0c), jnp.asarray(rrel2), *operands)

    y0 = out4.reshape(lead + (Kp * NUM_CLASSES, P))
    inj = inj3.reshape(lead + (Kp, NUM_CLASSES * DPAD))
    return y0, inj


def polyphase_fir_class_rect_frames(
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
    """Class-major polyphase FIR with rectangle manual-DMA input staging.

    Same contract and frame semantics as polyphase_fir_class_frames (same
    pre-rotated banks, same output layout); differs only in how the staged
    input reaches VMEM (see the section comment).  Requires s >= 8.
    """
    s, P, W = plan.s, plan.P, plan.W
    if s < 8:
        raise ValueError("class kernels target the wide-stride regime s>=8")
    if W > 128 * s:
        raise ValueError(f"frame width {W} exceeds one super-group {128*s}")
    if x.ndim == 1:
        return polyphase_fir_class_rect_frames(
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
    # EXACTLY the BlockSpec kernel's staging (pad + one transpose), with
    # J0 = Kp + 1 columns so the wrap DMA can read J-offset 1 (virtual
    # rows r >= s alias (r - s, j + 1); no extra staging buffer).
    J0 = Kp + 1
    total = 128 * s * J0
    pad_right = total - pad_left - n
    if pad_right < 0:
        x = x[..., : n + pad_right]
        pad_right = 0
    xp = jnp.pad(x.astype(jnp.float32), ((0, 0), (pad_left, pad_right)))
    xv = xp.reshape(B, J0, s, 128).transpose(0, 2, 1, 3)  # (B, s, J0, 128)

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
        _class_rect_kernel, nc=nc, Kp=Kp, P=P, RG=RG, wr=wr, B=B,
        n_groups=n_groups, precision=precision,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_groups, B),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),       # xv stays in HBM
            bank_spec,
        ],
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
        # Scratch + banks + output blocks exceed the compiler's default
        # 16 MB scoped budget at larger CLASS_GROUPs; the cap is just an
        # allowance (physical VMEM accommodates it).
        params["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=28 * 1024 * 1024,
        )
    out4 = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((B, Kp, NUM_CLASSES, P), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
        **params,
    )(jnp.asarray(r0c), jnp.asarray(rrel2), xv, banks)

    frames = out4.reshape(B, Kp * NUM_CLASSES, P)
    if pad_frames:
        return frames.reshape(lead + (Kp * NUM_CLASSES, P))
    return frames[:, :num_frames].reshape(lead + (num_frames, P))


def polyphase_fir_class_frames(
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
    """Resample (..., N) -> frames (..., ceil(n_out/P), P).

    Drop-in twin of kernels/fir_shear.polyphase_fir_shear_frames (same
    frame-major contract: frames.reshape(..., -1)[..., :n_out] equals
    ops/src.resample's flat output), same ``pad_frames`` / ``num_frames`` /
    ``pad_left`` extensions for the sharded caller.  Requires s >= 8.

    With ``pad_frames=True`` the frame count is ceil(F/128)*128 rounded up
    to a multiple of 1024 — tail frames hold convolution of zero padding.
    """
    s, P, W = plan.s, plan.P, plan.W
    if s < 8:
        raise ValueError("class kernel targets the wide-stride regime s>=8")
    if W > 128 * s:
        raise ValueError(f"frame width {W} exceeds one super-group {128*s}")
    if x.ndim == 1:
        return polyphase_fir_class_frames(
            x[None], plan, n_out, precision=precision, interpret=interpret,
            pad_frames=pad_frames, num_frames=num_frames, pad_left=pad_left,
        )[0]
    lead = x.shape[:-1]
    B = int(np.prod(lead))
    x = x.reshape(B, x.shape[-1])

    # Same contract as the shear kernel: frame 0's window starts at padded
    # index 0; ``pad_left`` is the zero extension making that true (default
    # -lo), or 0 for halo-extended shard inputs.
    if pad_left is None:
        pad_left = max(0, -plan.lo)
    if pad_left < 0:  # window start lies inside x: drop the lead instead
        x = x[..., -pad_left:]
        pad_left = 0
    w0 = 0
    n = x.shape[-1]

    if num_frames is None:
        num_frames = -(-n_out // P)
    Kp = 8 * -(-(-(-num_frames // NUM_CLASSES)) // 8)  # supers, multiple of 8

    nc, m_tab, d_tab, dmax, _ = _class_geometry(s, W, w0)
    J = Kp + dmax + 1  # staged supers (last window may poke into super Kp+dmax)

    total = 128 * s * J
    pad_right = total - pad_left - n
    if pad_right < 0:
        # Input longer than the frames need (halo-extended shards): crop.
        x = x[..., : n + pad_right]
        pad_right = 0
    xp = jnp.pad(x.astype(jnp.float32), ((0, 0), (pad_left, pad_right)))
    # (B, J, s, 128) -> transpose -> (B, s, J, 128): one relayout pass that
    # makes every class's rows a contiguous BlockSpec slab.
    xT = xp.reshape(B, J, s, 128).transpose(0, 2, 1, 3)

    CG = CLASS_GROUP
    n_groups = NUM_CLASSES // CG
    if precision == "fast":
        banks = jnp.asarray(_class_banks_split(plan, w0))
        banks = banks.reshape(n_groups, CG, 2, nc * 128, P)
        bank_spec = pl.BlockSpec(
            (1, CG, 2, nc * 128, P), lambda t, b, m, d: (t, 0, 0, 0, 0),
            memory_space=pltpu.VMEM,
        )
    else:
        banks = jnp.asarray(_class_banks(plan, w0))
        banks = banks.reshape(n_groups, CG, nc * 128, P)
        bank_spec = pl.BlockSpec(
            (1, CG, nc * 128, P), lambda t, b, m, d: (t, 0, 0, 0),
            memory_space=pltpu.VMEM,
        )

    def x_spec(c, j):
        return pl.BlockSpec(
            (1, 1, J, 128),
            lambda t, b, m, d, c=c, j=j: (b, m[c, t * CG + j], 0, 0),
            memory_space=pltpu.VMEM,
        )

    kern = functools.partial(
        _class_kernel, nc=nc, Kp=Kp, P=P, precision=precision,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_groups, B),
        in_specs=[x_spec(c, j) for c in range(nc) for j in range(CG)]
        + [bank_spec],
        out_specs=pl.BlockSpec(
            (1, Kp, CG, P), lambda t, b, m, d: (b, 0, t, 0),
            memory_space=pltpu.VMEM,
        ),
    )
    out4 = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((B, Kp, NUM_CLASSES, P), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(jnp.asarray(m_tab), jnp.asarray(d_tab), *([xT] * (nc * CG)), banks)

    frames = out4.reshape(B, Kp * NUM_CLASSES, P)
    if pad_frames:
        return frames.reshape(lead + (Kp * NUM_CLASSES, P))
    return frames[:, :num_frames].reshape(lead + (num_frames, P))
