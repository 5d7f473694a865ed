"""Dynamic-gain EQ: band gains as TRACED values — no recompile per change.

The static path (ops/eq.py) treats gains as compile-time constants: best
numerics (host float64 design, Schur form) and best speed, but every new
gain vector costs a ~4 s compile.  Serving scenarios — the reference's UI
sliders, per-request EQ — need gain changes at zero compile cost.  This
module rebuilds the whole design pipeline *inside* the traced graph:

1.  **Analytic pole geometry.**  Computing poles from the quantized
    (a1, a2) cancels catastrophically in float32 (disc = a1^2 - 4a2 is a
    ~1e-4 difference of ~4-magnitude terms).  In closed form the peaking
    biquad's discriminant is

        disc = sin^2(w0) (1/A^2 - 4) / (1 + alpha/A)^2        (Q = 1)

    — a product of well-scaled factors, exact to relative eps.  Poles are
    complex for A > 1/2 (gain > -12.04 dB) and real below.

2.  **Per-band 2x2 realizations with benign quantization.**  Complex pair:
    the rotation (modal) block [[m, q], [-q, m]] stores Re/Im directly.
    Real pair: the quasi-triangular [[l1, 1], [0, l2]] block (the unit
    coupling keeps the input/output maps bounded as l1 -> l2, where a
    diagonal form's residues diverge).  Both branches of a lax.cond share
    shapes.

3.  **In-graph cascade composition** of the six always-active bands into
    one order-12 system (a band at 0 dB is exactly identity in exact
    arithmetic — b == a — so the reference's skip-small-gains rule costs
    only rounding here; see semantics note below).

4.  **In-graph block operators.**  The group tables (C A^u, A^{U-1-v} B,
    the group FIR Toeplitz, the within-block group Toeplitz) come from one
    associative cumulative product of U copies of A composed with cumulative
    products of A^U — log-depth everywhere; the data path itself is the same
    scan-free four-matmul structure as the static ops/eq path.

Semantics vs the reference: the static path reproduces the reference's
|gain| <= 0.1 dB band-skip and the all-flat bypass *exactly*; here a small
gain is applied as a (numerically ~1e-6) near-identity filter and the
output is always clipped.  Both differences are far below the 60 dB gate
(verified in tests/test_eq_dynamic.py).
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from ..config import EQConfig
from ..utils import df32
from ..utils.precision import einsum_f32, matmul_f32

_HI = jax.lax.Precision.HIGHEST


def _band_realization(w0: float, gain_db: jnp.ndarray):
    """One peaking biquad (Q=1) as (A 2x2, B 2, C 2, D), gain traced.

    All intermediate arithmetic runs in df32 (utils/df32): the pole geometry
    amplifies realization rounding by ~1/dist(pole, unit circle) (~350x for
    the 40 Hz band), so plain-f32 construction caps the whole dynamic path at
    ~70 dB SNR.  With compensated construction the only f32 rounding left is
    the final (A, B, C, D) store — measured ~108 dB vs the oracle.  w0 is
    static: sin/cos are exact host-side float64 split into df32 constants.
    """
    import numpy as np

    f32 = jnp.float32
    sin_w0 = df32.from_f64(np.sin(np.float64(w0)))
    cos_w0 = df32.from_f64(np.cos(np.float64(w0)))
    g = gain_db.astype(f32)
    # amp's own relative error only moves the pole radius by ~alpha*eps —
    # harmless — so the f32 exp seed is promoted as-is to df32.
    amp = df32.df(10.0 ** (g / 40.0))
    one = df32.df(1.0)
    alpha = df32.scale(sin_w0, 0.5)
    al_over = df32.div(alpha, amp)     # alpha / A
    al_times = df32.mul(alpha, amp)    # alpha * A
    a0 = df32.add(one, al_over)
    a1 = df32.div(df32.scale(cos_w0, -2.0), a0)
    a2 = df32.div(df32.sub(one, al_over), a0)
    b0 = df32.div(df32.add(one, al_times), a0)
    # b1 == a1 for the peaking EQ; numerator residual c(z) = c1 z + c0 with
    # c1 = b1 - b0 a1 = a1 (1 - b0), c0 = b2 - b0 a2.  1 - b0 in closed form
    # avoids cancellation: alpha (1/A - A) / a0.
    one_minus_b0 = df32.div(
        df32.mul(alpha, df32.sub(df32.div(one, amp), amp)), a0
    )
    c1 = df32.mul(a1, one_minus_b0)
    b2 = df32.div(df32.sub(one, al_times), a0)
    c0 = df32.sub(b2, df32.mul(b0, a2))

    m = df32.scale(a1, -0.5)
    # disc/4 in closed form: (sin w0)^2 (1/A^2 - 4) / (4 a0^2) — exact sign.
    disc4 = df32.div(
        df32.mul(
            df32.mul(sin_w0, sin_w0),
            df32.sub(df32.div(one, df32.mul(amp, amp)), df32.df(4.0)),
        ),
        df32.scale(df32.mul(a0, a0), 4.0),
    )
    is_complex = df32.to_f32(disc4) < 0.0
    neg_disc = jnp.signbit(disc4[0])
    abs_disc = (
        jnp.where(neg_disc, -disc4[0], disc4[0]),
        jnp.where(neg_disc, -disc4[1], disc4[1]),
    )
    root = df32.sqrt(abs_disc)

    def pack(a00, a01, a10, a11, b0v, b1v, c0v, c1v):
        """Stack df scalars into df (2x2), (2,), (2,) matrices."""
        A_hi = jnp.stack([jnp.stack([a00[0], a01[0]]),
                          jnp.stack([a10[0], a11[0]])])
        A_lo = jnp.stack([jnp.stack([a00[1], a01[1]]),
                          jnp.stack([a10[1], a11[1]])])
        B_hi = jnp.stack([b0v[0], b1v[0]])
        B_lo = jnp.stack([b0v[1], b1v[1]])
        C_hi = jnp.stack([c0v[0], c1v[0]])
        C_lo = jnp.stack([c0v[1], c1v[1]])
        return A_hi, A_lo, B_hi, B_lo, C_hi, C_lo

    zero = df32.df(0.0)
    one_c = df32.df(1.0)

    def complex_branch(_):
        # adj(zI-A) B with B=[1,0] is [z - m, -q]^T, so
        # C adj B = g1 z - g1 m - g2 q  =>  g1 = c1, g2 = -(c0 + c1 m)/q.
        num = df32.add(c0, df32.mul(c1, m))
        q_safe = (jnp.maximum(root[0], jnp.float32(1e-30)), root[1])
        g2 = df32.neg(df32.div(num, q_safe))
        return pack(m, root, df32.neg(root), m, one_c, zero, c1, g2)

    def real_branch(_):
        l1 = df32.add(m, root)
        l2 = df32.sub(m, root)
        # [[l1, 1], [0, l2]], B = [1, 1], C = [g_1, g_2]:
        #   g1 (z - l2) + g1 + g2 (z - l1) = (g1 + g2) z + (g1(1 - l2) - g2 l1)
        #   => g1 (1 - l2) - g2 l1 = c0 with g2 = c1 - g1
        #   => g1 (1 - l2 + l1) = c0 + c1 l1
        denom = df32.add(df32.sub(one, l2), l1)
        g1 = df32.div(df32.add(c0, df32.mul(c1, l1)), denom)
        g2 = df32.sub(c1, g1)
        return pack(l1, one_c, zero, l2, one_c, one_c, g1, g2)

    A_hi, A_lo, B_hi, B_lo, C_hi, C_lo = jax.lax.cond(
        is_complex, complex_branch, real_branch, None
    )
    return (A_hi, A_lo), (B_hi, B_lo), (C_hi, C_lo), b0


def _compose_cascade(bands):
    """Series composition of df32 (A, B, C, D) 2-state bands -> order-2n.

    Same convention as design.biquad: y = C s_prev + D x, s = A s_prev + Bx.
    All arithmetic compensated (df32): the block-operator algebra downstream
    assumes the tables are *consistent* views of one exact system — ~1e-6 of
    independent rounding noise per table entry gets amplified by the
    resonant state magnitudes into ~1e-4 output error (measured), which is
    what capped the dynamic path at ~73 dB before.
    """
    A_acc, B_acc, C_acc, D_acc = bands[0]
    for A2, B2, C2, D2 in bands[1:]:
        d1 = A_acc[0].shape[0]
        d2 = A2[0].shape[0]
        zeros = jnp.zeros((d1, d2), jnp.float32)
        BC = df32.outer(B2, C_acc)
        A_acc = tuple(
            jnp.concatenate(
                [
                    jnp.concatenate([A_acc[i], zeros], axis=1),
                    jnp.concatenate([BC[i], A2[i]], axis=1),
                ],
                axis=0,
            )
            for i in range(2)
        )
        B_tail = df32.mul(B2, (D_acc[0][None], D_acc[1][None]))
        B_acc = tuple(jnp.concatenate([B_acc[i], B_tail[i]]) for i in range(2))
        C_head = df32.mul(C_acc, (D2[0][None], D2[1][None]))
        C_acc = tuple(jnp.concatenate([C_head[i], C2[i]]) for i in range(2))
        D_acc = df32.mul(D_acc, D2)
    return A_acc, B_acc, C_acc, D_acc


def _cumulative_powers(A, count: int):
    """df32 [I, A, A^2, ..., A^{count-1}] via log-depth associative scan."""
    d = A[0].shape[0]
    hi = jnp.broadcast_to(A[0], (count - 1, d, d))
    lo = jnp.broadcast_to(A[1], (count - 1, d, d))

    def combine(x, y):
        return df32.mmul(y, x)

    ph, pl = jax.lax.associative_scan(combine, (hi, lo))  # A^1..A^{count-1}
    eye = jnp.eye(d, dtype=jnp.float32)[None]
    zeros = jnp.zeros((1, d, d), jnp.float32)
    return (
        jnp.concatenate([eye, ph], axis=0),
        jnp.concatenate([zeros, pl], axis=0),
    )


def _dynamic_operators(gains_db: jnp.ndarray, fs: int, cfg: EQConfig,
                       U: int, G: int):
    """In-graph (traced-gains) block operators for a (U, G) geometry.

    Returns (group_in (U,d), group_out (d,U), fir (U,U), toe (Gd,Gd),
    A_blk (d,d), pows_g (G,d,d)) — all f32-rounded views of one df32-exact
    system (see module docstring).
    """
    import numpy as np

    f32 = jnp.float32
    gains_db = jnp.asarray(gains_db, f32)
    # Reference band-skip semantics (dsp_core.py:234): |gain| <= 0.1 dB acts
    # as identity.  A zero gain IS the identity filter (b == a), so masking
    # reproduces the skip to float rounding.
    gains_db = jnp.where(
        jnp.abs(gains_db) > cfg.bypass_threshold_db, gains_db, 0.0
    )

    # Static per-band geometry (centers + Nyquist clamp are fs-dependent but
    # fs is static); gains are traced.
    centers = []
    ceiling = (fs / 2.0) * cfg.nyquist_safety
    for name, fc in cfg.band_centers:
        fc_eff = ceiling if fc >= ceiling else fc
        centers.append(fc_eff)
    w0s = [2.0 * np.pi * fc / fs for fc in centers]

    bands = [
        _band_realization(float(w0s[i]), gains_db[i])
        for i in range(len(w0s))
    ]
    # Entire operator construction in df32; only the final tables round to
    # f32, so they are f32-rounded views of ONE consistent exact system.
    A, Bv, Cv, D = _compose_cascade(bands)
    d = A[0].shape[0]
    f32 = jnp.float32

    pu = _cumulative_powers(A, U + 1)                # df (U+1, d, d)
    A_U_df = (pu[0][U], pu[1][U])
    pu_head = (pu[0][:U], pu[1][:U])
    C_b = (jnp.broadcast_to(Cv[0], (U, d)), jnp.broadcast_to(Cv[1], (U, d)))
    CA_u = df32.vecmat(C_b, pu_head)                 # df (U, d): C A^u
    group_out = df32.to_f32(CA_u).T                  # (d, U)
    pu_rev = (pu[0][U - 1::-1], pu[1][U - 1::-1])
    B_b = (jnp.broadcast_to(Bv[0], (U, d)), jnp.broadcast_to(Bv[1], (U, d)))
    group_in = df32.to_f32(df32.mvec(pu_rev, B_b))   # (U, d): A^{U-1-v} B
    # group FIR: T[u, v] = C A^{u-1-v} B (v < u), D on diagonal.
    seq = df32.to_f32(df32.dot(CA_u, B_b))           # (U,): C A^u B
    uu = jnp.arange(U)
    idx = uu[:, None] - 1 - uu[None, :]
    fir = jnp.where(idx >= 0, jnp.take(seq, jnp.clip(idx, 0, U - 1)), 0.0)
    fir = fir + df32.to_f32(D) * jnp.eye(U, dtype=f32)

    pg = _cumulative_powers(A_U_df, G + 1)           # df (G+1, d, d): (A^U)^g
    A_blk = pg[0][G] + pg[1][G]                      # A^block
    # (A^U)^g maps a block's true initial state onto group g's entry state
    # (the fused-state apply of ops/eq: s_true = s_in + A^{gU} sigma).
    pows_g = pg[0][:G] + pg[1][:G]                        # (G, d, d) f32

    # In-graph block Toeplitz (same scan-free structure as ops/eq): block
    # (v, r) holds ((A^U)^{r-v})^T; built by gathering the df-exact powers.
    pow_T = jnp.swapaxes(pows_g, -1, -2)                  # (G, d, d) f32
    rr = jnp.arange(G)
    diff = rr[None, :] - rr[:, None]                      # (v, r) -> r - v
    toe = jnp.where(
        (diff >= 0)[:, :, None, None],
        jnp.take(pow_T, jnp.clip(diff, 0, G - 1), axis=0),
        0.0,
    )                                                     # (G, G, d, d)
    toe = jnp.transpose(toe, (0, 2, 1, 3)).reshape(G * d, G * d)
    return group_in, group_out, fir, toe, A_blk, pows_g


def _dynamic_grouped(x_g: jnp.ndarray, ops, fast: bool = False) -> jnp.ndarray:
    """Scan-free data path on grouped input (..., K, G, U), traced operators.

    Returns the corrected (unclipped) output in grouped form.  ``fast``
    runs the output matmul at bf16x3 (see ops/eq._grouped_apply).
    """
    f32 = jnp.float32
    group_in, group_out, fir, toe, A_blk, pows_g = ops
    d = group_in.shape[-1]
    G = x_g.shape[-2]
    K = x_g.shape[-3]
    lead = x_g.shape[:-2]

    inj = einsum_f32("...gu,ud->...gd", x_g, group_in)    # (..., K, G, d)
    s_tail = einsum_f32(
        "...x,xy->...y", inj.reshape(lead + (G * d,)), toe
    ).reshape(lead + (G, d))                              # s_1..s_G
    e_states = s_tail[..., G - 1, :]
    s_in = jnp.concatenate(
        [jnp.zeros(lead + (1, d), f32), s_tail[..., : G - 1, :]], axis=-2
    )

    # carry scan over blocks
    k_axis = e_states.ndim - 2
    head = jnp.broadcast_to(
        jnp.eye(d, dtype=f32), e_states.shape[:-2] + (1, d, d)
    )
    tails = jnp.broadcast_to(A_blk, e_states.shape[:-2] + (K - 1, d, d))
    mats = jnp.concatenate([head, tails], axis=k_axis)
    zero0 = jnp.zeros(e_states.shape[:-2] + (1, d), f32)
    vecs = jnp.concatenate(
        [zero0, jax.lax.slice_in_dim(e_states, 0, K - 1, axis=k_axis)],
        axis=k_axis,
    )

    def combine(lhs, rhs):
        m1, v1 = lhs
        m2, v2 = rhs
        return (
            matmul_f32(m2, m1),
            jnp.matmul(m2, v1[..., None], precision=_HI,
                       preferred_element_type=f32)[..., 0] + v2,
        )

    _, sigma = jax.lax.associative_scan(combine, (mats, vecs), axis=k_axis)

    # Fused-state apply (see ops/eq._grouped_apply): the carry rides the
    # group_out matmul, and FIR + state readout share ONE concat matmul.
    s_true = s_in + einsum_f32("gef,...kf->...kge", pows_g, sigma)
    w_cat = jnp.concatenate([fir.T, group_out], axis=0)     # (U+d, U)
    xs = jnp.concatenate([x_g, s_true], axis=-1)            # (..., U+d)
    prec = jax.lax.Precision.HIGH if fast else jax.lax.Precision.HIGHEST
    return jnp.einsum(
        "...gu,uv->...gv", xs, w_cat, precision=prec,
        preferred_element_type=f32,
    )


@functools.partial(
    jax.jit, static_argnames=("fs", "cfg", "block", "unroll", "fast")
)
def equalize_dynamic(
    x: jnp.ndarray,
    gains_db: jnp.ndarray,
    fs: int,
    cfg: EQConfig = EQConfig(),
    block: int = 8192,
    unroll: int = 128,
    fast: bool = False,
) -> jnp.ndarray:
    """EQ with traced gains: one compile serves every gain vector.

    ``gains_db``: (n_bands,) float array, ordered like cfg.band_centers.
    Matches the static path / golden oracle to f32 rounding (tests gate
    110 dB); ``fast`` trades the output matmul to bf16x3 (~100 dB).
    """
    assert block % unroll == 0
    f32 = jnp.float32
    x = x.astype(f32)
    U, G = unroll, block // unroll
    ops = _dynamic_operators(gains_db, fs, cfg, U, G)

    n = x.shape[-1]
    K = -(-n // block)
    pad = K * block - n
    xb = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, pad)])
    x_g = xb.reshape(x.shape[:-1] + (K, G, U))
    y = _dynamic_grouped(x_g, ops, fast=fast)
    y = y.reshape(x.shape[:-1] + (K * block,))[..., :n]
    return jnp.clip(y, -1.0, 1.0)


@functools.partial(
    jax.jit, static_argnames=("fs", "cfg", "groups_per_block", "fast")
)
def equalize_dynamic_frames(
    frames: jnp.ndarray,
    gains_db: jnp.ndarray,
    fs: int,
    cfg: EQConfig = EQConfig(),
    groups_per_block: int = 128,
    fast: bool = False,
) -> jnp.ndarray:
    """Traced-gains EQ on frame-major input (..., F, P) -> frames, clipped.

    The serving fast path: combine with the shear FIR kernel
    (AudioPipeline.jit_forward_frames_dynamic) for per-request gain
    changes at zero compile cost AND zero device-side lane retiles.
    """
    f32 = jnp.float32
    P = frames.shape[-1]
    F = frames.shape[-2]
    G = groups_per_block
    lead = frames.shape[:-2]
    ops = _dynamic_operators(gains_db, fs, cfg, P, G)
    K = -(-F // G)
    pad = K * G - F
    x_g = jnp.pad(
        frames.astype(f32), [(0, 0)] * len(lead) + [(0, pad), (0, 0)]
    ).reshape(lead + (K, G, P))
    y = _dynamic_grouped(x_g, ops, fast=fast)
    y = y.reshape(lead + (K * G, P))[..., :F, :]
    return jnp.clip(y, -1.0, 1.0)
