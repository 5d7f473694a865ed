"""Windowed-sinc FIR low-pass design (host-side, float64).

Behavioral contract from the reference designer (dsp_core.py:104-131):
odd tap count (linear phase), symmetric index range, normalized ``np.sinc``
with cutoff expressed relative to Nyquist, Blackman window, and unit DC gain
(sum of taps normalized to 1).  The SRC then scales the taps by L
(dsp_core.py:162) — that scaling lives in the SRC op, not here.
"""
from __future__ import annotations

import numpy as np


def lowpass_sinc(cutoff_norm: float, num_taps: int) -> np.ndarray:
    """Design a linear-phase windowed-sinc LPF.

    Args:
      cutoff_norm: cutoff relative to Nyquist (1.0 == fs/2), i.e. the filter
        passes |w| < cutoff_norm * pi rad/sample.
      num_taps: requested length; even values are bumped to the next odd
        (dsp_core.py:114) so the filter stays symmetric.

    Returns:
      float64 taps of odd length with sum(h) == 1 (unless the sinc sums to 0).
    """
    taps = int(num_taps)
    if taps % 2 == 0:
        taps += 1
    half = taps // 2
    n = np.arange(-half, half + 1, dtype=np.float64)
    h = np.sinc(cutoff_norm * n)
    h *= np.blackman(taps)
    s = h.sum()
    if s != 0.0:
        h /= s
    return h
