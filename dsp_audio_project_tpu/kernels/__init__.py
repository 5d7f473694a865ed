"""Subpackage: kernels.

``fir_frames`` is the production entry point for frame-major polyphase
resampling: it routes to the fastest measured Pallas kernel for the plan's
geometry (class-major pre-rotated-bank kernel where supported, else the
in-VMEM shear kernel).  Callers that need a specific variant import it
directly.
"""
from __future__ import annotations

import jax


def fir_frames(x, plan, n_out, *, kernel: str = "auto",
               precision=jax.lax.Precision.HIGHEST, interpret: bool = False,
               pad_frames: bool = False, num_frames=None, pad_left=None):
    """Resample (..., N) -> frames (..., F, P) via the best Pallas kernel.

    kernel: 'auto' (fastest measured for this plan) | 'rect' | 'class' |
    'shear'.  Measured on TPU v5e (60 s 44.1k->48k signal, batch 8, bf16x3
    fast mode): rect kernel (group-rectangle manual-DMA input staging)
    72 us/signal vs class 86 us vs shear 209 us — 'auto' prefers rect
    (bitwise-identical outputs; same support envelope as class, s >= 8).
    """
    import os

    from .fir_class import (
        class_supported, polyphase_fir_class_frames,
        polyphase_fir_class_rect_frames,
    )
    from .fir_shear import polyphase_fir_shear_frames

    if kernel == "auto":
        # DSP_FIR_KERNEL overrides routing for A/B debugging on hardware.
        kernel = os.environ.get(
            "DSP_FIR_KERNEL", "rect" if class_supported(plan) else "shear"
        )
    fn = {
        "rect": polyphase_fir_class_rect_frames,
        "class": polyphase_fir_class_frames,
        "shear": polyphase_fir_shear_frames,
    }[kernel]
    return fn(
        x, plan, n_out, precision=precision, interpret=interpret,
        pad_frames=pad_frames, num_frames=num_frames, pad_left=pad_left,
    )
