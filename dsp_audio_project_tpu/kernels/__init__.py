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
        polyphase_fir_class_rect_frames, rect_supported,
    )
    from .fir_shear import polyphase_fir_shear_frames

    table = {
        "rect": polyphase_fir_class_rect_frames,
        "class": polyphase_fir_class_frames,
        "shear": polyphase_fir_shear_frames,
    }
    if kernel == "auto":
        kernel = (
            "rect" if rect_supported(plan)
            else "class" if class_supported(plan) else "shear"
        )
        # DSP_FIR_KERNEL overrides 'auto' routing for A/B debugging on
        # hardware.  Validate eagerly (a bad value would otherwise raise a
        # bare KeyError deep inside jit tracing) and ignore overrides the
        # plan's geometry cannot run — the fallback chain must stay intact.
        env = os.environ.get("DSP_FIR_KERNEL")
        if env is not None:
            if env not in table:
                raise ValueError(
                    f"DSP_FIR_KERNEL={env!r} is not one of "
                    f"{sorted(table)}"
                )
            if (env == "shear"
                    or (env == "class" and class_supported(plan))
                    or (env == "rect" and rect_supported(plan))):
                kernel = env
    if kernel not in table:
        raise ValueError(f"unknown FIR kernel {kernel!r}; expected "
                         f"'auto' or one of {sorted(table)}")
    fn = table[kernel]
    return fn(
        x, plan, n_out, precision=precision, interpret=interpret,
        pad_frames=pad_frames, num_frames=num_frames, pad_left=pad_left,
    )
