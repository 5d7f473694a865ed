"""MXU issue-overhead probe for the cat kernel's matmul shape.

The rect cat kernel runs 72 matmuls of (144,128)@(128,256) bf16 per grid
step (24 slab/term pairs x 3 column blocks); its measured 583 us batch-8
sits ~143 us above the 440 us MXU MAC floor (43.5 GMAC at v5e bf16 peak)
= ~1.1 us/step of non-MAC time.  Hypothesis: per-matmul issue overhead.

Two VMEM-resident kernels with IDENTICAL MAC counts over a 128-step grid:
  narrow: 72 x (144,128)@(128,256)   (production shape)
  wide:   24 x (144,384)@(384,256)   (3 column blocks contracted at once)
If wide ~= narrow, issue overhead is negligible and the kernel is at its
floor; if wide wins big, a contiguous-contraction restructure (virtual-row
lane-major scratch) is worth building.
"""
from __future__ import annotations

import functools
import sys

import numpy as np

sys.path.insert(0, ".")

from dsp_audio_project_tpu.utils.compcache import enable as _cc

_cc()

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from dsp_audio_project_tpu.utils.deviceprof import profile_device_ops

KP, CK, VP, STEPS, REP = 144, 384, 256, 128, 24


def kern(lhs_ref, bank_ref, out_ref, *, wide):
    # Distinct lhs per iteration — identical operands would let Mosaic CSE
    # the 24 dots into one (first probe revision measured an impossible
    # 849 TMAC/s).
    acc = None
    for i in range(REP):
        if wide:
            term = jnp.dot(lhs_ref[i], bank_ref[...],
                           preferred_element_type=jnp.float32)
        else:
            term = None
            for c in range(3):
                t = jnp.dot(lhs_ref[i][:, c * 128:(c + 1) * 128],
                            bank_ref[c * 128:(c + 1) * 128, :],
                            preferred_element_type=jnp.float32)
                term = t if term is None else term + t
        acc = term if acc is None else acc + term
    out_ref[0] = acc


def build(wide):
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(STEPS,),
        in_specs=[
            pl.BlockSpec((REP, KP, CK), lambda t: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((CK, VP), lambda t: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, KP, VP), lambda t: (t, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        functools.partial(kern, wide=wide),
        out_shape=jax.ShapeDtypeStruct((STEPS, KP, VP), jnp.float32),
        grid_spec=grid_spec,
    )


def main():
    rng = np.random.default_rng(0)
    lhs = jnp.asarray(rng.standard_normal((REP, KP, CK)), jnp.bfloat16)
    bank = jnp.asarray(rng.standard_normal((CK, VP)), jnp.bfloat16)
    jax.block_until_ready((lhs, bank))
    macs = STEPS * REP * KP * CK * VP
    for wide in (False, True):
        f = jax.jit(lambda a, b: jnp.sum(build(wide)(a, b)))
        float(f(lhs, bank))
        ms, _ = profile_device_ops(f, lhs, bank)
        print(f"wide={wide}: {ms*1e3:8.1f} us  "
              f"{macs/(ms/1e3)/1e12:6.1f} TMAC/s")


if __name__ == "__main__":
    main()
