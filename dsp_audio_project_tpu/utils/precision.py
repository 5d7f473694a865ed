"""Full-precision contraction helpers.

On TPU, jnp matmul/einsum default to bfloat16 MXU passes — an 8-bit mantissa
that silently caps the pipeline around ~25 dB SNR (measured; the 60 dB gate
needs true f32).  Every numerically-critical contraction in the framework
goes through these wrappers, which pin HIGHEST precision (f32 on v5e via
multi-pass MXU) and a float32 accumulator.  Throughput-critical kernels that
can tolerate bf16 opt in explicitly instead.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

_HIGHEST = jax.lax.Precision.HIGHEST


def einsum_f32(subscripts: str, *operands: jnp.ndarray) -> jnp.ndarray:
    return jnp.einsum(
        subscripts,
        *operands,
        precision=_HIGHEST,
        preferred_element_type=jnp.float32,
    )


def matmul_f32(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    return jnp.matmul(a, b, precision=_HIGHEST, preferred_element_type=jnp.float32)


def matvec_f32(m: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """(..., i, j) x (..., j) -> (..., i) at full precision."""
    return jnp.matmul(m, v[..., None], precision=_HIGHEST,
                      preferred_element_type=jnp.float32)[..., 0]


def vecmat_f32(v: jnp.ndarray, m: jnp.ndarray) -> jnp.ndarray:
    """(..., i) x (i, j) -> (..., j) at full precision."""
    return jnp.matmul(v, m, precision=_HIGHEST, preferred_element_type=jnp.float32)
