"""On-chip layout probe: does the (..., 160)-minor frames layout pay a
256-lane pad tax on HBM bandwidth, and would a flat/quad finish beat the
frames finish?

Five tiny programs on the 60 s serving shapes (B=8, Kp=144, F=18432):
  rw160   read+write (8,144,128,160)  — frames-shaped elementwise pass
  rwflat  read+write (8,144,20480)    — flat-dense equivalent bytes
  rw256   read+write (8,144,128,256)  — explicitly padded control
  fin160  frames finish replica: clip(y0 + s_true @ gOut), gOut (10,160)
  finquad quad finish replica:   clip(y04 + s_quad @ Wq),  Wq (40,640)
          (4 frames x 160 = 5 x 128 lanes -> everything lane-aligned)

Motivation: STATUS r5 fusion.1 sits at 42.3 us vs a ~29 us dense floor;
if rw160 ~ rw256 >> rwflat, the gap is the padded tiled layout and a flat
cat kernel emission (kernels/fir_class) removes it end to end.
"""
from __future__ import annotations

import sys

import numpy as np

sys.path.insert(0, ".")

from dsp_audio_project_tpu.utils.compcache import enable as _cc

_cc()

import jax
import jax.numpy as jnp

from dsp_audio_project_tpu.utils.deviceprof import profile_device_ops

B, K, G, U, d = 8, 144, 128, 160, 10
QF, QW = G // 4, 4 * U  # 32 quads x 640 lanes


def bw(name, ms, mb):
    print(f"{name:8s} {ms*1e3:8.1f} us  {mb:7.1f} MB  "
          f"{mb/1e3/(ms/1e3):7.0f} GB/s")


def run(name, fn, *args, mb):
    f = jax.jit(fn)
    jax.tree_util.tree_map(np.asarray, f(*args))  # compile+warm
    ms, ops = profile_device_ops(f, *args)
    bw(name, ms, mb)
    for op, t in ops[:4]:
        print(f"         {op:40s} {t*1e3:8.1f} us", file=sys.stderr)
    return ms


def main():
    rng = np.random.default_rng(0)
    y160 = jnp.asarray(rng.standard_normal((B, K, G, U)).astype(np.float32))
    yflat = jnp.asarray(
        rng.standard_normal((B, K, G * U)).astype(np.float32))
    y256 = jnp.asarray(
        rng.standard_normal((B, K, G, 256)).astype(np.float32))
    y4 = jnp.asarray(
        rng.standard_normal((B, K, QF, QW)).astype(np.float32))
    s160 = jnp.asarray(rng.standard_normal((B, K, G, d)).astype(np.float32))
    s4 = jnp.asarray(rng.standard_normal((B, K, QF, 4 * d)).astype(np.float32))
    gOut = jnp.asarray(rng.standard_normal((d, U)).astype(np.float32))
    Wq = np.zeros((4 * d, QW), np.float32)
    g_np = np.asarray(gOut)
    for q in range(4):
        Wq[q * d:(q + 1) * d, q * U:(q + 1) * U] = g_np
    Wq = jnp.asarray(Wq)
    jax.block_until_ready((y160, yflat, y256, y4, s160, s4, gOut, Wq))

    mb160 = 2 * B * K * G * U * 4 / 1e6        # true bytes r+w
    mb256 = 2 * B * K * G * 256 * 4 / 1e6

    run("rw160", lambda y: y * 1.0001 + 0.5, y160, mb=mb160)
    run("rwflat", lambda y: y * 1.0001 + 0.5, yflat, mb=mb160)
    run("rw256", lambda y: y * 1.0001 + 0.5, y256, mb=mb256)

    def fin160(y0, s):
        return jnp.clip(
            y0 + jnp.einsum("bkgd,du->bkgu", s, gOut,
                            preferred_element_type=jnp.float32), -1.0, 1.0)

    def finquad(y0, s):
        return jnp.clip(
            y0 + jnp.einsum("bkqx,xv->bkqv", s, Wq,
                            preferred_element_type=jnp.float32), -1.0, 1.0)

    run("fin160", fin160, y160, s160, mb=mb160)
    run("finquad", finquad, y4, s4, mb=mb160)


if __name__ == "__main__":
    main()
