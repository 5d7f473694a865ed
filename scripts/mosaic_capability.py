"""Probe which relayout ops Mosaic lowers on this toolchain.

Compile-only (AOT) — no data upload, each probe is a tiny Pallas kernel
taken through ``jax.jit(f).lower(x).compile()`` on the attached TPU
backend.  Interpret-mode tests can NOT catch Mosaic lowering failures
(they run the kernel as plain JAX on CPU), so when a kernel uses any
reshape/transpose/scatter inside the kernel body, probe it here first.

Findings on v5e (2026-08, libtpu in this image) — the rule:
  * only 128-lane-wide chunks move across the sublane/lane boundary:
    reshape (R*k, 128) <-> (R, k*128) lowers; (64, 12) -> (1, 768),
    (64, 16) -> (8, 128) and other non-lane-width merges do NOT
    ("infer-vector-layout: unsupported shape cast");
  * arbitrary 2D transposes lower (incl. non-square, e.g. (128, 16));
  * jnp.pad / jnp.roll / concatenate along lanes lower;
  * jnp .at[].add on a VALUE lowers to scatter-add — NOT implemented;
    accumulate into the output ref with static aligned slices instead
    (kernels/fir_class.py:_class_kernel_flat).

These constraints killed the one-sweep EQ kernel
(kernels/experiments/iir_seq.py) and shaped the flat class-FIR emission.

Run: PYTHONPATH=. python scripts/mosaic_capability.py   (needs the TPU
backend; each probe compiles in a few seconds).
"""
from __future__ import annotations

import sys

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def probe(name, kern, in_shape, out_shape):
    def f(x):
        return pl.pallas_call(
            kern, out_shape=jax.ShapeDtypeStruct(out_shape, jnp.float32)
        )(x)

    x = jnp.zeros(in_shape, jnp.float32)
    try:
        jax.jit(f).lower(x).compile()
        print(f"OK    {name}")
    except Exception as e:  # noqa: BLE001 — report and continue probing
        msg = str(e).replace("\n", " ")
        for key in ("unsupported", "Unimplemented", "NotImplemented"):
            if key in msg:
                i = msg.index(key)
                msg = msg[i : i + 90]
                break
        print(f"FAIL  {name}: {msg[:140]}")
    sys.stdout.flush()


def set_(x, o):
    o[...] = x[...]


def main():
    R = lambda shp: (lambda x, o: o.__setitem__((...,), x[...].reshape(shp)))
    T = lambda x, o: o.__setitem__((...,), x[...].T)

    # lane-width merges/splits: supported
    probe("reshape (12,128)->(1,1536)", R((1, 1536)), (12, 128), (1, 1536))
    probe("reshape (1,1536)->(12,128)", R((12, 128)), (1, 1536), (12, 128))
    probe("reshape (64,128)->(1,8192)", R((1, 8192)), (64, 128), (1, 8192))
    probe("reshape (2048,128)->(32,8192)", R((32, 8192)),
          (2048, 128), (32, 8192))
    # non-lane-width merges: unsupported
    probe("reshape (64,12)->(1,768)", R((1, 768)), (64, 12), (1, 768))
    probe("reshape (64,16)->(8,128)", R((8, 128)), (64, 16), (8, 128))
    probe("reshape (2048,16)->(256,128)", R((256, 128)),
          (2048, 16), (256, 128))
    # transposes: supported, incl. non-square
    probe("transpose (128,128)", T, (128, 128), (128, 128))
    probe("transpose (128,16)", T, (128, 16), (16, 128))
    probe("transpose (64,12)", T, (64, 12), (12, 64))
    probe("transpose (64,128)", T, (64, 128), (128, 64))
    # misc vector ops: supported
    probe("lane concat 64+64",
          lambda x, o: o.__setitem__(
              (...,), jnp.concatenate([x[:, 64:], x[:, :64]], axis=1)),
          (8, 128), (8, 128))
    probe("jnp.pad lanes (1,1536)",
          lambda x, o: o.__setitem__(
              (...,), jnp.pad(x[...][:, :1408], ((0, 0), (128, 0)))),
          (1, 1536), (1, 1536))
    probe("jnp.roll lanes",
          lambda x, o: o.__setitem__((...,), jnp.roll(x[...], 128, axis=1)),
          (1, 1536), (1, 1536))
    # value .at[].add -> scatter-add: unsupported
    def k_scatter(x, o):
        buf = jnp.zeros((8, 128), jnp.float32)
        buf = buf.at[:, 0:128].add(x[...])
        o[...] = buf
    probe("value .at[].add (scatter-add)", k_scatter, (8, 128), (8, 128))


if __name__ == "__main__":
    main()
