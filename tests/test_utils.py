"""Utility tier: precision wrappers, profiling helpers, mesh construction."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from dsp_audio_project_tpu.config import MeshConfig, SRCConfig
from dsp_audio_project_tpu.parallel.mesh import build_mesh, signal_sharding, single_device_mesh
from dsp_audio_project_tpu.utils.precision import (
    einsum_f32, matmul_f32, matvec_f32, vecmat_f32,
)


def test_precision_wrappers(rng):
    a = jnp.asarray(rng.standard_normal((5, 7)).astype(np.float32))
    b = jnp.asarray(rng.standard_normal((7, 3)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal(7).astype(np.float32))
    np.testing.assert_allclose(np.asarray(matmul_f32(a, b)),
                               np.asarray(a) @ np.asarray(b), atol=1e-5)
    np.testing.assert_allclose(np.asarray(vecmat_f32(v, b)),
                               np.asarray(v) @ np.asarray(b), atol=1e-5)
    m = jnp.asarray(rng.standard_normal((4, 7)).astype(np.float32))
    np.testing.assert_allclose(np.asarray(matvec_f32(m, v)),
                               np.asarray(m) @ np.asarray(v), atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(einsum_f32("ij,jk->ik", a, b)),
        np.asarray(a) @ np.asarray(b), atol=1e-5)


def test_df32_compensated_arithmetic(rng):
    """df32 ops must hold ~45+ bits under jit — i.e. XLA's reassociation of
    the error-free transforms is successfully blocked (utils/df32.py)."""
    from dsp_audio_project_tpu.utils import df32

    a64 = rng.uniform(0.5, 2.0, 64)
    b64 = rng.uniform(0.5, 2.0, 64)

    def split(x):
        hi = np.float32(x)
        return jnp.asarray(hi), jnp.asarray(np.float32(x - np.float64(hi)))

    @jax.jit
    def probe(ah, al, bh, bl):
        x, y = (ah, al), (bh, bl)
        return (df32.mul(x, y), df32.add(x, y), df32.sub(x, y),
                df32.div(x, y), df32.sqrt(x))

    m, s, d, q, r = probe(*split(a64), *split(b64))

    def relerr(v, truth):
        got = np.float64(np.asarray(v[0])) + np.float64(np.asarray(v[1]))
        return np.max(np.abs(got - truth) / np.abs(truth))

    assert relerr(m, a64 * b64) < 1e-12
    assert relerr(s, a64 + b64) < 1e-12
    assert relerr(d, a64 - b64) < 1e-10   # subtraction may cancel
    assert relerr(q, a64 / b64) < 1e-11
    assert relerr(r, np.sqrt(a64)) < 1e-12

    # the cancellation-amplification chain that broke before the barriers:
    # 1 + tiny must keep the tiny part to df precision.
    @jax.jit
    def chain(t_hi, t_lo):
        return df32.add(df32.df(1.0), (t_hi, t_lo))

    tiny = 2.849501721230871e-3
    got = chain(*split(np.float64(tiny)))
    err = abs(np.float64(got[0]) + np.float64(got[1]) - (1.0 + tiny))
    assert err < 1e-12

    # small dense linalg: df32 matmul of ill-scaled mats vs float64
    A = rng.uniform(-1, 1, (12, 12))
    B = rng.uniform(-1, 1, (12, 12))

    @jax.jit
    def pm(Ah, Al, Bh, Bl):
        return df32.mmul((Ah, Al), (Bh, Bl))

    Ph, Pl = pm(*split(A), *split(B))
    got = np.float64(np.asarray(Ph)) + np.float64(np.asarray(Pl))
    assert np.max(np.abs(got - A @ B)) < 1e-12


def test_mesh_construction():
    mesh = build_mesh(MeshConfig(channel_devices=2, block_devices=4))
    assert mesh.shape == {"channel": 2, "block": 4}
    sh = signal_sharding(mesh)
    assert sh.spec == ("channel", "block")
    m1 = single_device_mesh()
    assert m1.shape == {"channel": 1, "block": 1}


def test_mesh_too_many_devices():
    with pytest.raises(ValueError, match="devices"):
        build_mesh(MeshConfig(channel_devices=4, block_devices=4))


def test_stage_timer():
    from dsp_audio_project_tpu.utils.profiling import StageTimer

    t = StageTimer()
    with t.stage("a"):
        sum(range(1000))
    with t.stage("b"):
        pass
    assert set(t.timings_s) == {"a", "b"}
    assert "a:" in t.report()


def test_roofline_helper():
    from dsp_audio_project_tpu.utils import profiling

    frac = profiling.roofline_fraction(810_000_000, 1.0)
    if profiling.device_hbm_peak() is None:
        assert frac is None
    else:
        assert 0 < frac < 1.1


def test_src_config_validation():
    with pytest.raises(ValueError):
        SRCConfig(L=0, M=1)
    cfg = SRCConfig(L=160, M=147)
    assert cfg.num_taps == 6401
    assert cfg.output_rate(44100) == 48000
    assert cfg.output_length(44100) == 48000


def test_measure_helpers_run():
    from dsp_audio_project_tpu.utils.benchmarking import (
        measure, measure_differential,
    )

    f = jax.jit(lambda v: jnp.sum(v * 2))
    ins = [(jnp.asarray(np.full(64, i, np.float32)),) for i in range(8)]
    assert measure(f, ins[2:], warmup_inputs=ins[:2]) > 0
    assert measure_differential(f, ins) > 0
