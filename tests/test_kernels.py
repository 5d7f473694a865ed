"""Kernel tier: Pallas kernels vs jnp fallbacks vs golden oracle.

On CPU these run in Pallas interpret mode — same kernel code, Python
evaluation — which validates indexing/geometry; the TPU compile path is
exercised by bench.py and the verify flow on hardware.
"""
import numpy as np
import pytest
import jax.numpy as jnp

from dsp_audio_project_tpu import EQConfig, SRCConfig
from dsp_audio_project_tpu.kernels.experiments.fir import polyphase_fir
from dsp_audio_project_tpu.kernels.experiments.iir import block_apply, block_end_states
from dsp_audio_project_tpu.kernels.experiments.rfft_butterfly import rfft_pallas
from dsp_audio_project_tpu.ops.eq import (
    _block_recurrence,
    _carry_states,
    make_block_operators,
)
from dsp_audio_project_tpu.ops.src import make_plan
from dsp_audio_project_tpu.oracle import resample_oracle, snr_db

from conftest import make_test_signal


@pytest.mark.parametrize("L,M", [(3, 2), (2, 3), (160, 147), (1, 4)])
def test_fir_kernel_matches_oracle(L, M):
    fs = 44100
    x = make_test_signal(20000, fs, seed=3)
    cfg = SRCConfig(L=L, M=M)
    plan = make_plan(L, M)
    n_out = cfg.output_length(len(x))
    got = np.asarray(
        polyphase_fir(jnp.asarray(x), plan, n_out, interpret=True)
    )
    want, _ = resample_oracle(x, fs, cfg, engine="fast")
    assert got.shape == want.shape
    assert snr_db(want, got) > 60.0


def test_fir_kernel_batched():
    fs = 48000
    xs = np.stack([make_test_signal(8192, fs, seed=s) for s in range(3)])
    cfg = SRCConfig(L=2, M=3)
    plan = make_plan(2, 3)
    n_out = cfg.output_length(8192)
    got = np.asarray(
        polyphase_fir(jnp.asarray(xs), plan, n_out, interpret=True)
    )
    for c in range(3):
        want, _ = resample_oracle(xs[c], fs, cfg, engine="fast")
        assert snr_db(want, got[c]) > 60.0


def _ops_for(gains, fs, block):
    cfg = EQConfig.from_gains(gains)
    return make_block_operators(cfg.active_bands(fs), fs, cfg.q, block), cfg


def test_iir_kernels_match_jnp_path():
    fs = 44100
    x = make_test_signal(16384, fs, seed=5)
    block = 256
    ops, cfg = _ops_for({"Sub-Bass": 6, "Bass": -3, "High Mids": 12}, fs, block)
    K = len(x) // block
    xb = jnp.asarray(x.reshape(1, K, block))

    # Phase A vs jnp scan
    e_kernel = np.asarray(block_end_states(xb, ops, interpret=True))
    _, e_jnp = _block_recurrence(xb, ops)
    np.testing.assert_allclose(e_kernel, np.asarray(e_jnp), atol=2e-5)

    # Phase B + C vs full jnp equalize (pre-clip)
    sigma = _carry_states(jnp.asarray(e_kernel), ops)
    y = np.asarray(block_apply(xb, sigma, ops, interpret=True)).reshape(-1)

    from dsp_audio_project_tpu.oracle import equalize_oracle

    want = equalize_oracle(x, fs, cfg)
    got = np.clip(y, -1.0, 1.0)
    assert snr_db(want, got) > 60.0


def test_iir_kernel_ragged_tiles():
    fs = 44100
    block = 128
    K = 37  # not a multiple of any pow2 tile
    x = make_test_signal(K * block, fs, seed=8)
    ops, cfg = _ops_for({"Bass": 5}, fs, block)
    xb = jnp.asarray(x.reshape(1, K, block))
    e = np.asarray(block_end_states(xb, ops, block_tile=16, interpret=True))
    _, e_jnp = _block_recurrence(xb, ops)
    np.testing.assert_allclose(e, np.asarray(e_jnp), atol=2e-5)


@pytest.mark.parametrize("n", [8, 256, 2048])
def test_rfft_kernel_matches_numpy(n, rng):
    x = rng.standard_normal((5, n)).astype(np.float32)
    got = np.asarray(rfft_pallas(jnp.asarray(x), interpret=True))
    want = np.fft.rfft(x, axis=-1)
    assert got.shape == want.shape
    assert np.max(np.abs(got - want)) / np.max(np.abs(want)) < 1e-5


def test_rfft_kernel_row_tiling(rng):
    x = rng.standard_normal((7, 512)).astype(np.float32)
    got = np.asarray(rfft_pallas(jnp.asarray(x), row_tile=4, interpret=True))
    want = np.fft.rfft(x, axis=-1)
    assert np.max(np.abs(got - want)) / np.max(np.abs(want)) < 1e-5


@pytest.mark.parametrize("n", [256, 1024, 2048])
def test_rfft_four_step_kernel_matches_numpy(n, rng):
    from dsp_audio_project_tpu.kernels.rfft import rfft_pallas_four_step

    x = rng.standard_normal((5, n)).astype(np.float32)
    want = np.fft.rfft(x, axis=-1)
    scale = np.max(np.abs(want))
    got = np.asarray(
        rfft_pallas_four_step(jnp.asarray(x), n1=n // 128, row_tile=4,
                              interpret=True)
    )
    assert got.shape == want.shape
    assert np.max(np.abs(got - want)) / scale < 1e-5
    mag = np.asarray(
        rfft_pallas_four_step(jnp.asarray(x), n1=n // 128, row_tile=4,
                              magnitude=True, interpret=True)
    )
    assert np.max(np.abs(mag - np.abs(want))) / scale < 1e-5


def test_rfft_four_step_kernel_fast_mode(rng):
    """bf16x3 step-3 matmuls hold reference-grade (~4e-6) accuracy."""
    from dsp_audio_project_tpu.kernels.rfft import rfft_pallas_four_step

    x = rng.standard_normal((6, 2048)).astype(np.float32)
    want = np.fft.rfft(x, axis=-1)
    got = np.asarray(
        rfft_pallas_four_step(jnp.asarray(x), n1=16, row_tile=4,
                              precision="fast", interpret=True)
    )
    assert np.max(np.abs(got - want)) / np.max(np.abs(want)) < 5e-5


def test_fir_dma_kernel_matches_oracle():
    """Manual-DMA FIR kernel (interpret mode) incl. batch-row boundaries."""
    from dsp_audio_project_tpu.kernels.experiments.fir_dma import polyphase_fir_dma

    fs = 44100
    xs = np.stack([make_test_signal(20000, fs, seed=s) for s in range(2)])
    cfg = SRCConfig(L=160, M=147)
    plan = make_plan(160, 147)
    n_out = cfg.output_length(20000)
    got = np.asarray(
        polyphase_fir_dma(jnp.asarray(xs), plan, n_out, frame_tile=64,
                          interpret=True)
    )
    for c in range(2):
        want, _ = resample_oracle(xs[c], fs, cfg, engine="fast")
        assert snr_db(want, got[c]) > 60.0


def test_fir_shear_kernel_matches_xla_path():
    """Shear kernel (interpret) vs the XLA frame path, incl. batch + both
    rate directions and the frame-major/flat equivalence."""
    from dsp_audio_project_tpu.kernels.fir_shear import (
        polyphase_fir_shear_frames,
    )
    from dsp_audio_project_tpu.ops.src import _resample_frames

    rng = np.random.default_rng(3)
    for L, M, n in [(160, 147, 44100), (147, 160, 30011)]:
        plan = make_plan(L, M)
        n_out = int(np.ceil(n * L / M))
        x = (0.3 * rng.standard_normal(n)).astype(np.float32)
        want = np.asarray(_resample_frames(jnp.asarray(x), plan, n, n_out))
        got = np.asarray(
            polyphase_fir_shear_frames(jnp.asarray(x), plan, n_out,
                                       interpret=True)
        )
        assert got.shape == (-(-n_out // plan.P), plan.P)
        assert np.max(np.abs(got.reshape(-1)[:n_out] - want)) < 1e-5

    # batched + pad_frames tile alignment
    plan = make_plan(160, 147)
    n = 20000
    n_out = int(np.ceil(n * 160 / 147))
    xs = (0.3 * rng.standard_normal((2, n))).astype(np.float32)
    want = np.asarray(_resample_frames(jnp.asarray(xs), plan, n, n_out))
    got = np.asarray(
        polyphase_fir_shear_frames(jnp.asarray(xs), plan, n_out,
                                   interpret=True, pad_frames=True)
    )
    assert got.shape[-2] % 128 == 0
    assert np.max(np.abs(got.reshape(2, -1)[:, :n_out] - want)) < 1e-5


def test_fir_shear_fast_mode():
    """bf16x3 polyphase matmul holds ~1e-5 relative vs the XLA path."""
    from dsp_audio_project_tpu.config import SRCConfig
    from dsp_audio_project_tpu.kernels.fir_shear import (
        polyphase_fir_shear_frames,
    )
    from dsp_audio_project_tpu.ops.src import make_plan, resample

    cfg = SRCConfig(L=160, M=147)
    plan = make_plan(160, 147)
    x = (0.4 * np.random.default_rng(0).standard_normal(44100)).astype(
        np.float32
    )
    n_out = cfg.output_length(len(x))
    want, _ = resample(jnp.asarray(x), 44100, cfg)
    fr = polyphase_fir_shear_frames(
        jnp.asarray(x), plan, n_out, precision="fast", interpret=True
    )
    got = np.asarray(fr).reshape(-1)[:n_out]
    w = np.asarray(want)
    assert np.max(np.abs(got - w)) / np.max(np.abs(w)) < 5e-5


def test_fir_shear_split_subtiles_matches():
    """Per-subtile variant (independent shear->matmul chains) is exact."""
    from dsp_audio_project_tpu.config import SRCConfig
    from dsp_audio_project_tpu.kernels.fir_shear import (
        polyphase_fir_shear_frames,
    )
    from dsp_audio_project_tpu.ops.src import make_plan

    cfg = SRCConfig(L=160, M=147)
    plan = make_plan(160, 147)
    x = (0.4 * np.random.default_rng(1).standard_normal(30000)).astype(
        np.float32
    )
    n_out = cfg.output_length(len(x))
    a = polyphase_fir_shear_frames(
        jnp.asarray(x), plan, n_out, interpret=True
    )
    b = polyphase_fir_shear_frames(
        jnp.asarray(x), plan, n_out, interpret=True, split_subtiles=True
    )
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_fir_shear_rejects_narrow_stride():
    from dsp_audio_project_tpu.kernels.fir_shear import (
        polyphase_fir_shear_frames,
    )

    plan = make_plan(8, 7)  # s = 7
    with pytest.raises(ValueError, match="s>=8"):
        polyphase_fir_shear_frames(jnp.zeros(1000), plan, 1143, interpret=True)


def test_fir_class_kernel_matches_xla_path():
    """Class-major kernel (interpret) vs the XLA frame path: both rate
    directions, batch, pad_frames, and the frame-major/flat equivalence."""
    from dsp_audio_project_tpu.kernels.fir_class import (
        polyphase_fir_class_frames,
    )
    from dsp_audio_project_tpu.ops.src import _resample_frames

    rng = np.random.default_rng(5)
    for L, M, n in [(160, 147, 44100), (147, 160, 30011)]:
        plan = make_plan(L, M)
        n_out = int(np.ceil(n * L / M))
        x = (0.3 * rng.standard_normal(n)).astype(np.float32)
        want = np.asarray(_resample_frames(jnp.asarray(x), plan, n, n_out))
        got = np.asarray(
            polyphase_fir_class_frames(jnp.asarray(x), plan, n_out,
                                       interpret=True)
        )
        assert got.shape == (-(-n_out // plan.P), plan.P)
        assert np.max(np.abs(got.reshape(-1)[:n_out] - want)) < 1e-5

    plan = make_plan(160, 147)
    n = 20000
    n_out = int(np.ceil(n * 160 / 147))
    xs = (0.3 * rng.standard_normal((2, n))).astype(np.float32)
    want = np.asarray(_resample_frames(jnp.asarray(xs), plan, n, n_out))
    got = np.asarray(
        polyphase_fir_class_frames(jnp.asarray(xs), plan, n_out,
                                   interpret=True, pad_frames=True)
    )
    assert got.shape[-2] % 128 == 0
    assert np.max(np.abs(got.reshape(2, -1)[:, :n_out] - want)) < 1e-5


def test_fir_class_fast_mode():
    """bf16x3 banks hold ~1e-5 relative vs the XLA path."""
    from dsp_audio_project_tpu.config import SRCConfig
    from dsp_audio_project_tpu.kernels.fir_class import (
        polyphase_fir_class_frames,
    )
    from dsp_audio_project_tpu.ops.src import resample

    cfg = SRCConfig(L=160, M=147)
    plan = make_plan(160, 147)
    x = (0.4 * np.random.default_rng(0).standard_normal(44100)).astype(
        np.float32
    )
    n_out = cfg.output_length(len(x))
    want, _ = resample(jnp.asarray(x), 44100, cfg)
    fr = polyphase_fir_class_frames(
        jnp.asarray(x), plan, n_out, precision="fast", interpret=True
    )
    got = np.asarray(fr).reshape(-1)[:n_out]
    w = np.asarray(want)
    assert np.max(np.abs(got - w)) / np.max(np.abs(w)) < 5e-5


def test_fir_class_shard_style_call():
    """num_frames/pad_left contract (halo-extended shard input) matches the
    shear kernel's on the same input."""
    from dsp_audio_project_tpu.kernels.fir_class import (
        polyphase_fir_class_frames,
    )
    from dsp_audio_project_tpu.kernels.fir_shear import (
        polyphase_fir_shear_frames,
    )

    plan = make_plan(160, 147)
    rng = np.random.default_rng(9)
    hl, hr = plan.halo_left, plan.halo_right
    n_loc = 147 * 256
    x_ext = (0.3 * rng.standard_normal(hl + n_loc + hr)).astype(np.float32)
    kw = dict(num_frames=256, pad_left=-(plan.lo + hl), interpret=True)
    a = np.asarray(polyphase_fir_class_frames(
        jnp.asarray(x_ext), plan, 256 * plan.P, **kw))
    b = np.asarray(polyphase_fir_shear_frames(
        jnp.asarray(x_ext), plan, 256 * plan.P, **kw))
    assert a.shape == b.shape == (256, plan.P)
    assert np.max(np.abs(a - b)) < 1e-5


def test_fir_frames_dispatcher_routes():
    from dsp_audio_project_tpu.kernels import fir_frames
    from dsp_audio_project_tpu.ops.src import _resample_frames

    plan = make_plan(160, 147)
    n = 12000
    n_out = int(np.ceil(n * 160 / 147))
    x = (0.3 * np.random.default_rng(2).standard_normal(n)).astype(np.float32)
    want = np.asarray(_resample_frames(jnp.asarray(x), plan, n, n_out))
    for kernel in ("auto", "rect", "class", "shear"):
        got = np.asarray(
            fir_frames(jnp.asarray(x), plan, n_out, kernel=kernel,
                       interpret=True)
        )
        assert np.max(np.abs(got.reshape(-1)[:n_out] - want)) < 1e-5


def test_fir_class_rect_kernel_matches_class():
    """Group-rectangle manual-DMA kernel: bitwise parity with the class
    kernel (same banks, same math; only the input staging path differs),
    both rate directions, batch, pad_frames, fast mode, and the
    shard-style num_frames/pad_left contract."""
    from dsp_audio_project_tpu.kernels.fir_class import (
        polyphase_fir_class_frames, polyphase_fir_class_rect_frames,
    )

    rng_ = np.random.default_rng(15)
    for L, M, n in [(160, 147, 44100), (147, 160, 30011)]:
        plan = make_plan(L, M)
        n_out = int(np.ceil(n * L / M))
        x = (0.3 * rng_.standard_normal((2, n))).astype(np.float32)
        for kw in (dict(), dict(pad_frames=True), dict(precision="fast")):
            a = np.asarray(polyphase_fir_class_frames(
                jnp.asarray(x), plan, n_out, interpret=True, **kw))
            b = np.asarray(polyphase_fir_class_rect_frames(
                jnp.asarray(x), plan, n_out, interpret=True, **kw))
            np.testing.assert_array_equal(a, b, err_msg=f"{L}/{M} {kw}")

    plan = make_plan(160, 147)
    hl, hr = plan.halo_left, plan.halo_right
    n_loc = 147 * 256
    x_ext = (0.3 * rng_.standard_normal(hl + n_loc + hr)).astype(np.float32)
    kw = dict(num_frames=256, pad_left=-(plan.lo + hl), interpret=True)
    a = np.asarray(polyphase_fir_class_frames(
        jnp.asarray(x_ext), plan, 256 * plan.P, **kw))
    b = np.asarray(polyphase_fir_class_rect_frames(
        jnp.asarray(x_ext), plan, 256 * plan.P, **kw))
    np.testing.assert_array_equal(a, b)


def test_rfft_tall_kernel_matches_numpy(rng):
    """Tall (MXU-both-stages) four-step kernel: complex + magnitude parity.

    N=16384 is the production size; interpret mode on CPU, tiny batch.
    """
    from dsp_audio_project_tpu.kernels.rfft import rfft_pallas_four_step_tall

    n = 16384
    x = rng.standard_normal((3, n)).astype(np.float32)
    want = np.fft.rfft(x, axis=-1)
    scale = np.max(np.abs(want))
    got = np.asarray(
        rfft_pallas_four_step_tall(jnp.asarray(x), row_tile=8, interpret=True)
    )
    assert got.shape == want.shape
    assert np.max(np.abs(got - want)) / scale < 1e-5
    mag = np.asarray(
        rfft_pallas_four_step_tall(jnp.asarray(x), row_tile=8,
                                   magnitude=True, interpret=True)
    )
    assert np.max(np.abs(mag - np.abs(want))) / scale < 1e-5


def test_rfft_tall_kernel_fast_mode(rng):
    from dsp_audio_project_tpu.kernels.rfft import rfft_pallas_four_step_tall

    n = 16384
    x = rng.standard_normal((2, n)).astype(np.float32)
    want = np.fft.rfft(x, axis=-1)
    got = np.asarray(
        rfft_pallas_four_step_tall(jnp.asarray(x), row_tile=8,
                                   precision="fast", interpret=True)
    )
    assert np.max(np.abs(got - want)) / np.max(np.abs(want)) < 5e-5


def test_rfft_kernel_plan_routing():
    """Size -> kernel routing: classic to 8192, tall to 524288, two-level
    at 1048576 (round 5)."""
    from dsp_audio_project_tpu.ops.fft import _rfft_kernel_plan

    assert _rfft_kernel_plan(2048) == ("four_step", 16)
    assert _rfft_kernel_plan(4096) == ("four_step", 32)
    assert _rfft_kernel_plan(8192) == ("four_step", 32)
    assert _rfft_kernel_plan(16384) == ("tall", (16, 128))
    assert _rfft_kernel_plan(32768) == ("tall", (8, 128))
    assert _rfft_kernel_plan(65536) == ("tall", (1, 128))
    assert _rfft_kernel_plan(131072) == ("tall", (1, 256))
    assert _rfft_kernel_plan(262144) == ("tall", (1, 512))
    assert _rfft_kernel_plan(524288) == ("tall", (1, 512))  # n1=1024, bf16 D1
    assert _rfft_kernel_plan(1048576) == ("two_level", None)
    assert _rfft_kernel_plan(2097152) is None  # compile-bound on v5e
    assert _rfft_kernel_plan(3000) is None


@pytest.mark.parametrize("n,n2", [(65536, 128), (131072, 256), (262144, 512)])
def test_rfft_tall_kernel_large_sizes(n, n2, rng):
    """Long-spectrogram-window sizes: row_tile=1 keeps one (n2, n1) grid in
    VMEM where the rt=8 tile exceeded it (VERDICT round-2 item 4)."""
    from dsp_audio_project_tpu.kernels.rfft import rfft_pallas_four_step_tall

    x = rng.standard_normal((2, n)).astype(np.float32)
    want = np.fft.rfft(x, axis=-1)
    scale = np.max(np.abs(want))
    got = np.asarray(
        rfft_pallas_four_step_tall(jnp.asarray(x), n2=n2, row_tile=1,
                                   interpret=True)
    )
    assert got.shape == want.shape
    assert np.max(np.abs(got - want)) / scale < 2e-5
    mag = np.asarray(
        rfft_pallas_four_step_tall(jnp.asarray(x), n2=n2, row_tile=1,
                                   magnitude=True, precision="fast",
                                   interpret=True)
    )
    assert np.max(np.abs(mag - np.abs(want))) / scale < 1e-4


def test_fir_class_flat_matches_resample(rng):
    """Flat-emission class kernel == ops/src.resample (and the frames
    variant flattened): column-rotated banks + aligned in-kernel assembly."""
    from dsp_audio_project_tpu.config import SRCConfig
    from dsp_audio_project_tpu.kernels.fir_class import (
        class_flat_supported, polyphase_fir_class_flat,
    )
    from dsp_audio_project_tpu.ops.src import make_plan, resample

    cfg = SRCConfig(L=160, M=147)
    plan = make_plan(cfg.L, cfg.M)
    assert class_flat_supported(plan)
    n = 40000
    x = (rng.standard_normal((2, n)) * 0.5).astype(np.float32)
    n_out = cfg.output_length(n)
    want = np.asarray(resample(jnp.asarray(x), 44100, cfg)[0])
    got = np.asarray(
        polyphase_fir_class_flat(jnp.asarray(x), plan, n_out, interpret=True)
    )
    assert got.shape == want.shape
    assert np.max(np.abs(got - want)) < 2e-6
    fast = np.asarray(
        polyphase_fir_class_flat(jnp.asarray(x), plan, n_out,
                                 precision="fast", interpret=True)
    )
    assert np.max(np.abs(fast - want)) < 2e-4


def test_iir_seq_kernel_matches_oracle(rng):
    """Sequential-carry one-sweep EQ kernel (demoted to experiments/ — does
    not lower on real-TPU Mosaic, see its module docstring) stays correct
    in interpret mode, incl. state reset across the batch axis."""
    from dsp_audio_project_tpu import EQConfig
    from dsp_audio_project_tpu.kernels.experiments.iir_seq import (
        equalize_seq_flat,
    )
    from dsp_audio_project_tpu.ops.eq import make_block_operators
    from dsp_audio_project_tpu.oracle import equalize_oracle, snr_db

    from conftest import make_test_signal

    fs = 48000
    cfg = EQConfig.from_gains(
        {"Sub-Bass": 6, "Bass": -3, "High Mids": 12, "Presence": -15}
    )
    ops = make_block_operators(cfg.active_bands(fs), fs, cfg.q, 8192, 128)
    SB = 10
    L = 2 * SB * 8192
    xb = np.stack([make_test_signal(L, fs, seed=s) for s in (5, 9)])
    for fast, gate in ((False, 105.0), (True, 100.0)):
        zb = np.asarray(
            equalize_seq_flat(jnp.asarray(xb), ops, super_blocks=SB,
                              fast=fast, interpret=True)
        )
        for c in range(2):
            want = equalize_oracle(xb[c], fs, cfg)
            q = snr_db(want, zb[c])
            assert q > gate, f"fast={fast} ch{c}: {q:.1f} dB"


def test_pipeline_flat_path_matches_oracle(rng):
    """AudioPipeline flat path (class-flat FIR -> XLA flat EQ -> spectra)."""
    from dsp_audio_project_tpu import (
        AudioPipeline, EQConfig, PipelineConfig, SRCConfig,
    )
    from dsp_audio_project_tpu.config import KernelConfig
    from dsp_audio_project_tpu.oracle import (
        pipeline_oracle, snr_db, spectrum_oracle,
    )

    from conftest import make_test_signal

    fs, n = 44100, 60000
    x = make_test_signal(n, fs, seed=1)
    cfg = PipelineConfig(
        src=SRCConfig(L=160, M=147),
        eq=EQConfig.from_gains({"Sub-Bass": 6, "Bass": -3, "High Mids": 12}),
        kernels=KernelConfig(interpret=True),
    )
    pipe = AudioPipeline(cfg)
    assert pipe.flat_supported(n)
    n_out = cfg.src.output_length(n)
    fs_out = cfg.src.output_rate(fs)
    z, y, (mx, my, mz) = pipe.jit_forward_flat_spectra()(
        jnp.asarray(x), fs
    )
    assert z.shape[-1] == n_out and y.shape[-1] == n_out
    want, _ = pipeline_oracle(x, fs, cfg.src, cfg.eq, engine="fast")
    assert snr_db(want, np.asarray(z)) > 100.0
    cap = cfg.spectrum.analysis_limit
    assert snr_db(spectrum_oracle(want[:cap], fs_out)[1],
                  np.asarray(mz)) > 60.0
    assert snr_db(spectrum_oracle(x[:cap], fs)[1], np.asarray(mx)) > 60.0
