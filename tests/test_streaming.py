"""Streaming tier: chunked processing == one-shot, and checkpoint/resume."""
import numpy as np
import pytest

from dsp_audio_project_tpu import EQConfig, PipelineConfig, SRCConfig, process
from dsp_audio_project_tpu.config import KernelConfig
from dsp_audio_project_tpu.oracle import pipeline_oracle, snr_db
from dsp_audio_project_tpu.streaming import StreamProcessor, StreamState

from conftest import make_test_signal


def _run_stream(x, fs, cfg, chunks):
    sp = StreamProcessor(cfg, fs)
    outs = []
    pos = 0
    for c in chunks:
        outs.append(sp.process(x[pos : pos + c]))
        pos += c
    assert pos == len(x)
    outs.append(sp.flush())
    return np.concatenate([o for o in outs if len(o)])


@pytest.mark.parametrize("chunking", [
    [16384], [5000, 5000, 6384], [100, 16000, 284], [1] * 0 + [8192, 8192],
])
@pytest.mark.parametrize("L,M", [(3, 2), (1, 2), (2, 1)])
def test_stream_equals_oneshot(chunking, L, M):
    fs = 44100
    x = make_test_signal(16384, fs, seed=21)
    cfg = PipelineConfig(
        src=SRCConfig(L=L, M=M),
        eq=EQConfig.from_gains({"Bass": 6, "Presence": -4}),
        kernels=KernelConfig(iir_block=256),
    )
    want, _ = process(x, fs, cfg)
    got = _run_stream(x, fs, cfg, chunking)
    assert got.shape == np.asarray(want).shape
    np.testing.assert_allclose(got, np.asarray(want), atol=5e-5)


def test_stream_headline_config_vs_oracle():
    fs = 44100
    x = make_test_signal(30000, fs, seed=5)
    cfg = PipelineConfig(src=SRCConfig(L=160, M=147),
                         eq=EQConfig.from_gains({"Bass": 5}))
    got = _run_stream(x, fs, cfg, [7000, 7000, 7000, 9000])
    want, _ = pipeline_oracle(x, fs, cfg.src, cfg.eq, engine="fast")
    assert got.shape == want.shape
    assert snr_db(want, got) > 60.0


def test_stream_checkpoint_resume():
    fs = 44100
    x = make_test_signal(20000, fs, seed=9)
    cfg = PipelineConfig(src=SRCConfig(L=2, M=3),
                         eq=EQConfig.from_gains({"Sub-Bass": 8}))

    # continuous run
    want = _run_stream(x, fs, cfg, [20000])

    # run half, serialize, resume in a fresh processor
    sp1 = StreamProcessor(cfg, fs)
    part1 = sp1.process(x[:11000])
    blob = sp1.state_bytes()
    assert isinstance(blob, bytes) and len(blob) < 100_000

    sp2 = StreamProcessor.resume(cfg, blob)
    part2 = sp2.process(x[11000:])
    tail = sp2.flush()
    got = np.concatenate([part1, part2, tail])
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=5e-5)


def test_stream_state_roundtrip():
    st = StreamState(
        samples_in=123, frames_done=7,
        src_carry=np.arange(5, dtype=np.float32),
        eq_state=np.ones(4, dtype=np.float32), fs=48000,
    )
    back = StreamState.from_bytes(st.to_bytes())
    assert back.samples_in == 123 and back.frames_done == 7 and back.fs == 48000
    np.testing.assert_array_equal(back.src_carry, st.src_carry)
    np.testing.assert_array_equal(back.eq_state, st.eq_state)


def test_stream_short_total_signal():
    # Total stream shorter than the SRC filter: one-shot geometry at flush.
    fs = 44100
    x = make_test_signal(40, fs, seed=2)
    cfg = PipelineConfig(src=SRCConfig(L=3, M=4))
    want, _ = process(x, fs, cfg)
    got = _run_stream(x, fs, cfg, [25, 15])
    assert got.shape == np.asarray(want).shape
    np.testing.assert_allclose(got, np.asarray(want), atol=1e-5)


def test_stream_bypass():
    fs = 48000
    x = make_test_signal(5000, fs, seed=1)
    cfg = PipelineConfig()
    got = _run_stream(x, fs, cfg, [2500, 2500])
    np.testing.assert_array_equal(got, x)


# ---- sharded streaming: chunk x shard invariance (BASELINE config 5) ----

def _sharded_cfg(L, M, iir_block=1024):
    return PipelineConfig(
        src=SRCConfig(L=L, M=M),
        eq=EQConfig.from_gains({"Bass": 6, "High Mids": -4}),
        kernels=KernelConfig(iir_block=iir_block),
    )


def _mesh(mc, mb):
    from dsp_audio_project_tpu.config import MeshConfig
    from dsp_audio_project_tpu.parallel.mesh import build_mesh

    return build_mesh(MeshConfig(channel_devices=mc, block_devices=mb))


def _stream_through(sp, x, chunking):
    outs, pos = [], 0
    n = x.shape[-1]
    for size in chunking:
        take = min(size, n - pos)
        if take <= 0:
            break
        outs.append(sp.process(x[:, pos : pos + take]))
        pos += take
    assert pos == n, "chunking must cover the signal"
    outs.append(sp.flush())
    return np.concatenate(outs, axis=1)


@pytest.mark.parametrize("mc,mb", [(1, 4), (2, 2), (4, 1), (1, 8)])
@pytest.mark.parametrize("L,M", [(3, 2), (160, 147)])
def test_sharded_stream_chunk_shard_invariance(L, M, mc, mb):
    """Any chunking x any mesh == the one-shot unsharded chain (>=110 dB)."""
    import jax.numpy as jnp

    from dsp_audio_project_tpu import AudioPipeline
    from dsp_audio_project_tpu.streaming import ShardedStreamProcessor

    fs, C, n = 44100, 2, 50000
    x = np.stack([make_test_signal(n, fs, seed=i) for i in range(C)])
    cfg = _sharded_cfg(L, M)
    z_ref = np.asarray(AudioPipeline(cfg).jit_forward()(jnp.asarray(x), fs)[0])

    sp = ShardedStreamProcessor(cfg, fs, _mesh(mc, mb), C)
    z = _stream_through(sp, x, [977, 3000, 16000, 9999, n])
    assert z.shape == z_ref.shape
    q = min(snr_db(z_ref[c], z[c]) for c in range(C))
    assert q > 110.0, f"mesh {mc}x{mb}: {q:.1f} dB"


def test_sharded_stream_chunking_invariance():
    """Different chunkings through the same mesh agree bit-for-bit (one
    compiled super-step executable; chunk boundaries only move host
    buffering)."""
    from dsp_audio_project_tpu.streaming import ShardedStreamProcessor

    fs, C, n = 44100, 2, 40000
    x = np.stack([make_test_signal(n, fs, seed=7 + i) for i in range(C)])
    cfg = _sharded_cfg(160, 147)
    mesh = _mesh(1, 4)
    z1 = _stream_through(ShardedStreamProcessor(cfg, fs, mesh, C), x, [n])
    z2 = _stream_through(
        ShardedStreamProcessor(cfg, fs, mesh, C), x, [1, 499, 12000, n]
    )
    np.testing.assert_array_equal(z1, z2)


def test_sharded_stream_checkpoint_resume():
    """state_bytes/resume mid-stream: the resumed stream continues exactly."""
    from dsp_audio_project_tpu.streaming import ShardedStreamProcessor

    fs, C, n = 44100, 2, 45000
    x = np.stack([make_test_signal(n, fs, seed=11 + i) for i in range(C)])
    cfg = _sharded_cfg(160, 147)
    mesh = _mesh(2, 2)

    full = _stream_through(
        ShardedStreamProcessor(cfg, fs, mesh, C), x, [20000, n]
    )
    sp1 = ShardedStreamProcessor(cfg, fs, mesh, C)
    part1 = sp1.process(x[:, :20000])
    blob = sp1.state_bytes()
    sp2 = ShardedStreamProcessor.resume(cfg, mesh, C, blob)
    part2 = np.concatenate(
        [sp2.process(x[:, 20000:]), sp2.flush()], axis=1
    )
    got = np.concatenate([part1, part2], axis=1)
    np.testing.assert_array_equal(full, got)


def test_sharded_stream_short_signal():
    """Stream shorter than the filter: the short-signal 'same' geometry
    falls back to the one-shot unsharded path at flush."""
    import jax.numpy as jnp

    from dsp_audio_project_tpu.streaming import ShardedStreamProcessor

    fs, C = 44100, 2
    n = 30  # 30 * 160 < 6401 taps
    x = np.stack([make_test_signal(n, fs, seed=3 + i) for i in range(C)])
    cfg = _sharded_cfg(160, 147)
    sp = ShardedStreamProcessor(cfg, fs, _mesh(1, 4), C)
    z = np.concatenate([sp.process(x), sp.flush()], axis=1)
    want = np.stack([
        pipeline_oracle(x[c], fs, cfg.src, cfg.eq, engine="fast")[0]
        for c in range(C)
    ])
    assert z.shape == want.shape
    assert min(snr_db(want[c], z[c]) for c in range(C)) > 60.0


def test_sharded_stream_bypass_paths():
    """SRC-bypass (EQ only) and EQ-bypass (SRC only, unclipped) streams."""
    import jax.numpy as jnp

    from dsp_audio_project_tpu import AudioPipeline
    from dsp_audio_project_tpu.streaming import ShardedStreamProcessor

    fs, C, n = 44100, 2, 30000
    x = np.stack([make_test_signal(n, fs, seed=21 + i) for i in range(C)])
    mesh = _mesh(1, 4)

    cfg_eq = PipelineConfig(
        src=SRCConfig(L=1, M=1),
        eq=EQConfig.from_gains({"Bass": 6, "Presence": -9}),
        kernels=KernelConfig(iir_block=1024),
    )
    z_ref = np.asarray(
        AudioPipeline(cfg_eq).jit_forward()(jnp.asarray(x), fs)[0]
    )
    z = _stream_through(
        ShardedStreamProcessor(cfg_eq, fs, mesh, C), x, [7000, n]
    )
    assert min(snr_db(z_ref[c], z[c]) for c in range(C)) > 110.0

    cfg_src = PipelineConfig(
        src=SRCConfig(L=160, M=147), eq=EQConfig(),
        kernels=KernelConfig(iir_block=1024),
    )
    z_ref = np.asarray(
        AudioPipeline(cfg_src).jit_forward()(jnp.asarray(x), fs)[0]
    )
    z = _stream_through(
        ShardedStreamProcessor(cfg_src, fs, mesh, C), x, [12345, n]
    )
    assert min(snr_db(z_ref[c], z[c]) for c in range(C)) > 110.0
