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
