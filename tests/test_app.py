"""App layer: HTML report generation and CLI driver."""
import json
import os

import numpy as np
import pytest

from dsp_audio_project_tpu import EQConfig, PipelineConfig, SRCConfig
from dsp_audio_project_tpu.app.report import render_report
from dsp_audio_project_tpu.app.svgplot import Figure, decimate_for_display
from dsp_audio_project_tpu.io.wavio import read_wav, write_wav


def test_display_decimation():
    # Reference semantics (app.py:102-106): stride ceil(n/max) keeps <= max.
    x = np.arange(10_000)
    d = decimate_for_display(x, 2500)
    assert len(d) <= 2500
    assert d[0] == 0 and d[1] == 4
    short = np.arange(100)
    assert decimate_for_display(short, 2500) is short


def test_svg_figure_renders():
    f = Figure("t", xlabel="x", ylabel="y", logx=True)
    f.line([1, 10, 100], [0, 5, -5], "#00ff00", "trace")
    f.vline(10)
    svg = f.render()
    assert svg.startswith("<svg") and svg.endswith("</svg>")
    assert "polyline" in svg and "stroke-dasharray" in svg


def test_report_contents(audio_short):
    x, fs = audio_short
    cfg = PipelineConfig(src=SRCConfig(L=1, M=2),
                         eq=EQConfig.from_gains({"Bass": 6}))
    html = render_report(x, fs, cfg, title="t")
    assert html.count("<svg") == 6  # time, freq, 3 stems, angular
    assert "audio/wav;base64" in html
    assert f"Fs_out: {fs // 2} Hz" in html
    assert "sessionStorage" in html  # player position persistence (A3)
    # band-edge markers present in the frequency chart
    assert "stroke-dasharray" in html


def test_report_omega_axis(audio_short):
    x, fs = audio_short
    html = render_report(x, fs, PipelineConfig(), normalized_omega=True,
                         include_audio=False)
    assert "rad/sample" in html
    assert "audio/wav" not in html


def test_cli_report_and_wav(tmp_path, audio_short):
    from dsp_audio_project_tpu.cli import main

    x, fs = audio_short
    src = str(tmp_path / "in.wav")
    write_wav(src, fs, (x * 30000).astype(np.int16))
    out = str(tmp_path / "out.wav")
    rpt = str(tmp_path / "r.html")
    spec = str(tmp_path / "s.json")
    rc = main([src, out, "-L", "2", "-M", "3", "-g", "Bass=6",
               "--report", rpt, "--spectra", spec])
    assert rc == 0
    y, fs_out = read_wav(out)
    assert fs_out == fs * 2 // 3
    assert os.path.getsize(rpt) > 10_000
    data = json.load(open(spec))
    assert set(data) == {"input", "resampled", "output"}


def test_cli_bounds(tmp_path, audio_short):
    from dsp_audio_project_tpu.cli import main

    x, fs = audio_short
    src = str(tmp_path / "in.wav")
    write_wav(src, fs, (x * 30000).astype(np.int16))
    assert main([src, "-L", "160"]) == 2
    assert main([src, "-g", "Bass=40"]) == 2


def test_webapp_import_guard():
    # streamlit absent in this image: the module must import cleanly and
    # refuse politely at runtime.
    from dsp_audio_project_tpu.app import webapp

    if not webapp.HAVE_STREAMLIT:
        with pytest.raises(SystemExit):
            webapp.main()


def test_cli_mesh_sharded(tmp_path, rng):
    """--mesh CxB routes through the sharded pipeline (8 virtual devices)."""
    from dsp_audio_project_tpu.cli import main

    fs = 16000
    stereo = (rng.standard_normal((8000, 2)) * 12000).astype(np.int16)
    src = str(tmp_path / "m.wav")
    write_wav(src, fs, stereo)
    out = str(tmp_path / "m_out.wav")
    rc = main([src, out, "-L", "3", "-M", "2", "-g", "Bass=6",
               "--multichannel", "--mesh", "2x4"])
    assert rc == 0
    y, fs_out = read_wav(out)
    assert fs_out == fs * 3 // 2 and y.shape[1] == 2
    # unsharded run must agree
    out1 = str(tmp_path / "m1.wav")
    assert main([src, out1, "-L", "3", "-M", "2", "-g", "Bass=6",
                 "--multichannel"]) == 0
    y1, _ = read_wav(out1)
    np.testing.assert_allclose(
        y.astype(np.float64), y1.astype(np.float64), atol=2.0
    )
    # over-subscription is a clean error
    assert main([src, out, "--mesh", "9x9"]) == 2


def test_cli_multichannel(tmp_path, rng):
    from dsp_audio_project_tpu.cli import main

    fs = 16000
    stereo = (rng.standard_normal((4000, 2)) * 12000).astype(np.int16)
    src = str(tmp_path / "st.wav")
    write_wav(src, fs, stereo)
    out = str(tmp_path / "st_out.wav")
    rc = main([src, out, "-L", "1", "-M", "2", "--multichannel"])
    assert rc == 0
    y, fs_out = read_wav(out)
    assert fs_out == fs // 2 and y.shape[1] == 2


def test_interactive_svg_structure():
    """interactive=True emits the zoom/pan scaffolding with valid metadata."""
    import json
    import re

    f = Figure("t", xlabel="x", ylabel="y", logx=True)
    f.line([1, 10, 100], [0.0, 1.0, -1.0], "#00ff00", "sig")
    f.vline(50.0)
    svg = f.render(interactive=True)
    assert 'class="iplot"' in svg
    assert svg.count('class="ip-grid"') == 1
    assert svg.count('class="ip-view"') == 1
    assert 'clip-path="url(#' in svg
    assert "vector-effect" in svg  # strokes survive zoom scaling
    assert 'class="ip-evt"' in svg and 'class="ip-hover"' in svg
    meta = json.loads(re.search(r"data-ip='([^']+)'", svg).group(1))
    assert meta["logx"] is True
    assert meta["lx1"] > meta["lx0"] and meta["y1"] > meta["y0"]
    assert meta["iw"] > 0 and meta["ih"] > 0
    # non-interactive output carries none of the machinery
    plain = Figure("t").line([0, 1], [0, 1], "#fff").render()
    assert "iplot" not in plain and "vector-effect" not in plain


def test_report_carries_interactive_script(audio_44k):
    from dsp_audio_project_tpu.app.svgplot import INTERACTIVE_JS

    x, fs = audio_44k
    html = render_report(x[:8000], fs, PipelineConfig(), include_audio=False)
    # One driver script, one key substitution, balanced braces.
    assert html.count("ipview_") == 1
    assert "%(key)s" not in html
    script = html[html.rindex("(function()") :]
    script = script[: script.index("</script>")]
    assert script.count("{") == script.count("}")
    assert script.count("(") == script.count(")")
    # every chart is interactive
    assert html.count('class="iplot"') == html.count("<svg")


def test_report_main_charts_flag(audio_44k):
    x, fs = audio_44k
    full = render_report(x[:8000], fs, PipelineConfig(), include_audio=False)
    slim = render_report(x[:8000], fs, PipelineConfig(), include_audio=False,
                         main_charts=False)
    assert "Spectral cascade" in full and "Time-domain evolution" in full
    assert "Spectral cascade" not in slim
    assert "Time-domain evolution" not in slim
    assert "Angular spectrum" in slim  # stems/angular always present


def test_cli_example_source(tmp_path):
    """example:<kind> input — the reference's examples/*.wav browsing."""
    from dsp_audio_project_tpu.cli import main

    out = str(tmp_path / "ex.wav")
    assert main(["example:tones", out, "-L", "2", "-M", "1",
                 "-g", "Bass=6"]) == 0
    y, fs = read_wav(out)
    assert fs == 88200 and len(y) == 882000
    assert main(["example:bogus", out]) == 2


def test_cli_example_directory(tmp_path, capsys, rng):
    """On-disk examples/*.wav browsing (reference app.py:123-126): files in
    the examples dir are listed and loadable as example:<name>."""
    from dsp_audio_project_tpu.cli import main
    from dsp_audio_project_tpu.io.signal_io import (
        list_example_files, resolve_example,
    )

    exdir = tmp_path / "examples"
    exdir.mkdir()
    x = (0.5 * rng.standard_normal(4096)).astype(np.float32)
    write_wav(str(exdir / "FastCar.wav"), 22050,
              (x * 32767).astype(np.int16))
    (exdir / "notes.txt").write_text("not audio")

    files = list_example_files(str(exdir))
    assert [os.path.basename(p) for p in files] == ["FastCar.wav"]
    # Stem match, case-insensitive, decodes through load_signal.
    sig, fs = resolve_example("fastcar", str(exdir))
    assert fs == 22050 and len(sig) == 4096

    assert main(["--list-examples", "--examples-dir", str(exdir)]) == 0
    listing = capsys.readouterr().out
    assert "example:tones" in listing and "FastCar.wav" in listing

    out = str(tmp_path / "out.wav")
    assert main(["example:FastCar.wav", out,
                 "--examples-dir", str(exdir)]) == 0
    assert os.path.exists(out)
    # Missing dir: built-ins still resolve, unknown names raise.
    assert resolve_example("tones", str(tmp_path / "missing"))[1] == 44100
    with pytest.raises(ValueError):
        resolve_example("FastCar.wav", str(tmp_path / "missing"))


def test_cli_stream_chunk(tmp_path, rng):
    """--stream-chunk routes through the streaming engine; output matches
    the one-shot CLI run, with and without a mesh."""
    from dsp_audio_project_tpu.cli import main

    fs = 16000
    mono = (rng.standard_normal(24000) * 12000).astype(np.int16)
    src = str(tmp_path / "s.wav")
    write_wav(src, fs, mono[:, None])
    one = str(tmp_path / "s_one.wav")
    assert main([src, one, "-L", "3", "-M", "2", "-g", "Bass=6"]) == 0
    st = str(tmp_path / "s_st.wav")
    assert main([src, st, "-L", "3", "-M", "2", "-g", "Bass=6",
                 "--stream-chunk", "0.33"]) == 0
    y1, f1 = read_wav(one)
    y2, f2 = read_wav(st)
    assert f1 == f2 and y1.shape == y2.shape
    np.testing.assert_allclose(
        y1.astype(np.float64), y2.astype(np.float64), atol=2.0
    )
    # sharded super-steps + spectra sidecar
    stm = str(tmp_path / "s_stm.wav")
    spec = str(tmp_path / "s_spec.json")
    assert main([src, stm, "-L", "3", "-M", "2", "-g", "Bass=6",
                 "--stream-chunk", "0.25", "--mesh", "1x4",
                 "--spectra", spec]) == 0
    y3, _ = read_wav(stm)
    np.testing.assert_allclose(
        y1.astype(np.float64), y3.astype(np.float64), atol=2.0
    )
    import json as _json

    with open(spec) as fh:
        payload = _json.load(fh)
    assert set(payload) == {"input", "resampled", "output"}
    # streamed spectra == one-shot CLI spectra (prefix-resample exactness)
    spec1 = str(tmp_path / "s_spec1.json")
    assert main([src, str(tmp_path / "x.wav"), "-L", "3", "-M", "2",
                 "-g", "Bass=6", "--spectra", spec1]) == 0
    with open(spec1) as fh:
        payload1 = _json.load(fh)
    for k in payload:
        np.testing.assert_allclose(
            payload[k]["magnitude"], payload1[k]["magnitude"], atol=1e-4,
            err_msg=k,
        )
