"""Benchmark harness: audio samples/sec/chip for the SRC->EQ->FFT chain.

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": ..., "vs_baseline": R}

* value        — input samples/second through the declared full chain
                 (BASELINE.json metric): 44.1k->48k polyphase SRC
                 (L=160/M=147) + 6-band biquad EQ + magnitude spectra of
                 x, y AND z (the reference computes all three per render,
                 app.py:202-205) as ONE jitted program on one chip.
* vs_baseline  — speedup over the reference implementation's algorithm
                 (zero-stuffed full-rate numpy convolve + sequential scipy
                 lfilter cascade + per-render spectra — the golden oracle)
                 measured on this host's CPU, which is the only baseline the
                 reference defines (BASELINE.md: no published numbers).
                 Conservative: the oracle's spectra use np.fft, not the
                 reference's recursive-Python FFT.

Extra context (SRC+EQ-only time, SNR vs oracle, dynamic-serving figures)
goes to stderr so stdout stays a single machine-readable line.
"""
from __future__ import annotations

import json
import sys
import time

import numpy as np

SECONDS = 60.0
FS = 44100
GAINS = {"Sub-Bass": 6, "Bass": -3, "High Mids": 12, "Presence": -15,
         "Brilliance": 4}


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def make_signal(n: int, fs: int) -> np.ndarray:
    rng = np.random.default_rng(42)
    t = np.arange(n) / fs
    x = (
        0.4 * np.sin(2 * np.pi * 440 * t)
        + 0.2 * np.sin(2 * np.pi * 40 * t)
        + 0.2 * np.sin(2 * np.pi * 9800 * t)
        + 0.2 * rng.standard_normal(n)
    )
    return (x / np.max(np.abs(x))).astype(np.float32)


def main() -> None:
    import jax
    import jax.numpy as jnp

    from dsp_audio_project_tpu.utils.compcache import enable as _cc

    _cc()  # persistent compile cache: tunnel compiles cost minutes on bad days

    from dsp_audio_project_tpu import (
        AudioPipeline, EQConfig, PipelineConfig, SRCConfig,
    )
    from dsp_audio_project_tpu.oracle import pipeline_oracle, snr_db

    from dsp_audio_project_tpu.config import KernelConfig

    n = int(SECONDS * FS)
    x = make_signal(n, FS)
    # eq_fast/src_fast: bf16x3 output matmuls — the serving configuration
    # (~102 dB vs oracle, gate 60; full precision measures ~111 dB).
    cfg = PipelineConfig(
        src=SRCConfig(L=160, M=147), eq=EQConfig.from_gains(GAINS),
        kernels=KernelConfig(eq_fast=True, src_fast=True),
    )
    pipe = AudioPipeline(cfg)
    # Path ladder (fastest supported wins):
    #   cat    — EQ-fused rect FIR kernel emits [y0 | packed inj]; the
    #            frames tensor never round-trips HBM (round 5);
    #   frames — fused frame-major (FIR kernel frames -> frames EQ);
    #   flat   — jnp/XLA fallback outside the kernel regimes.
    fused = pipe.frames_supported(n)
    use_cat = pipe.cat_supported(n, FS)
    if use_cat:
        _cat = pipe.jit_forward_cat()
        _cat_full = pipe.jit_forward_cat_spectra()

        def fn(v, fs):
            return _cat(v, fs), None

        def fn_full(v, fs):
            z, mags = _cat_full(v, fs)
            return z, None, mags
    else:
        fn = pipe.jit_forward_frames() if fused else pipe.jit_forward()
        # Headline program: the full declared chain incl. the three spectra.
        fn_full = (pipe.jit_forward_frames_spectra() if fused
                   else pipe.jit_forward_spectra())
    fused = fused or use_cat  # both emit frame-major z
    n_out = cfg.src.output_length(n)
    log(f"device: {jax.devices()[0]}  path="
        f"{'cat' if use_cat else 'frames' if fused else 'flat'}")

    # Measurement rules for this backend (utils/benchmarking.py):
    #   1. identical input buffers hit an execution cache -> every timed
    #      call gets a fresh batch;
    #   2. block_until_ready returns before the device finishes -> force
    #      completion by fetching a scalar reduction of the output;
    #   3. fetch round trips dominate single calls -> batch-size
    #      differential cancels them.
    from dsp_audio_project_tpu.utils.benchmarking import (
        measure_batched_differential,
    )

    rng = np.random.default_rng(7)

    def make_batch(b):
        xs = np.stack([
            (x + 0.01 * rng.standard_normal(n)).astype(np.float32)
            for _ in range(b)
        ])
        v = jax.device_put(jnp.asarray(xs))
        v.block_until_ready()
        return (v,)

    def build_fn(b):
        def run(v):
            z, _ = fn(v, FS)
            return jnp.sum(z)
        return jax.jit(run)

    def build_fn_full(b):
        def run(v):
            z, _, (mx, my, mz) = fn_full(v, FS)
            return jnp.sum(z) + jnp.sum(mx) + jnp.sum(my) + jnp.sum(mz)
        return jax.jit(run)

    t0 = time.perf_counter()
    z, y = fn(jnp.asarray(x), FS)
    z.block_until_ready()
    log(f"compile+first-run: {time.perf_counter() - t0:.2f}s")

    def to_flat(arr):
        a = np.asarray(arr)
        return a.reshape(-1)[:n_out] if fused else a

    # Profiler device timeline is the stable ground truth (wall clock through
    # the remote tunnel carries multi-x jitter); the batch-size differential
    # is the fallback when tracing is unavailable.
    dt = dt_full = None
    # Two distinct resident batches: warm on one, profile on the other (the
    # execution cache keys on (fn, args)); reusing them across the timed
    # programs keeps host->device traffic down — each fresh batch is an
    # 85 MB upload, which dominates wall time on a tunneled device.
    batch_warm = make_batch(8)
    batch_prof = make_batch(8)
    try:
        from dsp_audio_project_tpu.utils.deviceprof import profile_device_ops

        B_prof = 8
        f_prof = build_fn(B_prof)
        float(f_prof(*batch_warm))  # warm
        total_ms, _ = profile_device_ops(f_prof, *batch_prof)
        if total_ms > 0:
            dt = total_ms / 1e3 / B_prof
            log(f"profiler device time (src+eq): {dt*1e3:.3f} ms per signal")
        f_full = build_fn_full(B_prof)
        float(f_full(*batch_warm))  # warm
        total_ms, _ = profile_device_ops(f_full, *batch_prof)
        if total_ms > 0:
            dt_full = total_ms / 1e3 / B_prof
            log(f"profiler device time (full chain): {dt_full*1e3:.3f} ms "
                f"per signal")
    except Exception as e:  # pragma: no cover
        log(f"profiler unavailable ({e})")
    if dt is None:
        dt = measure_batched_differential(build_fn, make_batch, sizes=(2, 6),
                                          reps=2)
        log(f"batched differential (src+eq): {dt*1e3:.3f} ms per signal")
    if dt_full is None:
        dt_full = measure_batched_differential(
            build_fn_full, make_batch, sizes=(2, 6), reps=2
        )
        log(f"batched differential (full): {dt_full*1e3:.3f} ms per signal")
    dt_full = max(dt_full, dt)  # spectra can't take negative time
    sps = n / dt
    sps_full = n / dt_full
    log(f"tpu src+eq: {dt*1e3:.3f} ms per {SECONDS:.0f}s-signal "
        f"-> {sps/1e6:.1f} M samples/s/chip")
    log(f"tpu full chain (src+eq+spectra x/y/z): {dt_full*1e3:.3f} ms per "
        f"{SECONDS:.0f}s-signal -> {sps_full/1e6:.1f} M samples/s/chip")
    z, y = fn(jnp.asarray(x), FS)

    # Accuracy vs oracle (fft engine: identical math to ~1e-13, tractable).
    want, fs_want = pipeline_oracle(x, FS, cfg.src, cfg.eq, engine="fast")
    q = snr_db(want, to_flat(z))
    log(f"output snr vs reference oracle: {q:.1f} dB (gate 60)")

    # Spectrum accuracy: the three per-render magnitude spectra vs the
    # oracle's (app.py:202-205 semantics — analysis cap then center window).
    try:
        from dsp_audio_project_tpu.oracle import resample_oracle, spectrum_oracle

        _, _, (mx, my, mz) = fn_full(jnp.asarray(x), FS)
        y_want, _ = resample_oracle(x, FS, cfg.src, engine="fast")
        cap = cfg.spectrum.analysis_limit
        qs = min(
            snr_db(spectrum_oracle(x[:cap], FS)[1], np.asarray(mx)),
            snr_db(spectrum_oracle(y_want[:cap], fs_want)[1], np.asarray(my)),
            snr_db(spectrum_oracle(want[:cap], fs_want)[1], np.asarray(mz)),
        )
        log(f"spectra snr vs reference oracle (min of x/y/z): {qs:.1f} dB "
            f"(gate 60)")
    except Exception as e:  # pragma: no cover
        log(f"spectrum snr check unavailable ({e})")

    # Dynamic-gains serving path: gains as traced arrays, operators prebuilt
    # per gain change (the serving split) — the reference's slider model.
    try:
        names = [nm for nm, _ in cfg.eq.band_centers]
        gains_arr = jnp.asarray(
            [float(GAINS.get(nm, 0.0)) for nm in names], jnp.float32
        )
        fwd_dyn = pipe.jit_forward_frames_dynamic_ops()
        dyn_ops = pipe.dynamic_eq_operators(gains_arr, FS, n)
        jax.block_until_ready(dyn_ops)

        def build_fn_dyn(b):
            def run(v):
                z, _ = fwd_dyn(v, dyn_ops, FS)
                return jnp.sum(z)
            return jax.jit(run)

        from dsp_audio_project_tpu.utils.deviceprof import profile_device_ops

        B_prof = 8
        f_dyn = build_fn_dyn(B_prof)
        float(f_dyn(*batch_warm))  # warm
        total_ms, _ = profile_device_ops(f_dyn, *batch_prof)
        if total_ms > 0:
            dt_dyn = total_ms / 1e3 / B_prof
            log(f"dynamic-gains chain (prebuilt ops): {dt_dyn*1e3:.3f} ms per "
                f"signal -> {n/dt_dyn/1e6:.1f} M samples/s/chip")

        # Dynamic-gains CAT serving (round 5): banks rebuilt on device per
        # gain change, per-batch at the static cat rate.
        if use_cat:
            try:
                banks_dyn = pipe.dynamic_cat_tables(dyn_ops)
                jax.block_until_ready(banks_dyn)
                fwd_dc = pipe.jit_forward_cat_dynamic_ops()
                f_dc = jax.jit(
                    lambda v: jnp.sum(fwd_dc(v, dyn_ops, banks_dyn, FS))
                )
                float(f_dc(*batch_warm))
                total_ms, _ = profile_device_ops(f_dc, *batch_prof)
                if total_ms > 0:
                    dt_dc = total_ms / 1e3 / B_prof
                    log(f"dynamic-gains CAT chain (device-rebuilt banks): "
                        f"{dt_dc*1e3:.3f} ms per signal -> "
                        f"{n/dt_dc/1e6:.1f} M samples/s/chip")
                bank_ms, _ = profile_device_ops(
                    lambda o: jax.tree.map(
                        jnp.sum, pipe.dynamic_cat_tables(o)), dyn_ops,
                )
                log(f"dynamic cat bank rebuild (per gain change): "
                    f"{bank_ms:.3f} ms device")
                zdc = fwd_dc(jnp.asarray(x), dyn_ops, banks_dyn, FS)
                qdc = snr_db(want, np.asarray(zdc).reshape(-1)[:n_out])
                log(f"dynamic-gains CAT output snr vs oracle: {qdc:.1f} dB "
                    f"(gate 60)")
            except Exception as e:  # pragma: no cover
                log(f"dynamic cat bench unavailable ({e})")
        # Builder cost (runs once per gain change, amortized across batches).
        # Serving uses the host-float64 builder (gains are concrete values);
        # the traced in-graph builder remains for jit-input gains.
        gains_np = np.asarray(gains_arr)

        def f_build_host(g):
            return pipe.dynamic_eq_operators(g, FS, n, builder="host")

        jax.block_until_ready(f_build_host(gains_np))  # warm the expand jit
        reps, t0 = 5, time.perf_counter()
        for r in range(reps):
            jax.block_until_ready(f_build_host(gains_np + 0.5 * (r + 1)))
        host_ms = (time.perf_counter() - t0) / reps * 1e3
        build_dev_ms, _ = profile_device_ops(f_build_host, gains_np + 11.0)
        log(f"dynamic operator build, host builder (per gain change): "
            f"{host_ms:.3f} ms wall, {build_dev_ms:.3f} ms device")

        def f_build(g):
            return jax.tree.map(jnp.sum, pipe.dynamic_eq_operators(
                g, FS, n, builder="traced"))
        jax.block_until_ready(f_build(gains_arr))
        build_ms, _ = profile_device_ops(f_build, gains_arr + 1.0)
        log(f"dynamic operator build, traced builder: {build_ms:.3f} ms "
            f"device")
        cyc = 8 * dt * 1e3
        eff = cyc / (cyc + build_dev_ms) * 100.0
        log(f"change+batch-8 cycle at host-built ops: {eff:.1f}% of "
            f"steady-state device throughput")
        # Decompose the per-gain-change cost into host-numpy / upload /
        # expand-dispatch so the cycle claim has a tunnel-independent basis
        # (the wall figure above rides the remote tunnel's latency).
        from dsp_audio_project_tpu.ops.eq_dynamic import (
            _expand_dyn_operators, host_dyn_tables, upload_dyn_tables,
        )

        fs_out_b = cfg.src.output_rate(FS)
        U_g, G_g, K_g = pipe.dynamic_eq_geometry(FS, n)
        reps = 5
        t0 = time.perf_counter()
        tabs = None
        for r in range(reps):
            tabs = host_dyn_tables(gains_np + 0.5 * (r + 1), fs_out_b,
                                   cfg.eq, U_g, G_g, K_g)
        t_host = (time.perf_counter() - t0) / reps * 1e3
        t0 = time.perf_counter()
        for _ in range(reps):
            dev_tabs = upload_dyn_tables(tabs)
            jax.block_until_ready([t for t in dev_tabs if t is not None])
        t_up = (time.perf_counter() - t0) / reps * 1e3
        jax.block_until_ready(_expand_dyn_operators(*dev_tabs))  # warm
        t0 = time.perf_counter()
        for _ in range(reps):
            jax.block_until_ready(_expand_dyn_operators(*dev_tabs))
        t_exp = (time.perf_counter() - t0) / reps * 1e3
        up_bytes = sum(
            int(np.prod(t.shape)) * 4 for t in dev_tabs if t is not None
        )
        log(f"dynamic builder decomposition (per gain change): host numpy "
            f"{t_host:.3f} ms, upload {t_up:.3f} ms wall ({up_bytes/1e6:.2f} "
            f"MB), expand dispatch {t_exp:.3f} ms wall / {build_dev_ms:.3f} "
            f"ms device")
        # Tunnel-independent serving estimate: host compute + device expand
        # (+ upload at PCIe-class bandwidth, negligible at this size).  Two
        # framings: fully-serial (host build blocks the device) and
        # pipelined (a server overlaps the next change's host numpy with
        # the current batch; only the device expand serializes).
        local_change_ms = t_host + build_dev_ms
        cyc_eff_local = cyc / (cyc + local_change_ms) * 100.0
        cyc_eff_pipe = cyc / (cyc + max(build_dev_ms, t_host - cyc)) * 100.0
        log(f"tunnel-independent change cost ~{local_change_ms:.3f} ms "
            f"(host {t_host:.3f} + device {build_dev_ms:.3f}) -> "
            f"change+batch-8 cycle {cyc_eff_local:.1f}% serial, "
            f"{cyc_eff_pipe:.1f}% with host build pipelined")
        # MEASURED pipelined cycle (round-5 VERDICT item 6): actually run
        # the overlapped loop — dispatch batch k async, build gain k+1's
        # host tables during it, fetch, then upload+expand — and compare
        # its device span to the steady loop's.  (Full harness with wall
        # figures: scripts/dyn_pipeline.py.)
        try:
            from dsp_audio_project_tpu.utils.deviceprof import (
                profile_device_span,
            )

            run_b = jax.jit(lambda v: jnp.sum(fwd_dyn(v, dyn_ops, FS)[0]))
            float(run_b(*batch_warm))
            cycles_m = 3

            def steady_thunk():
                for _ in range(cycles_m):
                    float(run_b(*batch_warm))

            ms_steady, _ = profile_device_span(steady_thunk)

            r2 = jax.jit(lambda v, oo: jnp.sum(fwd_dyn(v, oo, FS)[0]))
            o_start = f_build_host(gains_np)
            jax.block_until_ready(o_start)
            float(r2(*batch_warm, o_start))   # warm outside the span

            def pipe_thunk():
                o = o_start
                for k in range(cycles_m):
                    out = r2(*batch_warm, o)      # async dispatch
                    tabs = host_dyn_tables(
                        gains_np + 0.25 * (k + 1), fs_out_b, cfg.eq,
                        U_g, G_g, K_g,
                    )                             # overlaps device exec
                    float(out)
                    o = _expand_dyn_operators(*upload_dyn_tables(tabs))
                    jax.block_until_ready(o)

            ms_pipe, _ = profile_device_span(pipe_thunk)
            if ms_steady > 0 and ms_pipe > 0:
                log(f"MEASURED pipelined serving cycle: steady "
                    f"{ms_steady/cycles_m:.3f} ms vs overlapped "
                    f"{ms_pipe/cycles_m:.3f} ms device per "
                    f"change+batch-8 -> {ms_steady/ms_pipe*100:.1f}% "
                    f"measured cycle efficiency")
        except Exception as e:  # pragma: no cover
            log(f"measured pipelined cycle unavailable ({e})")
        zd, _ = fwd_dyn(jnp.asarray(x), dyn_ops, FS)
        qd = snr_db(want, np.asarray(zd).reshape(-1)[:n_out])
        log(f"dynamic-gains output snr vs oracle: {qd:.1f} dB (gate 60)")
        zdh, _ = fwd_dyn(jnp.asarray(x), f_build_host(gains_np), FS)
        qdh = snr_db(want, np.asarray(zdh).reshape(-1)[:n_out])
        log(f"dynamic-gains (host-built ops) snr vs oracle: {qdh:.1f} dB "
            f"(gate 60)")
    except Exception as e:  # pragma: no cover
        log(f"dynamic path bench unavailable ({e})")

    # Streaming steady-state (BASELINE config 5): ShardedStreamProcessor on
    # a 1x1 mesh, 8 channels as the batch, Pallas fused super-steps with the
    # carry resident on device.  Device time via profile_device_span (sums
    # every super-step program); wall time reported for context only (the
    # remote tunnel dominates it).
    stream_sps = None
    try:
        from dsp_audio_project_tpu.config import MeshConfig
        from dsp_audio_project_tpu.parallel.mesh import build_mesh
        from dsp_audio_project_tpu.streaming import ShardedStreamProcessor
        from dsp_audio_project_tpu.utils.deviceprof import profile_device_span

        mesh1 = build_mesh(MeshConfig(channel_devices=1, block_devices=1))
        C_st = 8
        # Super-step size from the round-5 sweep (scripts/stream_sweep.py,
        # cat super-steps + AUTO output layouts): the kernel's per-launch
        # fixed cost (operator-bank DMA ~34 MB) amortizes with step size —
        # FL=4096 measured 90% of one-shot, 8192 95.5%, 12288 **103.5%**
        # (streaming skips the one-shot's signal-edge padding waste);
        # 16384 regresses to 92% on the XLA staging refission (STATUS r5).
        FL = 12288                      # frames per super-step
        sec_st = 240.0                  # 5 steps -> 4 measured steady-state
        n_st = int(sec_st * FS)
        x_st = make_signal(n_st, FS)
        sp_st = ShardedStreamProcessor(cfg, FS, mesh1, C_st,
                                       frames_per_shard=FL)
        in_step = FL * sp_st._s         # input samples per channel per step
        xs_mc = np.stack(
            [x_st] + [
                (x_st + 0.01 * rng.standard_normal(n_st)).astype(np.float32)
                for _ in range(C_st - 1)
            ]
        )
        n_steps = n_st // in_step
        outs_st = [sp_st.process(xs_mc[:, :in_step])]   # compiles + warms
        log(f"streaming: fused={sp_st._fused} super-step={FL} frames "
            f"({in_step} in-samples/ch), {n_steps} steps over a "
            f"{sec_st:.0f} s signal, carry on device")

        def stream_thunk():
            for i in range(1, n_steps):
                outs_st.append(
                    sp_st.process(xs_mc[:, i * in_step : (i + 1) * in_step])
                )
            return outs_st[-1]

        t0 = time.perf_counter()
        st_ms, _ = profile_device_span(stream_thunk)
        st_wall = (time.perf_counter() - t0) * 1e3
        steps_done = n_steps - 1
        if st_ms > 0:
            stream_sps = steps_done * C_st * in_step / (st_ms / 1e3)
            pct = stream_sps / sps * 100.0
            log(f"streaming steady-state: {st_ms/steps_done:.3f} ms device "
                f"per super-step -> {stream_sps/1e9:.2f} G input "
                f"samples/s/chip ({pct:.1f}% of one-shot src+eq); wall "
                f"{st_wall/steps_done:.1f} ms/step (tunnel-dominated)")
        # SNR gate on the streamed output (channel 0 is the pure signal).
        z_st = np.concatenate(outs_st, axis=1)
        want_st, _ = pipeline_oracle(
            x_st[: min(n_st, (z_st.shape[1] * cfg.src.M) // cfg.src.L
                       + cfg.src.num_taps)],
            FS, cfg.src, cfg.eq, engine="fast",
        )
        q_st = snr_db(want_st[: z_st.shape[1]], z_st[0])
        log(f"streaming output snr vs oracle: {q_st:.1f} dB (gate 60)")
    except Exception as e:  # pragma: no cover
        log(f"streaming bench unavailable ({e})")

    # Reference-algorithm baseline on host CPU.  The reference's direct
    # full-rate convolution is O(N*L*T) and linear in N, so time a short
    # window and report per-sample throughput (running it on the full 10 s
    # would take minutes).
    n_ref = 4096
    t0 = time.perf_counter()
    z_ref, fs_ref = pipeline_oracle(x[:n_ref], FS, cfg.src, cfg.eq,
                                    engine="direct")
    ref_dt = time.perf_counter() - t0
    t0 = time.perf_counter()
    from dsp_audio_project_tpu.oracle import spectrum_oracle as _spec_oracle
    for sig, r in ((x[:n_ref], FS), (z_ref, fs_ref), (z_ref, fs_ref)):
        _spec_oracle(sig, r)
    ref_dt_full = ref_dt + (time.perf_counter() - t0)
    ref_sps = n_ref / ref_dt_full
    log(f"reference algorithm (host cpu, {n_ref} samples, incl. spectra): "
        f"{ref_dt_full*1e3:.1f} ms -> {ref_sps/1e6:.3f} M samples/s")

    # "extra" rides the one JSON line so downstream harnesses can pick the
    # denominator that matches THEIR workload: scripts/pod_scaling.py times
    # SRC+EQ only, so it reads extra.src_eq_ms_per_60s_signal instead of
    # back-deriving a (full-chain) time from the headline metric.
    print(json.dumps({
        "metric": "src_eq_fft_chain_input_samples_per_sec_per_chip",
        "value": round(sps_full, 1),
        "unit": "samples/s",
        "vs_baseline": round(sps_full / ref_sps, 2),
        "extra": {
            "src_eq_ms_per_60s_signal": round(dt * 1e3, 4),
            "full_chain_ms_per_60s_signal": round(dt_full * 1e3, 4),
            **({"streaming_samples_per_sec_per_chip": round(stream_sps, 1)}
               if stream_sps else {}),
        },
    }))


if __name__ == "__main__":
    main()
