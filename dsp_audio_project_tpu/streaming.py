"""Streaming / long-form processing with explicit, serializable carry state.

The reference processes whole signals in one shot (its only length management
is a UI window, SURVEY.md §5).  Production long-form audio needs chunked
processing whose results are bit-consistent with the one-shot pipeline and
which can checkpoint/resume mid-stream.  The carry is tiny and explicit:

  * SRC: the polyphase frame grid position (one sample counter) plus the
    input halo the next chunk's frames reach back into (~W samples).
  * EQ:  the cascade state (2 values per active band) — see ops/eq.

``StreamProcessor.process(chunk)`` returns every output sample that is
finalized given the input so far; ``flush()`` emits the centered-'same' tail
that depends on zero-padding beyond the stream end.  ``state_bytes`` /
``load_state`` serialize the carry with the stream offsets for resume
(SURVEY.md §5 checkpoint/resume).

Chunk-invariance (any chunking == one-shot, to float32 rounding) is gated in
tests/test_streaming.py.
"""
from __future__ import annotations

import dataclasses
import io
import json
from typing import Optional

import jax.numpy as jnp
import numpy as np

from .config import PipelineConfig
from .ops import eq as eq_ops
from .ops.src import PolyphasePlan, _resample_frames, make_plan


@dataclasses.dataclass
class StreamState:
    """Serializable carry for a paused stream.

    ``d`` records the EQ state dimension the carry was captured under and
    ``gains_db`` the active dynamic gain vector (None for static-gains
    streams), so a resume can validate the carry's basis instead of
    silently reinterpreting it under different operators.
    """

    samples_in: int          # total input samples consumed
    frames_done: int         # polyphase frames fully emitted
    src_carry: np.ndarray    # input tail the next frames reach into
    eq_state: np.ndarray     # cascade state (d,) or empty
    fs: int
    d: Optional[int] = None          # EQ state dim at capture
    gains_db: Optional[list] = None  # dynamic gains at capture

    def to_bytes(self) -> bytes:
        buf = io.BytesIO()
        meta = dict(samples_in=self.samples_in, frames_done=self.frames_done,
                    fs=self.fs, d=self.d, gains_db=self.gains_db)
        head = json.dumps(meta).encode()
        buf.write(len(head).to_bytes(4, "little"))
        buf.write(head)
        np.save(buf, self.src_carry, allow_pickle=False)
        np.save(buf, self.eq_state, allow_pickle=False)
        return buf.getvalue()

    @staticmethod
    def from_bytes(data: bytes) -> "StreamState":
        buf = io.BytesIO(data)
        hlen = int.from_bytes(buf.read(4), "little")
        meta = json.loads(buf.read(hlen).decode())
        meta.setdefault("d", None)          # pre-round-5 payloads
        meta.setdefault("gains_db", None)
        src_carry = np.load(buf, allow_pickle=False)
        eq_state = np.load(buf, allow_pickle=False)
        return StreamState(src_carry=src_carry, eq_state=eq_state, **meta)


class StreamProcessor:
    """Chunked SRC->EQ processing, bit-consistent with the one-shot chain.

    Usage:
        sp = StreamProcessor(PipelineConfig(...), fs=44100)
        for chunk in chunks:
            out.append(sp.process(chunk))
        out.append(sp.flush())
    """

    def __init__(self, config: PipelineConfig, fs: int,
                 state: Optional[StreamState] = None):
        self.config = config
        self.fs = int(fs)
        self.fs_out = config.src.output_rate(self.fs)
        src = config.src
        self._plan: Optional[PolyphasePlan] = (
            None if src.bypass
            else make_plan(src.L, src.M, src.taps_rule_factor)
        )
        if state is not None:
            if state.fs != self.fs:
                raise ValueError("state was captured at a different rate")
            self._samples_in = state.samples_in
            self._frames_done = state.frames_done
            self._src_carry = state.src_carry.copy()
            self._eq_state = (
                jnp.asarray(state.eq_state) if state.eq_state.size else None
            )
        else:
            self._samples_in = 0
            self._frames_done = 0
            self._src_carry = np.zeros(0, dtype=np.float32)
            self._eq_state = None
        self._flushed = False

    # -- state ------------------------------------------------------------
    @property
    def state(self) -> StreamState:
        eq_state = (
            np.asarray(self._eq_state)
            if self._eq_state is not None
            else np.zeros(0, dtype=np.float32)
        )
        return StreamState(
            samples_in=self._samples_in,
            frames_done=self._frames_done,
            src_carry=self._src_carry.copy(),
            eq_state=eq_state,
            fs=self.fs,
        )

    def state_bytes(self) -> bytes:
        return self.state.to_bytes()

    @staticmethod
    def resume(config: PipelineConfig, data: bytes) -> "StreamProcessor":
        st = StreamState.from_bytes(data)
        return StreamProcessor(config, st.fs, state=st)

    # -- processing -------------------------------------------------------
    def process(self, chunk: np.ndarray) -> np.ndarray:
        """Consume a chunk, return finalized output samples."""
        if self._flushed:
            raise RuntimeError("stream already flushed")
        chunk = np.asarray(chunk, dtype=np.float32)
        if self.config.src.bypass:
            y = chunk
            self._samples_in += len(chunk)
            return self._run_eq(y)
        return self._run_eq(self._src_chunk(chunk, final=False))

    def flush(self) -> np.ndarray:
        """Emit the remaining tail (zero-extension beyond the stream end)."""
        if self._flushed:
            return np.zeros(0, dtype=np.float32)
        self._flushed = True
        if self.config.src.bypass:
            return np.zeros(0, dtype=np.float32)
        return self._run_eq(self._src_chunk(np.zeros(0, np.float32), final=True))

    def _src_chunk(self, chunk: np.ndarray, final: bool) -> np.ndarray:
        """Polyphase SRC over [carry + chunk], emitting finalized frames.

        A frame k covers input [k*s + lo, k*s + lo + W); it is finalized once
        the stream holds samples beyond its window (or at flush, where the
        'same' zero extension applies).  ``_src_carry`` holds the stream tail
        from absolute position carry_start = samples_in - len(carry).
        """
        plan = self._plan
        src = self.config.src
        n_prev = self._samples_in
        self._samples_in += len(chunk)
        n_total = self._samples_in

        if final and 0 < n_total * src.L < src.num_taps:
            # Stream shorter than the filter: the centered-'same' geometry
            # differs (see ops/src.resample); no frames were finalizable yet,
            # so the carry still holds the whole stream — run one-shot.
            assert self._frames_done == 0
            short_plan = make_plan(
                src.L, src.M, src.taps_rule_factor, (n_total * src.L - 1) // 2
            )
            n_out = -(-src.num_taps // src.M)
            y = np.asarray(
                _resample_frames(jnp.asarray(self._src_carry), short_plan,
                                 n_total, n_out)
            )
            self._frames_done = -(-n_out // short_plan.P)
            return y

        total_out = src.output_length(n_total) if n_total else 0
        total_frames_avail = -(-total_out // plan.P)
        if final:
            new_last_frame = total_frames_avail  # emit everything
        elif n_total * src.L < src.num_taps:
            # The stream might still end shorter than the filter, which
            # would retroactively switch to the short-signal 'same' geometry
            # — nothing is stable yet.
            new_last_frame = 0
        else:
            # frame k finalized iff k*s + lo + W <= n_total
            new_last_frame = max(
                0, min(total_frames_avail,
                       (n_total - plan.lo - plan.W) // plan.s + 1)
            )
        k0 = self._frames_done
        if new_last_frame <= k0:
            self._append_carry(chunk)
            return np.zeros(0, dtype=np.float32)

        # Build the input span frames [k0, new_last_frame) touch:
        # absolute positions [k0*s + lo, (new_last_frame-1)*s + lo + W).
        lo_abs = k0 * plan.s + plan.lo
        hi_abs = (new_last_frame - 1) * plan.s + plan.lo + plan.W
        carry_start = n_prev - len(self._src_carry)
        stream = np.concatenate([self._src_carry, chunk])

        def span(a: int, b: int) -> np.ndarray:
            # stream positions [a, b) with zero extension on both sides
            out = np.zeros(b - a, dtype=np.float32)
            s0, s1 = max(a, carry_start), min(b, n_total)
            if s1 > s0:
                out[s0 - a : s1 - a] = stream[s0 - carry_start : s1 - carry_start]
            return out

        x_span = span(lo_abs, hi_abs)
        # Frames within the span: local frame j = global k0 + j at offset
        # j*s within x_span.  Reuse the one-shot frame matmul with a local
        # plan view by slicing via indices directly:
        num_frames = new_last_frame - k0
        idx = (
            np.arange(num_frames, dtype=np.int64)[:, None] * plan.s
            + np.arange(plan.W, dtype=np.int64)[None, :]
        )
        frames = jnp.take(jnp.asarray(x_span), jnp.asarray(idx), axis=0)
        from .utils.precision import einsum_f32

        g_mat = jnp.asarray(plan.G, dtype=jnp.float32)
        y = np.asarray(
            einsum_f32("kw,wp->kp", frames, g_mat).reshape(-1)
        )
        # Trim to the true output count in [k0*P, min(new_last*P, total_out)).
        emit_upto = min(new_last_frame * plan.P, total_out)
        y = y[: emit_upto - k0 * plan.P]
        self._frames_done = new_last_frame
        self._append_carry(chunk)
        return y

    def _append_carry(self, chunk: np.ndarray) -> None:
        if self._plan is None:
            return
        keep = max(
            0,
            self._samples_in - (self._frames_done * self._plan.s + self._plan.lo),
        )
        keep = min(keep + 8, self._samples_in)  # small slack, bounded by stream
        stream_tail = np.concatenate([self._src_carry, chunk])
        self._src_carry = stream_tail[max(0, len(stream_tail) - keep):]

    def _run_eq(self, y: np.ndarray) -> np.ndarray:
        if len(y) == 0:
            return y
        cfg = self.config.eq
        if cfg.bypass:
            return y
        z, st = eq_ops.equalize_stream(
            jnp.asarray(y), self.fs_out, cfg, self._eq_state,
            block=self.config.kernels.iir_block,
        )
        self._eq_state = st
        return np.asarray(z)


class ShardedStreamProcessor:
    """Chunked SRC->EQ over a (channel, block) device mesh.

    BASELINE config 5 ("long-form multichannel stream on N hosts"): composes
    ``StreamProcessor``'s chunk semantics with ``parallel/pipeline.py``'s
    sharding.  Input chunks of ANY size buffer on host; whenever the stream
    covers a full super-step of ``mesh_block * frames_per_shard`` finalized
    polyphase frames, the step runs as ONE shard_map'd program over the mesh:

      * SRC: the step's input span is sharded in equal frame-aligned slices;
        each device's last frames read ``W - s`` neighbor samples, exchanged
        with a shift-by-one ``ppermute`` (the last device takes the real
        stream tail, passed as a replicated side input, instead of zeros).
      * EQ: each shard runs the grouped block recurrence from a zero state;
        one tiny ``all_gather`` of per-shard end states + the stream's
        incoming carry ``sigma_in`` reconstructs every shard's true entry
        state (the same fused-state algebra as the one-shot sharded path,
        extended with the A^{shard*d} sigma_in term), and the replicated
        outgoing carry is returned for the next super-step.

    Output equals ``StreamProcessor`` / the one-shot unsharded chain for any
    chunking x any mesh (gated >= 110 dB in tests/test_streaming.py and in
    the driver dryrun); carry state serializes through the same
    ``StreamState`` container, so checkpoint/resume works mid-stream.

    One compiled executable serves the whole stream regardless of chunk
    sizes (chunks buffer to fixed super-steps — the serving-friendly shape).

    Round-4 serving upgrades:

    * **Fused super-steps** (``fused=None`` auto-selects on TPU or in
      interpret mode): the per-shard SRC runs the production Pallas
      class/shear kernel and the EQ consumes its frames at unroll = P —
      no lane retile; fused steps emit frame-major output whose flat view
      is free on host.
    * **Device-resident carry**: the EQ state never round-trips to host
      between super-steps; ``process``/``flush`` dispatch every ready step
      back to back and fetch afterwards, so step k+1's upload and launch
      overlap step k's execution and fetch.
    * **Dynamic gains** (construct with ``gains_db=[...]``): the EQ
      operators become traced inputs of the compiled step
      (ops/eq_dynamic.DynStreamOperators, host-float64 builder);
      ``set_gains`` swaps them at a super-step boundary with zero
      recompile, the carry passing through the change un-reset (the
      live-lfilter slider model, app.py:158-167, applied mid-stream).
    """

    def __init__(
        self,
        config: PipelineConfig,
        fs: int,
        mesh,
        channels: int,
        frames_per_shard: Optional[int] = None,
        state: Optional[StreamState] = None,
        fused: Optional[bool] = None,
        gains_db=None,
    ):
        import jax

        from .parallel.mesh import BLOCK_AXIS, CHANNEL_AXIS

        self.config = config
        self.fs = int(fs)
        self.fs_out = config.src.output_rate(self.fs)
        self.mesh = mesh
        self._nb = mesh.shape[BLOCK_AXIS]
        self._mc = mesh.shape[CHANNEL_AXIS]
        self.channels = int(channels)
        self._c_pad = -(-self.channels // self._mc) * self._mc
        src = config.src
        self._plan = (
            None if src.bypass
            else make_plan(src.L, src.M, src.taps_rule_factor)
        )
        p = self._plan
        self._P = p.P if p else 1
        self._s = p.s if p else 1
        self._W = p.W if p else 1
        self._lo = p.lo if p else 0
        self._hr = max(0, self._W - self._s)

        # Fused super-step: the per-shard SRC runs the production Pallas
        # class/shear kernel (kernels.fir_frames) and the EQ consumes its
        # frames directly at unroll = P — the streaming twin of
        # parallel/pipeline.build_sharded_pipeline(fused=True).  Same auto
        # rule: on where the plan supports it and Pallas can run (TPU, or
        # interpret mode anywhere).  Off (the XLA shifted-matmul path), the
        # EQ reads the FLAT per-shard output at the standard unroll 128.
        if fused is None:
            fused = (
                p is not None
                and p.s >= 8
                and (config.kernels.interpret
                     or jax.default_backend() == "tpu")
            )
        if fused and (p is None or p.s < 8):
            raise ValueError("fused streaming requires SRC with stride s >= 8")
        self._fused = bool(fused)

        bands = config.eq.active_bands(self.fs_out)
        self._dynamic = gains_db is not None
        self._eq_active = self._dynamic or (
            (not config.eq.bypass) and bool(bands)
        )
        # EQ-fused cat super-steps (round 5): the rect FIR kernel emits
        # [y0 | packed inj] per shard, skipping the frames HBM round trip
        # inside every super-step (kernels/fir_class cat section).  Needs
        # static gains (the fold bakes the EQ weights into the operator
        # banks), an active EQ, the rect geometry, and one kernel
        # precision covering both folded stages.
        from .kernels.fir_class import rect_supported

        cat_ok = (
            self._fused and self._eq_active
            and p is not None and rect_supported(p)
            and bool(config.kernels.src_fast) == bool(config.kernels.eq_fast)
        )
        fpb = max(1, -(-config.kernels.iir_block // self._P))
        fpb = -(-fpb // 16) * 16
        if cat_ok:
            # The packed-inj layout groups frames by the kernel's 128-frame
            # supers; align the EQ block to a multiple of that — but only
            # when the caller's explicit frames_per_shard stays a multiple
            # of it (a pre-round-5 value like 64 must keep working: cat
            # simply stays off there).
            fpb_cat = max(128, -(-fpb // 128) * 128)
            if frames_per_shard is None or frames_per_shard % fpb_cat == 0:
                fpb = fpb_cat
            else:
                cat_ok = False
        self._fpb = fpb
        # Requested unroll: P on the fused frame-major path (frames feed the
        # EQ directly), 128 on the flat path.  The static builder halves it
        # until it divides the block; the dynamic builder needs it exact.
        self._U = self._P if self._fused else 128
        if not self._fused:
            while (fpb * self._P) % self._U:
                self._U //= 2
        if frames_per_shard is None:
            frames_per_shard = fpb
        if frames_per_shard % fpb:
            raise ValueError(
                f"frames_per_shard {frames_per_shard} must be a multiple of "
                f"the EQ block's frame count {fpb}"
            )
        self._fl = frames_per_shard
        self._K_loc = self._fl // fpb
        self._F_sup = self._nb * self._fl
        # Sub-1024-frame steps would pay the kernel's padded grid (it
        # computes ceil(fl/1024)*1024 frames); keep them on the unfused EQ.
        # Dynamic mode runs the same fused kernel with device-rebuilt
        # banks (ops/eq_dynamic.build_cat_banks_dyn) as a traced input.
        self._cat = cat_ok and not self._dynamic and self._fl % 1024 == 0
        self._cat_dyn = cat_ok and self._dynamic and self._fl % 1024 == 0
        self._dbanks = None

        if self._dynamic:
            # Dynamic-gains serving mode: the EQ operators are a traced
            # input of the compiled super-step, so set_gains() swaps them
            # at any super-step boundary WITHOUT recompiling.  All bands
            # stay active (gain 0 == identity) so d — and the compiled
            # shapes — are gain-independent.
            self._d = 2 * len(config.eq.band_centers)
            self._ops = None
            self._gains = np.asarray(gains_db, np.float64).reshape(-1)
            if self._gains.shape[0] != len(config.eq.band_centers):
                raise ValueError(
                    f"expected {len(config.eq.band_centers)} gains, got "
                    f"{self._gains.shape[0]}"
                )
            self._dops = self._build_dyn_operators(self._gains)
        else:
            self._ops = (
                eq_ops.make_block_operators(
                    bands, self.fs_out, config.eq.q, fpb * self._P, self._U
                )
                if self._eq_active else None
            )
            self._d = self._ops.A.shape[0] if self._eq_active else 0
            self._dops = None

        if state is not None:
            if state.fs != self.fs:
                raise ValueError("state was captured at a different rate")
            if state.d is not None and state.d != self._d:
                raise ValueError(
                    f"stream state carries an EQ basis of dimension "
                    f"{state.d} but this processor's configuration has "
                    f"d={self._d} — resume with the same EQ config (and, "
                    f"for dynamic mode, pass gains_db; the captured gains "
                    f"are state.gains_db)"
                )
            self._samples_in = state.samples_in
            self._frames_done = state.frames_done
            self._buf = np.array(state.src_carry, dtype=np.float32)
            if self._buf.ndim == 1:
                self._buf = self._buf[None].repeat(self.channels, 0)
            eqs = np.asarray(state.eq_state, dtype=np.float32)
            if eqs.size and eqs.size != self.channels * self._d:
                raise ValueError(
                    f"stream state eq carry has {eqs.size} values; this "
                    f"configuration needs channels*d = "
                    f"{self.channels}*{self._d} — the state was captured "
                    f"under a different EQ config or channel count"
                )
            self._sigma = (
                eqs.reshape(self.channels, self._d)
                if eqs.size else np.zeros((self.channels, 0), np.float32)
            )
        else:
            self._samples_in = 0
            self._frames_done = 0
            self._buf = np.zeros((self.channels, 0), dtype=np.float32)
            self._sigma = np.zeros((self.channels, self._d), np.float32)
        self._flushed = False
        self._fn = None  # jitted shard_map step, built lazily
        # The carry stays ON DEVICE between super-steps (self._sigma_dev):
        # fetching it per step would serialize dispatch on a device->host
        # round trip.  self._sigma is the host mirror, refreshed lazily by
        # _sync_sigma() (state serialization, flush, debugging).
        self._sigma_dev = None

    # -- dynamic gains -------------------------------------------------------
    def _build_dyn_operators(self, gains_db):
        from .ops.eq_dynamic import build_dynamic_stream_operators_host

        dops = build_dynamic_stream_operators_host(
            gains_db, self.fs_out, self.config.eq,
            unroll=self._U, groups_per_block=(self._fpb * self._P) // self._U,
            num_blocks=self._K_loc, num_shards=self._nb,
        )
        if getattr(self, "_cat_dyn", False):
            import jax

            from .ops.eq_dynamic import build_cat_tables_dyn

            if getattr(self, "_bank_jit", None) is None:
                kc = self.config.kernels
                self._bank_jit = jax.jit(
                    lambda o: build_cat_tables_dyn(
                        self._plan, o, fast=bool(kc.src_fast)
                    )
                )
            self._dbanks = self._bank_jit(dops.ops)
        return dops

    def set_gains(self, gains_db) -> None:
        """Swap the EQ gains at a super-step boundary — NO recompile.

        Only valid in dynamic mode (constructed with ``gains_db=...``).  The
        operators are a traced input of the compiled super-step, so this
        costs one host-float64 build (~ms) plus a small upload.  The carry
        state sigma passes through the change un-reset — the live-lfilter
        semantics: a coefficient change preserves the filter's internal
        state (the reference's slider model, app.py:158-167, applied
        mid-stream).  Equivalent one-shot semantics: segment-before-change
        processed with the old gains ending in state sigma, segment-after
        processed with the new gains starting from sigma
        (tests/test_streaming.py gates the equivalence).
        """
        if not self._dynamic:
            raise RuntimeError(
                "processor was built with static gains; construct with "
                "gains_db=... for dynamic mode"
            )
        self._gains = np.asarray(gains_db, np.float64).reshape(-1)
        self._dops = self._build_dyn_operators(self._gains)

    def _sync_sigma(self) -> None:
        if self._sigma_dev is not None:
            self._sigma = np.asarray(self._sigma_dev)[: self.channels]

    # -- state --------------------------------------------------------------
    @property
    def state(self) -> StreamState:
        self._sync_sigma()
        return StreamState(
            samples_in=self._samples_in,
            frames_done=self._frames_done,
            src_carry=self._buf.copy(),
            eq_state=self._sigma.copy(),
            fs=self.fs,
            d=self._d,
            gains_db=(
                [float(g) for g in self._gains] if self._dynamic else None
            ),
        )

    def state_bytes(self) -> bytes:
        return self.state.to_bytes()

    @staticmethod
    def resume(config: PipelineConfig, mesh, channels: int, data: bytes,
               frames_per_shard: Optional[int] = None,
               fused: Optional[bool] = None, gains_db=None,
               ) -> "ShardedStreamProcessor":
        """Rebuild a processor from ``state_bytes`` output.

        A dynamic-mode checkpoint records its gain vector; if ``gains_db``
        is not supplied the captured gains are re-applied automatically
        (pass gains explicitly to resume under different slider positions —
        the carry passes through un-reset, the live-lfilter semantics).
        """
        st = StreamState.from_bytes(data)
        if gains_db is None and st.gains_db is not None:
            gains_db = st.gains_db
        return ShardedStreamProcessor(
            config, st.fs, mesh, channels,
            frames_per_shard=frames_per_shard, state=st, fused=fused,
            gains_db=gains_db,
        )

    # -- device step ---------------------------------------------------------
    def _build_step(self):
        import jax
        from jax import shard_map
        from jax.sharding import PartitionSpec as P

        from .parallel.mesh import BLOCK_AXIS, CHANNEL_AXIS
        from .utils.precision import einsum_f32

        plan, fl, hr = self._plan, self._fl, self._hr
        nb, K_loc = self._nb, self._K_loc
        ops, eq_active = self._ops, self._eq_active
        eq_bypass = self.config.eq.bypass
        fast = self.config.kernels.eq_fast
        fused = self._fused
        dynamic = self._dynamic
        kc = self.config.kernels
        P_cls = self._P
        fpb = self._fpb
        U_flat = self._U

        if eq_active and not dynamic:
            d = self._d
            A_shard = np.linalg.matrix_power(
                ops.state_corr.astype(np.float64), K_loc
            )
            powers = np.zeros((nb + 1, d, d))
            acc = np.eye(d)
            for k_i in range(nb + 1):
                powers[k_i] = acc
                acc = acc @ A_shard
            weights = np.zeros((nb, nb, d, d), dtype=np.float32)
            for dst in range(nb):
                for srcd in range(dst):
                    weights[dst, srcd] = powers[dst - 1 - srcd]
            w_out = np.stack(
                [powers[nb - 1 - i] for i in range(nb)]
            ).astype(np.float32)
            pows_f32 = powers.astype(np.float32)
            pk = np.zeros((K_loc, d, d))
            acc = np.eye(d)
            for k_i in range(K_loc):
                pk[k_i] = acc
                acc = acc @ ops.state_corr
            pk_f32 = pk.astype(np.float32)
        if plan is not None and plan.s < 8:
            k_idx = np.arange(fl, dtype=np.int32)[:, None]
            w_idx = np.arange(plan.W, dtype=np.int32)[None, :]
            gather_idx = k_idx * plan.s + w_idx

        # With ONE block shard there are no neighbors: the halo is the
        # stream tail, which lives in the SAME host span buffer as x —
        # upload them pre-joined and skip the device-side concat.
        # (Measured neutral at FL=8192 — XLA had already fused the concat
        # into the staging pad; the step's visible copy.11 is the z
        # OUTPUT materialization, ~63 us — but the pre-join drops a
        # dead upload and a concat from the graph.)
        prejoin = nb == 1 and hr > 0

        def extend_halo(x_loc, tail):
            """Halo exchange: per-shard input + right halo from the next
            shard (or the real stream tail on the last shard).  Under
            ``prejoin`` x_loc already carries the tail."""
            xf = x_loc.astype(jnp.float32)
            if not hr or prejoin:
                return xf
            nb_ = jax.lax.axis_size(BLOCK_AXIS)
            right = jax.lax.ppermute(
                xf[..., :hr], BLOCK_AXIS,
                [(i + 1, i) for i in range(nb_ - 1)],
            )
            my = jax.lax.axis_index(BLOCK_AXIS)
            # The last shard's halo is the real stream tail, not the
            # ppermute zero edge (mid-stream the signal continues).
            right = jnp.where(
                my == nb_ - 1, tail.astype(jnp.float32), right
            )
            return jnp.concatenate([xf, right], axis=-1)

        if self._cat:
            w_cat_np = eq_ops.eq_cat_weights(ops)

        def local_src_cat(x_loc, tail):
            """Halo + EQ-fused cat SRC: (y0 (C, fl, P), inj (C, fl/128,
            128*DPAD)) — kernel-grid pad rows cropped (row slices of the
            kernel-materialized outputs; cheap, layout-aligned)."""
            from .kernels.fir_class import polyphase_fir_class_rect_cat

            x_ext = extend_halo(x_loc, tail)
            y0p, ip = polyphase_fir_class_rect_cat(
                x_ext, plan, fl * P_cls, w_cat_np, num_frames=fl,
                pad_left=0,
                precision="fast" if kc.src_fast
                else jax.lax.Precision.HIGHEST,
                interpret=kc.interpret,
            )
            return y0p[..., :fl, :], ip[..., : fl // 128, :]

        def local_src(x_loc, tail):
            """Halo exchange + per-shard SRC -> frames (C, fl, P)."""
            from .ops.src import shifted_frames_matmul

            xf = x_loc.astype(jnp.float32)
            if plan is None:
                return xf
            x_ext = extend_halo(x_loc, tail)
            if fused:
                # The production Pallas kernel (class/shear, routed by
                # kernels.fir_frames).  x_ext index 0 is frame 0's window
                # start, so pad_left = 0 like the sharded one-shot path.
                from .kernels import fir_frames

                return fir_frames(
                    x_ext, plan, fl * P_cls, num_frames=fl, pad_left=0,
                    precision="fast" if kc.src_fast
                    else jax.lax.Precision.HIGHEST,
                    interpret=kc.interpret,
                )
            if plan.s >= 8:
                # x_ext index 0 is frame 0's window start by construction.
                return shifted_frames_matmul(x_ext, plan, fl, 0)
            frames = jnp.take(x_ext, jnp.asarray(gather_idx), axis=-1)
            return einsum_f32(
                "...kw,wp->...kp", frames, jnp.asarray(plan.G, jnp.float32),
            )

        def cross_shard(sigma_local, e, sigma_in, W_cross, pow_lo, pow_hi,
                        W_out, A_blk, pk_arr):
            """Shared carry algebra: true per-block states + outgoing carry.

            W_cross (nb, nb, d, d) maps gathered shard-end states to each
            shard's incoming state; pow_lo (nb, d, d) / pow_hi (d, d)
            propagate the stream's incoming carry; W_out gives the
            replicated outgoing carry.
            """
            e_shard = (
                einsum_f32("ij,...j->...i", A_blk, sigma_local[..., -1, :])
                + e[..., -1, :]
            )
            gathered = jax.lax.all_gather(e_shard, BLOCK_AXIS)  # (nb, C, d)
            my = jax.lax.axis_index(BLOCK_AXIS)
            sig_f = sigma_in.astype(jnp.float32)
            w_my = jnp.take(W_cross, my, axis=0)                # (nb, d, d)
            pow_my = jnp.take(pow_lo, my, axis=0)
            sigma0 = (
                einsum_f32("sij,s...j->...i", w_my, gathered)
                + einsum_f32("ij,...j->...i", pow_my, sig_f)
            )
            sigma = sigma_local + einsum_f32(
                "kij,...j->...ki", pk_arr, sigma0
            )
            # Replicated outgoing carry (identical on every block shard).
            sigma_out = (
                einsum_f32("sij,s...j->...i", W_out, gathered)
                + einsum_f32("ij,...j->...i", pow_hi, sig_f)
            )
            return sigma, sigma_out

        def regroup(y):
            """SRC result -> (C, K_loc, G, U) EQ groups.

            Fused: frames (C, fl, P) regroup along the LEADING axis only
            (U = P, no lane retile).  Flat: (C, fl*P) regroup at U = 128.
            """
            if fused:
                return y.reshape(y.shape[:-2] + (K_loc, fpb, P_cls))
            U = ops.unroll if ops is not None else U_flat
            return y.reshape(
                y.shape[:-1] + (K_loc, (fpb * P_cls) // U, U)
            )

        def finalize(z, like):
            """Clip + restore the SRC result's layout (frames or flat)."""
            return jnp.clip(z.reshape(like.shape), -1.0, 1.0)

        def local_fn(x_loc, tail, sigma_in):
            if self._cat:
                y, ip = local_src_cat(x_loc, tail)    # y = y0 frames
                x_g = y.reshape(y.shape[:-2] + (K_loc, fpb, P_cls))
                from .kernels.fir_class import DPAD

                ipg = ip.reshape(
                    y.shape[:-2] + (K_loc, fpb * DPAD)
                )
                y0, s_in, e = eq_ops._grouped_parts_packed(
                    x_g, ipg, ops, fast=fast
                )
                sigma_local = eq_ops._carry_states(e, ops)
                sigma, sigma_out = cross_shard(
                    sigma_local, e, sigma_in,
                    jnp.asarray(weights), jnp.asarray(pows_f32[:nb]),
                    jnp.asarray(pows_f32[nb]), jnp.asarray(w_out),
                    jnp.asarray(ops.state_corr, jnp.float32),
                    jnp.asarray(pk_f32),
                )
                z = eq_ops._grouped_finish(y0, s_in, sigma, ops)
                return finalize(z, y), sigma_out
            y = local_src(x_loc, tail)           # frames if fused else flat
            if plan is not None and not fused:
                y = y.reshape(x_loc.shape[:-1] + (fl * P_cls,))
            if not eq_active:
                z = y if eq_bypass else jnp.clip(y, -1.0, 1.0)
                return z, sigma_in
            x_g = regroup(y)
            y0, s_in, e = eq_ops._grouped_parts(x_g, ops, fast=fast)
            sigma_local = eq_ops._carry_states(e, ops)
            sigma, sigma_out = cross_shard(
                sigma_local, e, sigma_in,
                jnp.asarray(weights), jnp.asarray(pows_f32[:nb]),
                jnp.asarray(pows_f32[nb]), jnp.asarray(w_out),
                jnp.asarray(ops.state_corr, jnp.float32),
                jnp.asarray(pk_f32),
            )
            z = eq_ops._grouped_finish(y0, s_in, sigma, ops)
            return finalize(z, y), sigma_out

        def local_fn_dyn(x_loc, tail, sigma_in, dops, banks=None):
            """Dynamic-gains step: EQ operators are TRACED inputs, so a
            mid-stream gain swap reuses this compile (see set_gains).
            With ``banks`` (dynamic-cat mode) the fused kernel emits
            [y0 | packed inj] directly — same economy as the static cat
            super-steps."""
            od = dops.ops
            f32 = jnp.float32
            d_dyn = od.group_in.shape[-1]
            toe_prec = jax.lax.Precision.HIGH if fast else \
                jax.lax.Precision.HIGHEST
            if banks is not None:
                from .kernels.fir_class import (
                    DPAD, polyphase_fir_class_rect_cat,
                )

                x_ext = extend_halo(x_loc, tail)
                y0p, ip = polyphase_fir_class_rect_cat(
                    x_ext, plan, fl * P_cls, None, banks=banks.banks,
                    num_frames=fl, pad_left=0,
                    precision="fast" if kc.src_fast
                    else jax.lax.Precision.HIGHEST,
                    interpret=kc.interpret,
                )
                y = y0p[..., :fl, :]
                ipg = ip[..., : fl // 128, :].reshape(
                    y.shape[:-2] + (K_loc, fpb * DPAD)
                )
                x_g = y.reshape(y.shape[:-2] + (K_loc, fpb, P_cls))
                y0 = x_g
                G = fpb
                lead = x_g.shape[:-2]
                s_tail = jnp.einsum(
                    "...x,xy->...y", ipg, banks.toe_pad,
                    precision=toe_prec, preferred_element_type=f32,
                ).reshape(lead + (G, d_dyn))
            else:
                y = local_src(x_loc, tail)
                if plan is not None and not fused:
                    y = y.reshape(x_loc.shape[:-1] + (fl * P_cls,))
                x_g = regroup(y)
                G = x_g.shape[-2]
                lead = x_g.shape[:-2]
                # Grouped state pass (ops/eq._grouped_states with traced
                # tables; fast mode shares the weight-concat matmul of
                # _dynamic_grouped).
                if fast:
                    w_cat = jnp.concatenate([od.fir_t, od.group_in], axis=1)
                    cat = jnp.einsum(
                        "...gu,uv->...gv", x_g, w_cat,
                        precision=jax.lax.Precision.HIGH,
                        preferred_element_type=f32,
                    )
                    y0 = cat[..., : x_g.shape[-1]]
                    inj = cat[..., x_g.shape[-1]:]
                else:
                    y0 = None
                    inj = einsum_f32("...gu,ud->...gd", x_g, od.group_in)
                s_tail = jnp.einsum(
                    "...x,xy->...y", inj.reshape(lead + (G * d_dyn,)),
                    od.toe,
                    precision=toe_prec, preferred_element_type=f32,
                ).reshape(lead + (G, d_dyn))
            e = s_tail[..., G - 1, :]
            s_in = jnp.concatenate(
                [jnp.zeros(lead + (1, d_dyn), f32),
                 s_tail[..., : G - 1, :]], axis=-2,
            )
            # Local (within-shard) block carry from zero state.
            blead = e.shape[:-2]
            if K_loc == 1:
                sigma_local = jnp.zeros_like(e)
            else:
                vecs = jnp.concatenate(
                    [jnp.zeros(blead + (1, d_dyn), f32),
                     e[..., : K_loc - 1, :]], axis=-2,
                )
                sigma_local = einsum_f32(
                    "...x,xy->...y",
                    vecs.reshape(blead + (K_loc * d_dyn,)), dops.carry_loc,
                ).reshape(blead + (K_loc, d_dyn))
            sigma, sigma_out = cross_shard(
                sigma_local, e, sigma_in,
                dops.weights, dops.pow_nb[:nb], dops.pow_nb[nb],
                dops.w_out, od.A_blk, dops.pk,
            )
            s_true = s_in + einsum_f32(
                "gef,...kf->...kge", od.pows_g, sigma
            )
            if y0 is None:
                y0 = jnp.einsum(
                    "...gu,uv->...gv", x_g, od.fir_t,
                    precision=jax.lax.Precision.HIGHEST,
                    preferred_element_type=f32,
                )
            z = y0 + einsum_f32("...gd,du->...gu", s_true, od.group_out)
            return finalize(z, y), sigma_out

        spec_x = P(CHANNEL_AXIS, BLOCK_AXIS)
        spec_rep = P(CHANNEL_AXIS)
        # Fused steps emit frame-major output sharded on the frame axis (the
        # flat view is free on host); flat steps emit the flat signal.
        spec_z = (
            P(CHANNEL_AXIS, BLOCK_AXIS, None)
            if (fused and plan is not None) else spec_x
        )
        if dynamic:
            if self._cat_dyn:
                fn = shard_map(
                    lambda x, t, sg, dp, bk: local_fn_dyn(x, t, sg, dp, bk),
                    mesh=self.mesh,
                    in_specs=(spec_x, spec_rep, spec_rep, P(), P()),
                    out_specs=(spec_z, spec_rep),
                    check_vma=False,
                )
            else:
                fn = shard_map(
                    local_fn_dyn, mesh=self.mesh,
                    in_specs=(spec_x, spec_rep, spec_rep, P()),
                    out_specs=(spec_z, spec_rep),
                    check_vma=False,
                )
        else:
            fn = shard_map(
                local_fn, mesh=self.mesh,
                in_specs=(spec_x, spec_rep, spec_rep),
                out_specs=(spec_z, spec_rep),
                check_vma=False,
            )
        # AUTO output layouts: the default layout normalization copies the
        # full z output every step (~63 us of a 652 us FL=8192 super-step,
        # round 5); letting XLA keep the fusion's native layout removes it
        # and the host fetch linearizes either way (bit-identical,
        # verified).  Falls back to the default when the layout API or the
        # backend refuses.
        try:
            from jax.experimental.layout import Format, Layout

            stepped = jax.jit(
                fn, out_shardings=(Format(Layout.AUTO), Format(Layout.AUTO))
            )
            # Trip compile-time errors now (tiny abstract eval only).
            return stepped
        except Exception:  # pragma: no cover - older jax
            return jax.jit(fn)

    # -- processing ----------------------------------------------------------
    def process(self, chunk: np.ndarray) -> np.ndarray:
        """Consume a (C, n) [or (n,)] chunk; return finalized (C, m) output."""
        if self._flushed:
            raise RuntimeError("stream already flushed")
        chunk = np.asarray(chunk, dtype=np.float32)
        if chunk.ndim == 1:
            chunk = chunk[None]
        if chunk.shape[0] != self.channels:
            raise ValueError(
                f"expected {self.channels} channels, got {chunk.shape[0]}"
            )
        self._buf = np.concatenate([self._buf, chunk], axis=1)
        self._samples_in += chunk.shape[1]
        # Two-phase: dispatch every ready super-step back to back (device
        # uploads + launches queue asynchronously; the carry stays on
        # device), THEN fetch the outputs — fetches of step k overlap the
        # device executing step k+1.
        pend = []
        while self._step_ready():
            pend.append(self._run_step(final=False))
        outs = [self._fetch_step(p) for p in pend]
        return (
            np.concatenate(outs, axis=1) if outs
            else np.zeros((self.channels, 0), np.float32)
        )

    def flush(self) -> np.ndarray:
        """Emit the remaining tail (zero extension beyond the stream end)."""
        if self._flushed:
            return np.zeros((self.channels, 0), np.float32)
        self._flushed = True
        src = self.config.src
        n_total = self._samples_in
        if self._plan is not None and 0 < n_total * src.L < src.num_taps:
            # Stream shorter than the filter: the centered-'same' geometry
            # differs (ops/src.resample); nothing was finalizable, so the
            # buffer holds the whole stream — run it one-shot, unsharded
            # (the signal is tiny by definition here).
            assert self._frames_done == 0
            from .ops.src import resample

            y, _ = resample(jnp.asarray(self._buf), self.fs, src)
            return self._flush_eq_unsharded(np.asarray(y))
        total_out = src.output_length(n_total) if n_total else 0
        pend = []
        total_frames = -(-total_out // self._P)
        while self._frames_done < total_frames:
            pend.append(self._run_step(final=True))
        outs = [self._fetch_step(p) for p in pend]
        return (
            np.concatenate(outs, axis=1) if outs
            else np.zeros((self.channels, 0), np.float32)
        )

    def _flush_eq_unsharded(self, y: np.ndarray) -> np.ndarray:
        cfg = self.config.eq
        self._sync_sigma()
        self._sigma_dev = None
        if self._dynamic:
            # Short-stream flush in dynamic mode: one grouped pass over the
            # (tiny) zero-padded block with the carry folded in.  The
            # post-flush end state is not updated (the stream is closed).
            od = self._dops.ops
            U = od.group_in.shape[0]
            d = od.group_in.shape[-1]
            G = od.toe.shape[0] // d
            n = y.shape[-1]
            blk = G * U
            yp = jnp.pad(jnp.asarray(y, jnp.float32),
                         [(0, 0)] * (y.ndim - 1) + [(0, blk - (n % blk or blk))])
            lead = yp.shape[:-1]
            x_g = yp.reshape(lead + (-1, G, U))
            from .utils.precision import einsum_f32 as _es

            inj = _es("...gu,ud->...gd", x_g, od.group_in)
            s_tail = _es(
                "...x,xy->...y",
                inj.reshape(x_g.shape[:-2] + (G * d,)), od.toe,
            ).reshape(x_g.shape[:-2] + (G, d))
            s_in = jnp.concatenate(
                [jnp.zeros(x_g.shape[:-2] + (1, d), jnp.float32),
                 s_tail[..., : G - 1, :]], axis=-2,
            )
            K = x_g.shape[-3]
            sig0 = jnp.asarray(self._sigma, jnp.float32)
            if K > 1:
                # Propagate across blocks: sigma_k = A_blk^k sig0 + local.
                e = s_tail[..., G - 1, :]
                sigs = [sig0]
                for _k in range(K - 1):
                    sigs.append(
                        _es("ij,...j->...i", od.A_blk, sigs[-1])
                        + e[..., _k, :]
                    )
                sigma = jnp.stack(sigs, axis=-2)
            else:
                sigma = sig0[..., None, :]
            s_true = s_in + _es("gef,...kf->...kge", od.pows_g, sigma)
            y0 = _es("...gu,uv->...gv", x_g, od.fir_t)
            z = y0 + _es("...gd,du->...gu", s_true, od.group_out)
            z = jnp.clip(z.reshape(lead + (-1,))[..., :n], -1.0, 1.0)
            return np.asarray(z)
        if cfg.bypass:
            return y
        if not self._eq_active:
            return np.clip(y, -1.0, 1.0)
        st = jnp.asarray(self._sigma)
        z, st = eq_ops.equalize_stream(
            jnp.asarray(y), self.fs_out, cfg, st, block=self._ops.block
        )
        self._sigma = np.asarray(st)
        return np.asarray(z)

    def _step_ready(self) -> bool:
        src = self.config.src
        n_total = self._samples_in
        k_end = self._frames_done + self._F_sup
        if self._plan is None:
            return k_end <= n_total
        if n_total * src.L < src.num_taps:
            return False  # short-signal geometry not yet ruled out
        window_end = (k_end - 1) * self._s + self._lo + self._W
        if window_end > n_total:
            return False
        # Never emit output indices the stream hasn't justified yet (they
        # would be unretractable if the stream ended now).
        return k_end * self._P <= src.output_length(n_total)

    def _run_step(self, final: bool):
        """Dispatch ONE super-step; returns (z_device, emit_count).

        Device work (uploads, the shard_map program) is queued
        asynchronously; nothing is fetched here — the carry stays on device
        (self._sigma_dev) and feeds the next dispatch directly, so back-to-
        back steps never serialize on a device->host round trip.  Use
        ``_fetch_step`` on the returned record to materialize the output.
        """
        import jax
        from jax.sharding import NamedSharding, PartitionSpec as P

        from .parallel.mesh import BLOCK_AXIS, CHANNEL_AXIS

        if self._fn is None:
            self._fn = self._build_step()
        k0 = self._frames_done
        k_end = k0 + self._F_sup
        span_start = k0 * self._s + self._lo
        span_len = self._F_sup * self._s
        n_total = self._samples_in
        buf_start = n_total - self._buf.shape[1]

        arr = np.zeros((self._c_pad, span_len + self._hr), np.float32)
        a, b = span_start, span_start + span_len + self._hr
        s0, s1 = max(a, buf_start), min(b, n_total)
        if s1 > s0:
            arr[: self.channels, s0 - a : s1 - a] = (
                self._buf[:, s0 - buf_start : s1 - buf_start]
            )

        mesh = self.mesh
        rep = NamedSharding(mesh, P(CHANNEL_AXIS))
        prejoin = self._nb == 1 and self._hr > 0
        if prejoin:
            # Single block shard: the tail rides the same span buffer —
            # upload pre-joined, skip the device-side halo concat (see
            # extend_halo).  The tail argument becomes a dead input.
            x_d = jax.device_put(
                arr, NamedSharding(mesh, P(CHANNEL_AXIS, BLOCK_AXIS))
            )
            if getattr(self, "_tail_dummy", None) is None:
                self._tail_dummy = jax.device_put(
                    np.zeros((self._c_pad, self._hr), np.float32), rep
                )
            tail_d = self._tail_dummy
        else:
            x_d = jax.device_put(
                arr[:, :span_len],
                NamedSharding(mesh, P(CHANNEL_AXIS, BLOCK_AXIS)),
            )
            tail_d = jax.device_put(
                np.ascontiguousarray(arr[:, span_len:]), rep
            )
        if self._sigma_dev is None:
            sig = np.zeros((self._c_pad, max(1, self._d)), np.float32)
            if self._d:
                sig[: self.channels] = self._sigma
            self._sigma_dev = jax.device_put(sig[:, : self._d], rep)
        if self._dynamic:
            if self._cat_dyn:
                z, sigma_out = self._fn(
                    x_d, tail_d, self._sigma_dev, self._dops, self._dbanks
                )
            else:
                z, sigma_out = self._fn(
                    x_d, tail_d, self._sigma_dev, self._dops
                )
        else:
            z, sigma_out = self._fn(x_d, tail_d, self._sigma_dev)
        if self._d:
            self._sigma_dev = sigma_out

        src = self.config.src
        total_out = (
            src.output_length(n_total) if self._plan is not None else n_total
        )
        emit_upto = min(k_end * self._P, total_out)
        emit = emit_upto - k0 * self._P
        self._frames_done = k_end
        # Trim the buffer to the samples future frames can still touch.
        keep_from = self._frames_done * self._s + self._lo
        drop = max(0, keep_from - buf_start)
        if drop:
            self._buf = self._buf[:, drop:]
        return z, emit

    def _fetch_step(self, pend) -> np.ndarray:
        """Materialize one dispatched super-step's output on host."""
        z_dev, emit = pend
        z = np.asarray(z_dev)[: self.channels]
        if z.ndim == 3:  # fused steps emit frames; the flat view is free here
            z = z.reshape(z.shape[0], -1)
        return z[:, :emit]
