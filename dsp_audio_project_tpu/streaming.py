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
    """Serializable carry for a paused stream."""

    samples_in: int          # total input samples consumed
    frames_done: int         # polyphase frames fully emitted
    src_carry: np.ndarray    # input tail the next frames reach into
    eq_state: np.ndarray     # cascade state (d,) or empty
    fs: int

    def to_bytes(self) -> bytes:
        buf = io.BytesIO()
        meta = dict(samples_in=self.samples_in, frames_done=self.frames_done,
                    fs=self.fs)
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
    """

    def __init__(
        self,
        config: PipelineConfig,
        fs: int,
        mesh,
        channels: int,
        frames_per_shard: Optional[int] = None,
        state: Optional[StreamState] = None,
    ):
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

        bands = config.eq.active_bands(self.fs_out)
        self._eq_active = (not config.eq.bypass) and bool(bands)
        fpb = max(1, -(-config.kernels.iir_block // self._P))
        fpb = -(-fpb // 16) * 16
        self._fpb = fpb
        # The EQ consumes the FLAT per-shard output, so the unroll is free to
        # be the standard 128 (block_operators halves it until it divides the
        # block) — unlike the fused frame-major path, which pins unroll = P.
        self._ops = (
            eq_ops.make_block_operators(
                bands, self.fs_out, config.eq.q, fpb * self._P, 128
            )
            if self._eq_active else None
        )
        self._d = self._ops.A.shape[0] if self._eq_active else 0
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

        if state is not None:
            if state.fs != self.fs:
                raise ValueError("state was captured at a different rate")
            self._samples_in = state.samples_in
            self._frames_done = state.frames_done
            self._buf = np.array(state.src_carry, dtype=np.float32)
            if self._buf.ndim == 1:
                self._buf = self._buf[None].repeat(self.channels, 0)
            eqs = np.asarray(state.eq_state, dtype=np.float32)
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

    # -- state --------------------------------------------------------------
    @property
    def state(self) -> StreamState:
        return StreamState(
            samples_in=self._samples_in,
            frames_done=self._frames_done,
            src_carry=self._buf.copy(),
            eq_state=self._sigma.copy(),
            fs=self.fs,
        )

    def state_bytes(self) -> bytes:
        return self.state.to_bytes()

    @staticmethod
    def resume(config: PipelineConfig, mesh, channels: int, data: bytes,
               frames_per_shard: Optional[int] = None,
               ) -> "ShardedStreamProcessor":
        st = StreamState.from_bytes(data)
        return ShardedStreamProcessor(
            config, st.fs, mesh, channels,
            frames_per_shard=frames_per_shard, state=st,
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
        P_cls = self._P

        if eq_active:
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

        def local_fn(x_loc, tail, sigma_in):
            from .ops.src import shifted_frames_matmul

            xf = x_loc.astype(jnp.float32)
            if plan is None:
                y_loc = xf
            else:
                if hr:
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
                    x_ext = jnp.concatenate([xf, right], axis=-1)
                else:
                    x_ext = xf
                if plan.s >= 8:
                    # x_ext index 0 is frame 0's window start by construction.
                    classes = shifted_frames_matmul(x_ext, plan, fl, 0)
                else:
                    frames = jnp.take(x_ext, jnp.asarray(gather_idx), axis=-1)
                    classes = einsum_f32(
                        "...kw,wp->...kp", frames,
                        jnp.asarray(plan.G, jnp.float32),
                    )
                y_loc = classes.reshape(xf.shape[:-1] + (fl * P_cls,))
            if not eq_active:
                z_loc = y_loc if eq_bypass else jnp.clip(y_loc, -1.0, 1.0)
                return z_loc, sigma_in
            x_g = y_loc.reshape(
                y_loc.shape[:-1] + (K_loc, ops.block // ops.unroll, ops.unroll)
            )
            s_in, e = eq_ops._grouped_states(x_g, ops)
            sigma_local = eq_ops._carry_states(e, ops)
            A_blk = jnp.asarray(ops.state_corr, jnp.float32)
            e_shard = (
                einsum_f32("ij,...j->...i", A_blk, sigma_local[..., -1, :])
                + e[..., -1, :]
            )
            gathered = jax.lax.all_gather(e_shard, BLOCK_AXIS)  # (nb, C, d)
            my = jax.lax.axis_index(BLOCK_AXIS)
            sig_f = sigma_in.astype(jnp.float32)
            w_my = jnp.take(jnp.asarray(weights), my, axis=0)   # (nb, d, d)
            pow_my = jnp.take(jnp.asarray(pows_f32[:nb]), my, axis=0)
            sigma0 = (
                einsum_f32("sij,s...j->...i", w_my, gathered)
                + einsum_f32("ij,...j->...i", pow_my, sig_f)
            )
            sigma = sigma_local + einsum_f32(
                "kij,...j->...ki", jnp.asarray(pk_f32), sigma0
            )
            z = eq_ops._grouped_apply(x_g, s_in, sigma, ops, fast=fast)
            z_loc = jnp.clip(z.reshape(y_loc.shape), -1.0, 1.0)
            # Replicated outgoing carry (identical on every block shard).
            sigma_out = (
                einsum_f32("sij,s...j->...i", jnp.asarray(w_out), gathered)
                + einsum_f32(
                    "ij,...j->...i", jnp.asarray(pows_f32[nb]), sig_f
                )
            )
            return z_loc, sigma_out

        spec_x = P(CHANNEL_AXIS, BLOCK_AXIS)
        spec_rep = P(CHANNEL_AXIS)
        fn = shard_map(
            local_fn, mesh=self.mesh,
            in_specs=(spec_x, spec_rep, spec_rep),
            out_specs=(spec_x, spec_rep),
            check_vma=False,
        )
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
        outs = []
        while self._step_ready():
            outs.append(self._run_step(final=False))
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
        outs = []
        total_frames = -(-total_out // self._P)
        while self._frames_done < total_frames:
            outs.append(self._run_step(final=True))
        return (
            np.concatenate(outs, axis=1) if outs
            else np.zeros((self.channels, 0), np.float32)
        )

    def _flush_eq_unsharded(self, y: np.ndarray) -> np.ndarray:
        cfg = self.config.eq
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

    def _run_step(self, final: bool) -> np.ndarray:
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
        sig = np.zeros((self._c_pad, max(1, self._d)), np.float32)
        if self._d:
            sig[: self.channels] = self._sigma

        mesh = self.mesh
        x_d = jax.device_put(
            arr[:, :span_len], NamedSharding(mesh, P(CHANNEL_AXIS, BLOCK_AXIS))
        )
        rep = NamedSharding(mesh, P(CHANNEL_AXIS))
        tail_d = jax.device_put(
            np.ascontiguousarray(arr[:, span_len:]), rep
        )
        sig_d = jax.device_put(sig[:, : self._d], rep)
        z, sigma_out = self._fn(x_d, tail_d, sig_d)
        z = np.asarray(z)[: self.channels]
        if self._d:
            self._sigma = np.asarray(sigma_out)[: self.channels]

        src = self.config.src
        total_out = (
            src.output_length(n_total) if self._plan is not None else n_total
        )
        emit_upto = min(k_end * self._P, total_out)
        out = z[:, : emit_upto - k0 * self._P]
        self._frames_done = k_end
        # Trim the buffer to the samples future frames can still touch.
        keep_from = self._frames_done * self._s + self._lo
        drop = max(0, keep_from - buf_start)
        if drop:
            self._buf = self._buf[:, drop:]
        return out
