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
