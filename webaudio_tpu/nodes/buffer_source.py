"""AudioBufferSourceNode: buffer playback with resampling and looping.

reference: src/node/audio_buffer_source.rs.  The reference's per-sample
playhead state machine (audio_buffer_source.rs:625-800) becomes closed-form
tensor math:

- the compound rate `playback_rate * 2^(detune/1200)` is k-rate
  (audio_buffer_source.rs:489-493), so buffer_time is an exclusive masked
  cumsum of per-quantum increments (same two-level f32/f64 split as the
  oscillator phase);
- loop wrapping (`while bt >= loop_end: bt -= len`) is `mod` arithmetic on
  the unwrapped playhead; the sticky `entered_loop` flag becomes a
  closed-form per-sample predicate because the playhead is monotone between
  re-traces;
- sample fetch is a gather + linear interpolation, covering the reference's
  fast track (aligned copy) and slow track (resampling) with one code path.
"""

from __future__ import annotations

import math

import numpy as np
import jax.numpy as jnp

from ..buffer import AudioBuffer
from ..constants import RENDER_QUANTUM_SIZE, InvalidStateError
from ..graph.compiler import Kernel
from ..param import AudioParamDescriptor, AutomationRate
from .scheduled_source import AudioScheduledSourceNode


def _loop_wrap(pos, ls, le, loop_len):
    """Wrap an unwrapped playhead into [loop_start, loop_end) with the
    reference's `almost::equal` stickiness (audio_buffer_source.rs:694-699):
    a read landing within relative fp-epsilon of loop_end snaps back to
    loop_start instead of reading the (possibly nonexistent) end sample."""
    wrapped = ls + jnp.mod(pos - ls, loop_len)
    tol = 1.5e-8 * jnp.maximum(jnp.abs(pos), 1.0)
    return jnp.where(le - wrapped <= tol, ls, wrapped)


def _masked_cumsum_f64(values64, mask):
    """Exclusive masked cumsum with f32 within-quantum / f64 across-quantum
    split (see ops/oscillator.accumulate_phase)."""
    B = values64.shape[0]
    q = RENDER_QUANTUM_SIZE
    nq = B // q
    m64 = jnp.where(mask, values64, 0.0).reshape(nq, q)
    m32 = m64.astype(jnp.float32)
    within = (jnp.cumsum(m32, axis=1) - m32).astype(jnp.float64)
    qsums = jnp.sum(m64, axis=1)
    qoffs = jnp.cumsum(qsums) - qsums
    total = qoffs[-1] + qsums[-1]
    return (qoffs[:, None] + within).reshape(B), total


class _BufferSourceKernel(Kernel):
    # data_host is only ever read through the staged-resource path
    # (data_rows/edge_vals/_read_resources), so MixedGraphBatch may bucket
    # same-shape different-content buffers together and stack them
    _fp_staged_attrs = ("data_host",)

    def __init__(self, node: "AudioBufferSourceNode", rc):
        self.sample_rate = rc.sample_rate
        self.node = node
        # constant compound rate -> closed-form playhead: time-indexed (no
        # carried cumsum), which both removes HLO and makes the kernel
        # segment-shardable (see parallel/segments.py)
        plans = rc.param_plans
        self.const_rate = None
        if plans and plans["playback_rate"].is_constant and \
                plans["detune"].is_constant:
            pr = np.float64(np.float32(plans["playback_rate"].scalar))
            dt_ = np.float64(np.float32(plans["detune"].scalar))
            self.const_rate = float(pr * np.exp2(dt_ / 1200.0))
        buf = node.buffer
        self.has_buffer = buf is not None
        if self.has_buffer:
            self.buf_len = buf.length
            self.buf_channels = buf.number_of_channels
            self.buf_rate = buf.sample_rate
            self.buf_duration = buf.length / buf.sample_rate
            self.data_host = buf.to_array()  # (C, L); staged via resources
        else:
            self.buf_len = 1
            self.buf_channels = 1
            self.buf_rate = rc.sample_rate
            self.buf_duration = 0.0
            self.data_host = None
        fs = rc.sample_rate
        self.start_frame, self.stop_frame = node._schedule_frames(fs)
        self.start_time = node._start_time
        self.offset = node._offset
        self.duration = node._duration
        self.loop = node.loop
        # actual loop points (reference: audio_buffer_source.rs:629-637)
        ls, le = node.loop_start, node.loop_end
        if ls >= 0.0 and le > 0.0 and ls < le:
            self.loop_start, self.loop_end = ls, le
        else:
            self.loop_start, self.loop_end = 0.0, self.buf_duration
        self._pick_window(rc)

    def _pick_window(self, rc):
        """Amortized-read geometry (ops/grain_read.py): constant-rate
        playback replaces the one-pair-row-gather-per-sample hot loop —
        the ~7 ns/sample floor under every buffer-source bench case.
        Eligible: const rate with either no loop (monotone playhead) or a
        WHOLE-buffer loop (integral loop length, so the wrap is a mod in
        index space and the row/window layout carries the loop
        continuation).  Partial/fractional loops and a-rate playback keep
        the gathers.

        Default mode for the SINGLE-voice buffer source is 'gather':
        its playhead is near-sequential, hardware prefetch makes the
        pair gathers fast, and the grouped-row A/B measured gathers ~13%
        faster here (benches/read_modes.py) — the opposite of the fused
        multi-lane grain bank, whose interleaved lanes defeat prefetch
        and which defaults to 'grouped'.  WEBAUDIO_GRAIN_READ=
        grouped|window|gather overrides."""
        import os

        self.win_Qs = 0
        self.win_W = 0
        self.read_mode = "gather"
        self.whole_loop = bool(
            self.loop and self.loop_start <= 0.0
            and self.loop_end >= self.buf_duration - 1e-9)
        mode = os.environ.get("WEBAUDIO_GRAIN_READ", "auto")
        if mode == "gather" or self.const_rate is None or \
                not self.has_buffer or (self.loop and not self.whole_loop):
            return
        # ALIGNED unit-step fast path — the reference's own fast track
        # (audio_buffer_source.rs:554-624, the aligned memcpy case): when
        # the playhead advances by exactly 1.0 buffer sample per context
        # frame from an integral start position, every lerp weight is 0
        # and the read is CONTIGUOUS modulo the loop wrap.  The per-sample
        # pair gather (~4 ns/element -> ~8 ms on a 10 s stereo render, the
        # measured floor under iir_chain/buffer_biquad) collapses to one
        # dynamic_slice from a pre-tiled copy of the buffer.  Bit-exact:
        # both paths read data[pos] at integer pos.  WEBAUDIO_BUF_ALIGNED=0
        # reverts to gathers for A/B.
        if mode in ("auto", "aligned") and \
                os.environ.get("WEBAUDIO_BUF_ALIGNED", "1") != "0":
            fs = rc.sample_rate
            step = self.const_rate * self.buf_rate / fs
            if self.start_frame < 2**31 - 1:
                delta = self.start_frame / fs - self.start_time
            else:
                delta = 0.0
            offset_eff = min(max(self.offset + delta * self.const_rate, 0.0),
                             self.buf_duration)
            if self.loop:
                offset_eff = min(offset_eff, self.loop_end)
            offset_pos = offset_eff * self.buf_rate
            if step == 1.0 and delta == 0.0 and \
                    float(offset_pos).is_integer():
                self.read_mode = "aligned"
                self.aligned_off = int(offset_pos)
                self.aligned_pad = rc.block_frames
                return
        from ..ops.grain_read import pick_group, pick_window

        rmax = abs(self.const_rate) * self.buf_rate / rc.sample_rate
        if mode == "auto":
            return  # single-voice source: gathers win (see docstring)
        if mode in ("grouped", "grouped_t", "grouped_pl", "grouped_v"):
            g, w = pick_group(rmax, self.buf_channels, self.buf_len,
                              rc.block_frames)
            if g and not (mode == "grouped_pl" and self.buf_channels > 2):
                self.win_Qs, self.win_W = g, w
                self.read_mode = mode
            return
        if mode == "window":
            self.win_Qs, self.win_W = pick_window(rmax, rc.block_frames)
            if self.win_W:
                self.read_mode = "window"

    def resources(self):
        if self.data_host is None:
            return None
        from ..ops.bufread import edge_vals, pair_rows

        # NOTE: the loop-wrap edge constant is staged from loop_start at
        # compile time.  The loop_start/loop_end setters bump the graph
        # version, so mutations apply at the next re-trace boundary
        # (suspend_sync, RenderSession step, online recompile) and the
        # post-mutation region BIT-matches a fresh context with the new
        # points (test_loop_point_mutation_applies_at_rerender_boundaries).
        # The reference re-reads loop points every quantum
        # (audio_buffer_source.rs:629-637); within one compiled segment a
        # change is not observable — divergence bounded by one segment.
        wrap = int(math.ceil(self.loop_start * self.buf_rate))
        res = {"data_rows": pair_rows(self.data_host),
               "edge_vals": edge_vals(self.data_host, self.loop, wrap)}
        res.update(self._read_resources())
        return res

    def _read_resources(self) -> dict:
        """Data-derived resources for the amortized read modes (also
        rebuilt by GraphBatch.override_buffer for per-instance audio)."""
        if self.read_mode == "aligned":
            return {"data_tiled": self._tiled_data()}
        if self.read_mode.startswith("grouped"):
            from ..ops.grain_read import stage_rows

            return {"data_rows_g": stage_rows(self._window_data(),
                                              self.win_W)}
        if self.read_mode == "window":
            return {"data_ext": self._window_data()}
        return {}

    def _tiled_data(self):
        """(C, T) layout for the aligned unit-step dynamic_slice fetch.
        Whole-buffer loops tile the buffer so any slice start in [0, L)
        covers a full block across the wrap (T = L + P); non-looping
        sources pad P zeros on BOTH sides so pre-start and post-end
        block portions read zeros (T = P + L + P), P = the compile-time
        block size."""
        C, L = self.data_host.shape
        P = self.aligned_pad
        if self.loop:
            reps = -(-(L + P) // L)
            return np.tile(self.data_host, (1, reps))[:, :L + P].astype(
                np.float32, copy=False)
        out = np.zeros((C, P + L + P), np.float32)
        out[:, P:P + L] = self.data_host
        return out

    def _window_data(self):
        """(C, L + W + 2) window layout: whole-buffer loops copy the loop
        continuation past column L (reads cross the seam linearly);
        non-looping sources put the linear-extrapolation 'next tap'
        constant at column L (reached only when prev_i == L-1)."""
        import numpy as np

        from ..ops.bufread import edge_vals as _edge

        C, L = self.data_host.shape
        W = self.win_W
        ext = np.zeros((C, L + W + 2), np.float32)
        ext[:, :L] = self.data_host
        if self.whole_loop:
            n = min(W + 2, L)
            ext[:, L:L + n] = self.data_host[:, :n]
            if W + 2 > L:  # pathological tiny buffer: keep tiling
                for q in range(L + n, L + W + 2):
                    ext[:, q] = self.data_host[:, (q - L) % L]
        else:
            ext[:, L] = _edge(self.data_host, False, 0)
        return ext

    def tail_frames(self):
        return 0 if (self.const_rate is not None or not self.has_buffer) \
            else None

    def init_state(self):
        return {
            "buffer_time": jnp.zeros((), jnp.float64),
            "elapsed": jnp.zeros((), jnp.float64),
            "entered": jnp.zeros((), jnp.bool_),
        }

    def process(self, scope, state, inputs, params):
        B = scope.frames
        if not self.has_buffer:
            return state, [jnp.zeros((1, B), jnp.float32)]
        if self.const_rate is not None:
            return self._process_closed_form(scope, state)
        return self._process_cumsum(scope, state, inputs, params)

    def _process_closed_form(self, scope, state):
        """Constant-rate playback: playhead is a pure function of the global
        sample index (covers the reference's fast track and constant-rate
        slow track)."""
        B = scope.frames
        fs = self.sample_rate
        dt = 1.0 / fs
        rate = self.const_rate
        ratio = self.buf_rate / fs
        L = float(self.buf_len)

        if self.start_frame < 2**31 - 1:
            delta = self.start_frame * dt - self.start_time
        else:
            delta = 0.0
        offset_eff = min(max(self.offset + delta * rate, 0.0), self.buf_duration)
        if self.loop:
            if rate >= 0.0:
                offset_eff = min(offset_eff, self.loop_end)
            else:
                offset_eff = max(offset_eff, self.loop_start)
        offset_pos = offset_eff * self.buf_rate

        sched = scope.active_mask(self.start_frame, self.stop_frame)
        n_rel = (scope.t_idx - np.int32(min(self.start_frame, 2**31 - 1))
                 ).astype(jnp.float64)
        # buffer_time_elapsed starts at |delta * rate| for a sub-sample
        # start (reference: audio_buffer_source.rs:689)
        delta_elapsed = abs(delta * rate) * fs
        dur_ok = n_rel * abs(rate) + delta_elapsed < self.duration * fs
        active = sched & dur_ok
        pos = offset_pos + (rate * ratio) * n_rel

        if self.loop:
            ls = self.loop_start * self.buf_rate
            le = self.loop_end * self.buf_rate
            loop_len = le - ls
            if rate >= 0.0:
                entered = (offset_pos < le) & (pos >= ls)
            elif offset_pos < le:
                entered = jnp.broadcast_to(jnp.bool_(offset_pos >= ls), pos.shape)
            else:
                entered = pos < le
            wrapped = _loop_wrap(pos, ls, le, loop_len)
            pos_eff = jnp.where(entered, wrapped, pos)
        else:
            pos_eff = pos

        valid = active & (pos_eff >= 0.0) & (pos_eff < L)
        out = self._fetch(scope, pos_eff, valid, unwrapped=pos)
        # keep the playhead state current for position() readback and for
        # a-rate re-traces that take over mid-stream
        start_i = min(self.start_frame, 2**31 - 1)
        max_rel = float(min(self.stop_frame, 2**31 - 1) - start_i)
        end_rel = jnp.clip(
            (scope.frame0 + B - np.int32(start_i)).astype(jnp.float64),
            0.0, max(max_rel, 0.0))
        pos_end = offset_pos + (rate * ratio) * end_rel
        if self.loop:
            if rate >= 0.0:
                entered_end = (offset_pos < le) & (pos_end >= ls)
            elif offset_pos < le:
                entered_end = jnp.bool_(offset_pos >= ls)
            else:
                entered_end = pos_end < le
            pos_end = jnp.where(entered_end,
                                _loop_wrap(pos_end, ls, le, loop_len),
                                pos_end)
        new_state = {
            "buffer_time": pos_end,
            "elapsed": end_rel * abs(rate) + delta_elapsed,
            "entered": state["entered"],
        }
        return new_state, [out]

    def _fetch(self, scope, playhead, valid, unwrapped=None):
        from ..ops.bufread import gather_pairs

        if self.read_mode == "aligned":
            return self._fetch_aligned(scope, valid)
        if self.win_W:
            return self._fetch_windowed(scope, playhead, valid, unwrapped)
        floored = jnp.floor(playhead)
        prev_i = jnp.clip(floored.astype(jnp.int32), 0, self.buf_len - 1)
        k = (playhead - floored).astype(jnp.float32)
        beyond = prev_i + 1 >= self.buf_len
        # both lerp taps in ONE row gather; the end-of-buffer neighbor is a
        # per-buffer constant staged alongside the rows (ops/bufread.py)
        a, b = gather_pairs(scope.node_resources["data_rows"], prev_i)
        edge_c = scope.node_resources["edge_vals"][:, None]   # (C, 1)
        if self.loop:
            # end-of-buffer neighbor wraps into the loop
            # (reference: audio_buffer_source.rs:772-795)
            b = jnp.where(beyond[None, :], edge_c, b)
        else:
            # non-looping end-of-buffer (reference: rs:795-815): read 0 when
            # k ~= 1 or the buffer has a single sample, otherwise linearly
            # extrapolate from the last two samples (WebAudio issue #2032)
            edge = jnp.where(((k >= 1.0 - 1e-6) | (prev_i == 0))[None, :],
                             0.0, edge_c)
            b = jnp.where(beyond[None, :], edge, b)
        out = a * (1.0 - k) + b * k
        return jnp.where(valid[None, :], out, 0.0).astype(jnp.float32)

    def _fetch_aligned(self, scope, valid):
        """Aligned unit-step fetch (see _pick_window): the block's samples
        are data[(aligned_off + t - start) mod L] (loop) or
        data[aligned_off + t - start] (one-shot), i.e. ONE contiguous
        dynamic_slice from the pre-tiled layout (_tiled_data) instead of
        a per-sample gather.  Pre-start / out-of-range positions read
        tiled garbage or pad zeros and are masked by `valid` exactly like
        the gather path."""
        import jax

        tiled = scope.node_resources["data_tiled"]          # (C, T)
        B = scope.frames
        start_i = np.int32(min(self.start_frame, 2**31 - 1))
        raw = (scope.frame0 - start_i + np.int32(self.aligned_off)
               ).astype(jnp.int32)
        if self.loop:
            s = jnp.mod(raw, np.int32(self.buf_len))
        else:
            pad = np.int32(self.aligned_pad)
            s = jnp.clip(raw, -pad, np.int32(self.buf_len)) + pad
        out = jax.lax.dynamic_slice(
            tiled, (jnp.int32(0), s), (tiled.shape[0], B))
        return jnp.where(valid[None, :], out, 0.0).astype(jnp.float32)

    def _fetch_windowed(self, scope, playhead, valid, unwrapped):
        """Windowed two-hot fetch (see _pick_window / ops/grain_read.py).

        Whole-buffer loops index by the UNWRAPPED (monotone) playhead —
        the wrap is a mod of the window start, and the window layout
        carries the loop continuation past the seam.  Loop-wrap float
        positions can differ from the gather path's wrapped f64 values by
        ~m*eps sample units; lerp continuity bounds the output deviation
        to ~1 ulp (the gather path remains the oracle in tests)."""
        from ..ops.grain_read import windowed_lerp

        L = self.buf_len
        if self.loop:  # whole-buffer loop (guaranteed by _pick_window)
            base = unwrapped
            fl = jnp.floor(base)
            u = jnp.clip(fl, -2.0 ** 30, 2.0 ** 30).astype(jnp.int32)
            wrap_len = L
        else:
            base = playhead
            fl = jnp.floor(base)
            u = jnp.clip(fl, 0.0, float(L - 1)).astype(jnp.int32)
            wrap_len = 0
        k = (base - fl).astype(jnp.float32)
        if self.read_mode.startswith("grouped"):
            from ..ops.grain_read import (
                grouped_row_lerp, grouped_row_lerp_pl, grouped_row_lerp_t,
                grouped_row_lerp_v)

            fn = {"grouped_t": grouped_row_lerp_t,
                  "grouped_pl": grouped_row_lerp_pl,
                  "grouped_v": grouped_row_lerp_v,
                  "grouped": grouped_row_lerp}[self.read_mode]
            out = fn(
                scope.node_resources["data_rows_g"], u[None, :],
                k[None, :], self.win_Qs, self.win_W, wrap_len)[:, 0, :]
        else:
            out = windowed_lerp(
                scope.node_resources["data_ext"], u[None, :], k[None, :],
                self.win_Qs, self.win_W, wrap_len)[:, 0, :]
        if not self.loop:
            # non-loop end-of-buffer corrections (the gather path's
            # `edge` special cases): column L already holds the linear
            # extrapolation constant; zero it back out when k ~= 1 or the
            # buffer has a single sample
            beyond = u + 1 >= L
            cond = beyond & ((k >= 1.0 - 1e-6) | (u == 0))
            out = out - scope.node_resources["edge_vals"][:, None] * \
                jnp.where(cond, k, 0.0)[None, :]
        return jnp.where(valid[None, :], out, 0.0).astype(jnp.float32)

    def _process_cumsum(self, scope, state, inputs, params):
        B = scope.frames
        fs = self.sample_rate
        dt = 1.0 / fs
        # k-rate compound rate (reference: audio_buffer_source.rs:489-493)
        rate = params["playback_rate"].astype(jnp.float64) * \
            jnp.exp2(params["detune"].astype(jnp.float64) / 1200.0)
        rate = jnp.broadcast_to(rate, (B,))

        sched = scope.active_mask(self.start_frame, self.stop_frame)

        # All playhead math runs in *buffer sample* units so the common
        # aligned case (rate 1, matching rates) advances by exactly 1.0 per
        # frame — this single code path covers the reference's fast track
        # (memcpy, audio_buffer_source.rs:554-624) bit-exactly AND its slow
        # track (resampling) at once.
        ratio = self.buf_rate / fs          # host f64
        L = float(self.buf_len)

        # sub-sample start: the first active sample advances the offset by
        # delta * rate (reference: audio_buffer_source.rs:672-690)
        if self.start_frame < 2**31 - 1:
            delta = self.start_frame * dt - self.start_time
        else:
            delta = 0.0
        at_start = scope.t_idx == self.start_frame
        rate_n0 = jnp.sum(jnp.where(at_start, rate, 0.0))
        in_this_block = jnp.any(at_start)

        offset_eff = jnp.clip(self.offset + delta * rate_n0, 0.0, self.buf_duration)
        if self.loop:
            offset_eff = jnp.where(rate_n0 >= 0.0,
                                   jnp.minimum(offset_eff, self.loop_end),
                                   jnp.maximum(offset_eff, self.loop_start))
        pos0_val = offset_eff * self.buf_rate  # buffer samples

        # elapsed duration limit: masked |rate| cumsum (in context samples),
        # monotone, so the mask is simply elapsed < duration*fs
        # (reference: :652-667); a sub-sample start contributes
        # |delta * rate| up front (reference: :689)
        excl_abs, total_abs = _masked_cumsum_f64(jnp.abs(rate), sched)
        delta_elapsed = jnp.where(in_this_block,
                                  jnp.abs(delta * rate_n0) * fs, 0.0)
        elapsed = state["elapsed"] + delta_elapsed + excl_abs
        dur_ok = elapsed < self.duration * fs
        active = sched & dur_ok

        incr = rate * ratio                 # buffer samples per frame
        excl, total = _masked_cumsum_f64(incr, active)
        pos0 = jnp.where(in_this_block, pos0_val, state["buffer_time"])
        # when the start happens mid-block, samples before it contribute 0
        pos = pos0 + excl

        if self.loop:
            ls = self.loop_start * self.buf_rate
            le = self.loop_end * self.buf_rate
            loop_len = le - ls
            started_before = self.offset * self.buf_rate
            # the reference's entered_loop flag is STICKY (delay.rs comment /
            # audio_buffer_source.rs:700-717): once playback crosses into the
            # loop region the wrap applies forever — cumulative OR over the
            # per-sample entry condition, carried across blocks
            cond = jnp.where(started_before < le, pos >= ls, pos < le)
            entered = state["entered"] | (jnp.cumsum(
                (cond & active).astype(jnp.int32)) > 0)
            wrapped = _loop_wrap(pos, ls, le, loop_len)
            pos_eff = jnp.where(entered, wrapped, pos)
            entered_carry = entered[-1]
        else:
            pos_eff = pos
            entered_carry = state["entered"]

        valid = active & (pos_eff >= 0.0) & (pos_eff < L)
        out = self._fetch(scope, pos_eff, valid)

        new_state = {
            "buffer_time": pos0 + total,      # in buffer samples
            "elapsed": state["elapsed"] + delta_elapsed + total_abs,
            "entered": entered_carry,
        }
        return new_state, [out]


class AudioBufferSourceNode(AudioScheduledSourceNode):
    _number_of_inputs = 0
    _number_of_outputs = 1

    def __init__(self, context, buffer: AudioBuffer | None = None,
                 detune: float = 0.0, loop: bool = False,
                 loop_start: float = 0.0, loop_end: float = 0.0,
                 playback_rate: float = 1.0):
        super().__init__(context)
        self._buffer = None
        self.loop = bool(loop)
        self._loop_start = float(loop_start)
        self._loop_end = float(loop_end)
        self._offset = 0.0
        self._duration = float("inf")
        self.playback_rate = self._register_param(
            "playback_rate",
            AudioParamDescriptor(
                name="playback_rate", automation_rate=AutomationRate.K,
                default_value=1.0, min_value=-3.4028235e38, max_value=3.4028235e38))
        # k-rate constrained (reference: audio_buffer_source.rs:228-245)
        self.playback_rate.set_automation_rate_constrained(True)
        self.detune = self._register_param(
            "detune",
            AudioParamDescriptor(
                name="detune", automation_rate=AutomationRate.K,
                default_value=0.0, min_value=-3.4028235e38, max_value=3.4028235e38))
        self.detune.set_automation_rate_constrained(True)
        if playback_rate != 1.0:
            self.playback_rate.set_value(playback_rate)
        if detune != 0.0:
            self.detune.set_value(detune)
        if buffer is not None:
            self.buffer = buffer

    # --- buffer management (reference: audio_buffer_source.rs:300-370) ----
    @property
    def buffer(self) -> AudioBuffer | None:
        return self._buffer

    @buffer.setter
    def buffer(self, buf: AudioBuffer):
        if self._buffer is not None:
            raise InvalidStateError("buffer has already been set")
        self._buffer = buf
        self.context._invalidate_graph_cache()

    @property
    def loop_start(self) -> float:
        return self._loop_start

    @loop_start.setter
    def loop_start(self, v: float):
        self._loop_start = self._clamp_loop_boundary(float(v))
        self.context._invalidate_graph_cache()

    @property
    def loop_end(self) -> float:
        return self._loop_end

    @loop_end.setter
    def loop_end(self, v: float):
        self._loop_end = self._clamp_loop_boundary(float(v))
        self.context._invalidate_graph_cache()

    def _clamp_loop_boundary(self, v: float) -> float:
        if self._buffer is not None:
            return min(max(v, 0.0), self._buffer.duration)
        return v

    @property
    def position(self) -> float:
        """Playhead position in buffer time (reference: :306)."""
        return getattr(self, "_last_position", 0.0)

    def start(self, when: float = 0.0, offset: float | None = None,
              duration: float | None = None):
        if offset is not None:
            self._offset = max(0.0, float(offset))
        if duration is not None:
            self._duration = float(duration)
        super().start(when)

    def start_at_with_offset(self, when, offset):
        self.start(when, offset)

    def start_at_with_offset_and_duration(self, when, offset, duration):
        self.start(when, offset, duration)

    def output_channel_count(self, input_counts):
        c = self._buffer.number_of_channels if self._buffer is not None else 1
        return [c]

    def make_kernel(self, render_ctx):
        # loop_end defaults to buffer duration once a buffer is present
        if self._buffer is not None and self._loop_end == 0.0:
            self._loop_end = self._buffer.duration
        return _BufferSourceKernel(self, render_ctx)

    def _on_render_state(self, state):
        rate = self._buffer.sample_rate if self._buffer is not None else 1.0
        self._last_position = float(np.asarray(state["buffer_time"])) / rate
