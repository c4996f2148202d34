"""AudioParam automation timeline -> dense tensor compiler.

The reference interprets a sorted event timeline per 128-frame render quantum
on the audio thread (reference: src/param.rs:799-1600).  TPU-native design:
the timeline is *compiled ahead of render* into either a single scalar
(constant) or a dense per-sample f32 array covering the whole render range,
with exactly the reference's semantics:

- event insertion rules: CancelScheduledValues / CancelAndHoldAtTime
  rewriting, SetValueCurve overlap errors, implicit SetValue insertion before
  ramps / setTarget (reference: param.rs:799-1047)
- per-event value formulas (reference: param.rs:64-120)
- sample-index rounding of event boundaries: ``round(t * fs)`` half-up, as
  the per-block ``((end_time - block_time)/dt).round()`` telescopes to
  (reference: param.rs:1117-1119)
- SetTargetAtTime snap-to-target at quantum granularity with the 1e-10
  threshold (reference: param.rs:22, 1380-1410)
- a ramp following a SetTargetAtTime terminates the target at the *block
  time* of the quantum in which the pair reaches the head of the queue
  (reference: param.rs:1302-1320)
- k-rate params sample the intrinsic value at each quantum start using the
  left limit at discontinuities (reference: param.rs:1546-1560 early-return
  interplay with compute_set_value_automation)

Host-side cost is O(events + samples) numpy work, done once per compile.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Optional

import numpy as np

from .constants import RENDER_QUANTUM_SIZE, NotSupportedError, RangeError, InvalidStateError

SNAP_TO_TARGET = 1e-10  # reference: param.rs:22


def _strict_spec() -> bool:
    """WEBAUDIO_STRICT_SPEC=1 opts into W3C-spec hold semantics before a
    scheduled setTarget/setValueCurve starts, instead of the reference's
    back-extrapolated intrinsic at block boundaries (param.rs:1367-1378
    evaluates the event formula at next_block_time without a
    time < start_time guard, then is_constant_block freezes it — for an
    exponential setTarget scheduled seconds ahead this produces huge
    transient values, e.g. a x200 gain plateau between an ADSR decay's
    snap and its release).  Default follows the reference bit-for-bit."""
    import os
    return os.environ.get("WEBAUDIO_STRICT_SPEC", "") not in ("", "0")

# --- event model ---------------------------------------------------------

SET_VALUE = "set_value"
SET_VALUE_AT_TIME = "set_value_at_time"
LINEAR_RAMP = "linear_ramp_to_value_at_time"
EXPONENTIAL_RAMP = "exponential_ramp_to_value_at_time"
SET_TARGET = "set_target_at_time"
SET_VALUE_CURVE = "set_value_curve_at_time"
CANCEL_SCHEDULED_VALUES = "cancel_scheduled_values"
CANCEL_AND_HOLD = "cancel_and_hold_at_time"

_RAMPS = (LINEAR_RAMP, EXPONENTIAL_RAMP)


@dataclass
class ParamEvent:
    event_type: str
    value: float = 0.0
    time: float = 0.0
    time_constant: Optional[float] = None
    cancel_time: Optional[float] = None
    duration: Optional[float] = None
    values: Optional[np.ndarray] = None


def _assert_is_finite(value: float):
    if not math.isfinite(value):
        raise TypeError("TypeError - The provided value is non-finite.")


def _assert_strictly_positive(value: float):
    if not math.isfinite(value):
        raise TypeError("TypeError - The provided value is non-finite.")
    if value <= 0.0:
        raise RangeError(f"duration ({value}) should be strictly positive")


def _assert_not_zero(value: float):
    _assert_is_finite(value)
    if value == 0.0:
        raise RangeError("value should not be equal to zero")


def _assert_sequence_length(values):
    if len(values) < 2:
        raise InvalidStateError("sequence length should not be less than 2")


# --- formulas (reference: param.rs:64-120) --------------------------------

def _set_target(t: float, start_time: float, time_constant: float,
                end_value: float, diff: float) -> float:
    exponent = -((t - start_time) / time_constant)
    return diff * math.exp(exponent) + end_value


def _set_target_f32(t: float, start_time: float, time_constant: float,
                    end_value: float, diff: float) -> float:
    """Bit-faithful f32 evaluation: the reference computes
    ``diff.mul_add(exp(exponent) as f32, end_value)`` on f32 operands
    (param.rs:83-93).  Exact f64 products of f32 values + one final f32
    rounding reproduce the FMA."""
    e32 = float(np.float32(math.exp(-((t - start_time) / time_constant))))
    d32 = float(np.float32(diff))
    v32 = float(np.float32(end_value))
    return float(np.float32(d32 * e32 + v32))


def _set_value_curve_scalar(t, start_time, duration, values):
    if t - start_time >= duration:
        return float(values[-1])
    position = (len(values) - 1) * (t - start_time) / duration
    # `position as usize` saturates negatives to 0 in the reference
    # (back-extrapolation before start_time, param.rs:1466-1476)
    k = max(int(position), 0)
    phase = position - math.floor(position)
    return float((values[k + 1] - values[k]) * phase + values[k])


# --- timeline with insertion rules ----------------------------------------

class Timeline:
    """Control-side event timeline, mirroring AudioParamProcessor's
    handle_incoming_event rules (reference: param.rs:799-1047).

    ``intrinsic_value`` / ``last_event`` track state exactly like the render
    half; for offline rendering all insertions happen before the render (or
    at suspend points after `advance_to`)."""

    def __init__(self, default_value: float):
        self.events: list[ParamEvent] = []
        self.intrinsic_value = float(default_value)
        self.last_event: Optional[ParamEvent] = None

    def snapshot(self):
        import copy

        return copy.deepcopy(self)

    def handle_event(self, event: ParamEvent) -> None:
        # CancelScheduledValues (reference: param.rs:811-868)
        if event.event_type == CANCEL_SCHEDULED_VALUES:
            if self.events:
                current = self.events[0]
                if (current.event_type in _RAMPS and current.time >= event.time
                        and self.last_event is not None):
                    # mid-ramp cancel restores the pre-ramp value
                    self.intrinsic_value = self.last_event.value
            self.events = [q for q in self.events if q.time < event.time]
            return

        # CancelAndHoldAtTime (reference: param.rs:870-947)
        if event.event_type == CANCEL_AND_HOLD:
            self._sort()
            e1 = e2 = None
            t1, t2 = -math.inf, math.inf
            for q in self.events:
                if t1 <= q.time <= event.time:
                    t1, e1 = q.time, q
                elif event.time < q.time < t2:
                    t2, e2 = q.time, q
            if e2 is not None:
                if e2.event_type in _RAMPS:
                    e2.cancel_time = event.time
            elif e1 is not None:
                if e1.event_type == SET_TARGET:
                    e1.cancel_time = event.time
                elif e1.event_type == SET_VALUE_CURVE:
                    if event.time <= e1.time + e1.duration:
                        e1.cancel_time = event.time
            kept = []
            for q in self.events:
                t = q.cancel_time if q.cancel_time is not None else q.time
                if t <= event.time:
                    kept.append(q)
            self.events = kept
            return

        # SetValueCurve overlap checks (reference: param.rs:949-1000)
        if event.event_type == SET_VALUE_CURVE:
            start_time = event.time
            end_time = start_time + event.duration
            for q in self.events:
                if not (q.time <= start_time or q.time >= end_time):
                    raise NotSupportedError(
                        "scheduling SetValueCurveAtTime at time of another event")
        if event.event_type in (SET_VALUE_AT_TIME, SET_VALUE, LINEAR_RAMP,
                                EXPONENTIAL_RAMP, SET_TARGET):
            for q in self.events:
                if q.event_type == SET_VALUE_CURVE:
                    start_time = q.time
                    end_time = start_time + q.duration
                    if not (event.time <= start_time or event.time >= end_time):
                        raise NotSupportedError(
                            "scheduling automation event during SetValueCurveAtTime")

        if event.event_type == SET_VALUE:
            self.intrinsic_value = event.value

        # implicit SetValue before first ramp / setTarget
        # (reference: param.rs:1003-1045)
        if (not self.events and self.last_event is None
                and event.event_type in _RAMPS):
            self.events.append(ParamEvent(SET_VALUE, value=self.intrinsic_value, time=0.0))
        if not self.events and event.event_type == SET_TARGET:
            self.events.append(ParamEvent(SET_VALUE, value=self.intrinsic_value, time=0.0))

        self.events.append(event)
        self._sort()

    def _sort(self):
        self.events.sort(key=lambda e: e.time)

    def is_trivially_constant(self) -> bool:
        return not self.events


# --- segment compiler ------------------------------------------------------

@dataclass
class _Segment:
    """Samples [begin, end) evaluated by one formula."""
    begin: int
    end: int
    kind: str
    # generic payload
    v0: float = 0.0
    v1: float = 0.0
    t0: float = 0.0          # formula start time (seconds)
    duration: float = 0.0
    time_constant: float = 0.0
    hold_value: float = 0.0  # value before t0 inside this segment
    values: Optional[np.ndarray] = None


def _round_index(time: float, fs: float) -> int:
    """Rust f64::round (half away from zero); times are non-negative."""
    return int(math.floor(time * fs + 0.5))


class CompiledParam:
    """Result of compiling a timeline over [0, length) samples."""

    __slots__ = ("scalar", "dense", "final_intrinsic", "final_last_event")

    def __init__(self, scalar, dense, final_intrinsic, final_last_event):
        self.scalar = scalar          # float | None
        self.dense = dense            # np.ndarray (length,) f32 | None
        self.final_intrinsic = final_intrinsic
        self.final_last_event = final_last_event

    @property
    def is_constant(self) -> bool:
        return self.dense is None


def compile_timeline(
    timeline: Timeline,
    sample_rate: float,
    length: int,
    is_a_rate: bool,
    start_frame: int = 0,
    force_dense: bool = False,
    segments_out: Optional[list] = None,
) -> CompiledParam:
    """Compile ``timeline`` into a scalar or dense array for samples
    ``[start_frame, start_frame + length)``.

    The timeline object is mutated the same way the render half would be
    (events consumed, intrinsic updated), enabling suspend/re-trace to
    continue where the previous segment left off.  ``segments_out``
    (if a list) receives the internal `_Segment` walk output — the
    compact piecewise representation consumers like the fused grain
    bank's in-kernel envelope evaluation build from."""
    fs = float(sample_rate)
    dt = 1.0 / fs

    if timeline.is_trivially_constant():
        if segments_out is not None:
            segments_out.append(_Segment(start_frame, start_frame + length,
                                         "const",
                                         v0=timeline.intrinsic_value))
        if force_dense:
            dense = np.full(length, np.float32(timeline.intrinsic_value))
            return CompiledParam(None, dense, timeline.intrinsic_value,
                                 timeline.last_event)
        return CompiledParam(timeline.intrinsic_value, None,
                             timeline.intrinsic_value, timeline.last_event)

    segments: list[_Segment] = []
    cursor = start_frame  # absolute sample index
    end_frame = start_frame + length

    events = timeline.events
    intrinsic = timeline.intrinsic_value
    last_event = timeline.last_event

    Q = RENDER_QUANTUM_SIZE
    # the reference runs event handlers inside a per-quantum loop; the
    # "active block" is the quantum whose loop is executing when an event
    # reaches the head of the queue.  Its next_block_time is where the
    # reference updates the intrinsic with the *unguarded* event formula
    # (back-extrapolated before start_time, see the gap handling below).
    active_end = start_frame + Q  # frame index of the active block's end
    walk_start = True  # no handler has run yet: is_constant_block applies

    def block_time_of(sample: int) -> float:
        """Start time of the quantum containing `sample`."""
        return (sample // Q) * Q * dt

    def _pop_block_end(end_time: float) -> int:
        """active_end after an event whose processing finished at
        ``end_time``: a continuing event is handled per block until
        end_time < next_block_time, so it pops in the block *containing*
        end_time (an exact-boundary end pops in the following block)."""
        return (int(math.floor(end_time * fs / Q)) + 1) * Q

    # NOTE: the loop must keep processing events after samples run out —
    # the reference's final block loop runs handlers with a full buffer,
    # and their side effects (intrinsic pollution, pops) are the
    # continuation state for streaming / resumed compiles.
    while True:
        if not events:
            if cursor < end_frame:
                segments.append(
                    _Segment(cursor, end_frame, "const", v0=intrinsic))
                cursor = end_frame
            break

        event = events[0]
        etype = event.event_type

        # SetValue event entirely beyond this compile range: hold the
        # intrinsic value and stop (the reference's is_constant_block early
        # exit, param.rs:1546-1560; ramps are mid-flight and must evaluate;
        # setTarget / setValueCurve pollute the intrinsic at the active
        # block's boundary first — handled in their branches)
        if (etype in (SET_VALUE, SET_VALUE_AT_TIME)
                and event.time >= end_frame * dt):
            segments.append(_Segment(cursor, end_frame, "const", v0=intrinsic))
            cursor = end_frame
            break

        if etype in (SET_VALUE, SET_VALUE_AT_TIME):
            walk_start = False
            # reference: param.rs:1047-1098
            time = event.time
            if time == 0.0 and etype == SET_VALUE:
                time = block_time_of(cursor)
            idx = min(max(_round_index(time, fs), cursor), end_frame)
            if idx > cursor:
                segments.append(_Segment(cursor, idx, "const", v0=intrinsic))
                cursor = idx
            # strictly greater: an event exactly at end_frame is applied
            # (matches `time > next_block_time` exit, param.rs:1080)
            if time > end_frame * dt:
                break
            intrinsic = event.value
            last_event = events.pop(0)
            last_event.time = time
            # a SetValue strictly beyond the active block exits the loop
            # (`time > next_block_time`, param.rs:1080) and pops after
            # is_constant_block skipping, in the block containing `time`;
            # one exactly at the boundary pops inside the active block
            if time * fs > active_end:
                active_end = _pop_block_end(time)
            continue

        if etype in _RAMPS:
            walk_start = False
            # reference: param.rs:1094-1275.  A ramp with no preceding event
            # can only arise from cancel()-rewritten timelines; the reference
            # unwraps (panics) there — we ramp from the current intrinsic.
            if last_event is None:
                last_event = ParamEvent(SET_VALUE, value=intrinsic, time=0.0)
            start_time = last_event.time
            end_time = event.time
            duration = end_time - start_time
            if event.cancel_time is not None:
                end_time = event.cancel_time
            v0 = last_event.value
            v1 = event.value

            if etype == EXPONENTIAL_RAMP and (v0 == 0.0 or v0 * v1 < 0.0):
                # degenerate exponential ramp behaves as SetValueAtTime
                # (reference: param.rs:1196-1212)
                events[0] = ParamEvent(SET_VALUE_AT_TIME, value=v1, time=end_time)
                continue

            idx = min(max(_round_index(end_time, fs), cursor), end_frame)
            if idx > cursor:
                seg = _Segment(cursor, idx, "linear" if etype == LINEAR_RAMP else "exp",
                               v0=v0, v1=v1, t0=start_time, duration=duration)
                segments.append(seg)
                cursor = idx
            if end_time >= end_frame * dt:
                # continues beyond this compile range
                intrinsic = _eval_ramp_scalar(etype, end_frame * dt, start_time,
                                              duration, v0, v1)
                break
            if event.cancel_time is not None:
                value = _eval_ramp_scalar(etype, end_time, start_time, duration, v0, v1)
                intrinsic = value
                last_event = events.pop(0)
                last_event.time = end_time
                last_event.value = value
            else:
                intrinsic = v1
                last_event = events.pop(0)
            active_end = max(active_end, _pop_block_end(end_time))
            continue

        if etype == SET_TARGET:
            # reference: param.rs:1278-1440
            if last_event is None:
                last_event = ParamEvent(SET_VALUE, value=intrinsic, time=0.0)
            start_time = event.time
            v0 = last_event.value
            v1 = event.value
            diff = v0 - v1
            time_constant = event.time_constant
            hold_v = intrinsic
            ramp_next = len(events) > 1 and events[1].event_type in _RAMPS

            if walk_start:
                # at a block start, is_constant_block skips whole quanta
                # unhandled (no intrinsic pollution) until the block
                # containing start_time (param.rs:1527-1544)
                b_first = int(math.floor(start_time * fs / Q)) * Q
                hold_to = min(max(b_first, cursor), end_frame)
                if hold_to > cursor:
                    segments.append(_Segment(cursor, hold_to, "const",
                                             v0=intrinsic))
                    cursor = hold_to
                if cursor >= end_frame:
                    break  # never reached the handler: intrinsic untouched
                active_end = cursor + Q
            walk_start = False

            a_nbt_t = min(active_end, end_frame) * dt  # next_block_time
            if not ramp_next and start_time >= a_nbt_t:
                # the event reached the head mid-block before its start: the
                # reference fills the rest of the active block with the held
                # intrinsic, then sets intrinsic to the *unguarded* formula
                # at next_block_time — a back-extrapolated value (potentially
                # enormous for exponentials) that is then frozen by
                # is_constant_block until the start quantum
                # (param.rs:1367-1378 + 1527-1544)
                if _strict_spec():
                    p1 = intrinsic  # spec: hold until start_time
                else:
                    p1 = _set_target_f32(a_nbt_t, start_time,
                                         time_constant, v1, diff)
                stop = min(active_end, end_frame)
                if stop > cursor:
                    segments.append(_Segment(cursor, stop, "const",
                                             v0=intrinsic))
                    cursor = stop
                if abs(float(np.float32(v1)) - p1) < SNAP_TO_TARGET:
                    # snap check runs on the polluted value too
                    # (param.rs:1380-1410)
                    intrinsic = v1
                    events[0] = ParamEvent(SET_VALUE_AT_TIME, value=v1,
                                           time=a_nbt_t)
                    continue
                intrinsic = p1
                if cursor >= end_frame:
                    break  # event continues into the next compile range
                b_first = int(math.floor(start_time * fs / Q)) * Q
                gap_to = min(max(b_first, cursor), end_frame)
                if gap_to > cursor:
                    segments.append(_Segment(cursor, gap_to, "const", v0=p1))
                    cursor = gap_to
                if cursor >= end_frame:
                    break
                active_end = cursor + Q
                hold_v = p1

            block_time = active_end * dt - Q * dt  # active block's start
            seg_end_time = end_frame * dt
            ended = False
            if len(events) > 1:
                nxt = events[1]
                if nxt.event_type in _RAMPS:
                    # target collapses at the current block time
                    seg_end_time = block_time
                    ended = True
                elif nxt.time < end_frame * dt:
                    seg_end_time = nxt.time
                    ended = True
            if event.cancel_time is not None and event.cancel_time < end_frame * dt:
                if event.cancel_time < seg_end_time:
                    seg_end_time = event.cancel_time
                    ended = True

            if ended and not ramp_next:
                # a next-event / cancel end only takes effect in the block
                # containing its time; the snap check runs at each earlier
                # block boundary and preempts it (param.rs:1380-1410 runs
                # before the `ended` block is ever reached)
                snap_tq = _find_target_snap(
                    diff, v1, start_time, time_constant, active_end,
                    end_frame, dt)
                if snap_tq is not None and seg_end_time >= snap_tq:
                    ended = False

            if not ended:
                # analytic snap-to-target: find first quantum boundary time
                # tq (> cursor's quantum) with |v(tq) - v1| < SNAP
                # (reference: param.rs:1380-1410). The check runs per block
                # against next_block_time.
                snap_block_end = _find_target_snap(
                    diff, v1, start_time, time_constant, active_end,
                    end_frame, dt)
                if snap_block_end is not None:
                    seg_end_time = snap_block_end
                    # exponential until snap boundary, constant v1 after
                    idx = min(max(_round_index(seg_end_time, fs), cursor), end_frame)
                    if idx > cursor:
                        segments.append(_Segment(
                            cursor, idx, "target", v0=v0, v1=v1, t0=start_time,
                            time_constant=time_constant, hold_value=hold_v))
                        cursor = idx
                    intrinsic = v1
                    events[0] = ParamEvent(SET_VALUE_AT_TIME, value=v1, time=seg_end_time)
                    # the snap exits the reference's block loop; the
                    # replacement SetValue is handled in the block that
                    # *starts* at the snap boundary
                    active_end = max(active_end,
                                     int(round(seg_end_time * fs)) + Q)
                    continue
                # runs to the end of this compile range
                if end_frame > cursor:
                    segments.append(_Segment(
                        cursor, end_frame, "target", v0=v0, v1=v1, t0=start_time,
                        time_constant=time_constant, hold_value=hold_v))
                    cursor = end_frame
                intrinsic = _set_target_f32(end_frame * dt, start_time,
                                            time_constant, v1, diff)
                break

            idx = min(max(_round_index(seg_end_time, fs), cursor), end_frame)
            if idx > cursor:
                segments.append(_Segment(
                    cursor, idx, "target", v0=v0, v1=v1, t0=start_time,
                    time_constant=time_constant, hold_value=hold_v))
                cursor = idx
            value = _set_target_f32(seg_end_time, start_time, time_constant,
                                    v1, diff)
            intrinsic = value
            last_event = events.pop(0)
            last_event.time = seg_end_time
            last_event.value = value
            active_end = max(active_end, _pop_block_end(seg_end_time))
            continue

        if etype == SET_VALUE_CURVE:
            # reference: param.rs:1443-1504
            start_time = event.time
            duration = event.duration
            values = np.asarray(event.values, dtype=np.float32)
            end_time = start_time + duration
            if event.cancel_time is not None:
                end_time = event.cancel_time
            hold_v = intrinsic

            if walk_start:
                # is_constant_block skips whole quanta unhandled
                # (param.rs:1527-1544)
                b_first = int(math.floor(start_time * fs / Q)) * Q
                hold_to = min(max(b_first, cursor), end_frame)
                if hold_to > cursor:
                    segments.append(_Segment(cursor, hold_to, "const",
                                             v0=intrinsic))
                    cursor = hold_to
                if cursor >= end_frame:
                    break
                active_end = cursor + Q
            walk_start = False

            a_nbt_t = min(active_end, end_frame) * dt
            if start_time >= a_nbt_t:
                # back-extrapolated intrinsic pollution at the active block's
                # boundary, then frozen until the start quantum (the curve
                # sampler saturates negative positions to segment 0,
                # param.rs:1466-1491 + 1527-1544)
                if _strict_spec():
                    p1 = intrinsic  # spec: hold until start_time
                else:
                    p1 = float(np.float32(_set_value_curve_scalar(
                        a_nbt_t, start_time, duration, values)))
                stop = min(active_end, end_frame)
                if stop > cursor:
                    segments.append(_Segment(cursor, stop, "const",
                                             v0=intrinsic))
                    cursor = stop
                intrinsic = p1
                if cursor >= end_frame:
                    break
                b_first = int(math.floor(start_time * fs / Q)) * Q
                gap_to = min(max(b_first, cursor), end_frame)
                if gap_to > cursor:
                    segments.append(_Segment(cursor, gap_to, "const", v0=p1))
                    cursor = gap_to
                if cursor >= end_frame:
                    break
                active_end = cursor + Q
                hold_v = p1

            if end_time >= end_frame * dt:
                if end_frame > cursor:
                    segments.append(_Segment(
                        cursor, end_frame, "curve", t0=start_time,
                        duration=duration, values=values, hold_value=hold_v))
                    cursor = end_frame
                intrinsic = _set_value_curve_scalar(
                    end_frame * dt, start_time, duration, values)
                break
            idx = min(max(_round_index(end_time, fs), cursor), end_frame)
            if idx > cursor:
                segments.append(_Segment(
                    cursor, idx, "curve", t0=start_time, duration=duration,
                    values=values, hold_value=hold_v))
                cursor = idx
            if event.cancel_time is not None:
                value = _set_value_curve_scalar(end_time, start_time, duration, values)
            else:
                value = float(values[-1])
            intrinsic = value
            last_event = events.pop(0)
            last_event.time = end_time
            last_event.value = value
            active_end = max(active_end, _pop_block_end(end_time))
            continue

        raise AssertionError(f"unexpected event in timeline: {etype}")

    timeline.events = events
    timeline.intrinsic_value = intrinsic
    timeline.last_event = last_event

    if segments_out is not None:
        segments_out.extend(segments)

    # single constant segment -> scalar
    if len(segments) == 1 and segments[0].kind == "const" and not force_dense:
        v = segments[0].v0
        return CompiledParam(v, None, intrinsic, last_event)

    dense = _evaluate_segments(segments, start_frame, length, dt)
    if not is_a_rate:
        dense = _k_rate_quantize(segments, dense, start_frame, length, dt)
        if not force_dense and np.all(dense == dense[0]):
            return CompiledParam(float(dense[0]), None, intrinsic, last_event)
    return CompiledParam(None, dense, intrinsic, last_event)


def _eval_ramp_scalar(etype, t, start_time, duration, v0, v1):
    phase = (t - start_time) / duration
    if etype == LINEAR_RAMP:
        return np.float32(v1 - v0) * np.float32(phase) + np.float32(v0)
    return np.float32(v0) * np.float32(v1 / v0) ** np.float32(phase)


def _find_target_snap(diff, v1, start_time, time_constant, first_frame,
                      end_frame, dt):
    """First quantum-boundary time tq (scanning the active block's
    boundary onward) where the
    f32 value satisfies |v(tq) - v1| < SNAP, or None.

    The reference checks |v(next_block_time) - v1| each block and replaces
    the event with SetValueAtTime(next_block_time, v1) below threshold
    (param.rs:1380-1410).  The check runs on *f32* FMA results, so it
    usually fires as soon as |diff * exp| drops below ~ulp(v1)/2 — far
    sooner than the nominal 1e-10 threshold — which must be mirrored
    exactly because snapping changes downstream event timing."""
    Q = RENDER_QUANTUM_SIZE
    if first_frame > end_frame:
        return None
    bounds = np.arange(first_frame, end_frame + 1, Q, dtype=np.int64)
    t = bounds.astype(np.float64) * dt
    e32 = np.exp(-(t - start_time) / time_constant).astype(np.float32)
    d32 = np.float64(np.float32(diff))
    v32 = np.float64(np.float32(v1))
    vals = (d32 * e32.astype(np.float64) + v32).astype(np.float32)  # f32 FMA
    hit = np.abs(np.float32(v1) - vals) < np.float32(SNAP_TO_TARGET)
    if not hit.any():
        return None
    return float(t[int(np.argmax(hit))])

def _evaluate_segments(segments, start_frame, length, dt):
    out = np.empty(length, dtype=np.float32)
    for seg in segments:
        i0 = seg.begin - start_frame
        i1 = seg.end - start_frame
        if i1 <= i0:
            continue
        if seg.kind == "const":
            out[i0:i1] = np.float32(seg.v0)
            continue
        t = np.arange(seg.begin, seg.end, dtype=np.float64) * dt
        if seg.kind == "linear":
            phase = ((t - seg.t0) / seg.duration)
            vals = np.float32(seg.v1 - seg.v0) * phase.astype(np.float32) + np.float32(seg.v0)
        elif seg.kind == "exp":
            phase = ((t - seg.t0) / seg.duration).astype(np.float32)
            ratio = np.float32(seg.v1 / seg.v0)
            vals = np.float32(seg.v0) * np.power(ratio, phase)
        elif seg.kind == "target":
            diff = np.float32(seg.v0 - seg.v1)
            expo = np.exp(-((t - seg.t0) / seg.time_constant)).astype(np.float32)
            vals = diff * expo + np.float32(seg.v1)
            vals = np.where(t < seg.t0, np.float32(seg.hold_value), vals)
            if seg.v1 == 0.0:
                # flush subnormals (reference: param.rs:1392-1399)
                vals = np.where(np.abs(vals) < np.finfo(np.float32).tiny, 0.0, vals)
        elif seg.kind == "curve":
            values = seg.values
            n = len(values)
            position = (n - 1) * (t - seg.t0) / seg.duration
            k = np.clip(np.floor(position).astype(np.int64), 0, n - 2)
            phase = (position - np.floor(position)).astype(np.float32)
            interp = (values[k + 1] - values[k]) * phase + values[k]
            vals = np.where(t < seg.t0, np.float32(seg.hold_value), interp)
            vals = np.where(t - seg.t0 >= seg.duration, values[-1], vals).astype(np.float32)
        else:  # pragma: no cover
            raise AssertionError(seg.kind)
        out[i0:i1] = vals.astype(np.float32)
    return out


def _eval_segment_at(seg: _Segment, t: float) -> float:
    """Evaluate one segment's formula at time ``t`` (extrapolating)."""
    if seg.kind == "const":
        return float(seg.v0)
    if seg.kind == "linear":
        phase = np.float32((t - seg.t0) / seg.duration)
        return float(np.float32(seg.v1 - seg.v0) * phase + np.float32(seg.v0))
    if seg.kind == "exp":
        phase = np.float32((t - seg.t0) / seg.duration)
        return float(np.float32(seg.v0) * np.float32(seg.v1 / seg.v0) ** phase)
    if seg.kind == "target":
        if t < seg.t0:
            return float(seg.hold_value)
        return float(np.float32(_set_target(t, seg.t0, seg.time_constant,
                                            seg.v1, seg.v0 - seg.v1)))
    if seg.kind == "curve":
        if t < seg.t0:
            return float(seg.hold_value)
        return _set_value_curve_scalar(t, seg.t0, seg.duration, seg.values)
    raise AssertionError(seg.kind)  # pragma: no cover


def _k_rate_quantize(segments, dense, start_frame, length, dt):
    """k-rate: hold the intrinsic value at each quantum start for the block.

    An event scheduled EXACTLY at the boundary applies to this block: the
    reference consumes events with `time <= next_block_time` while closing
    the previous block (`time > next_block_time` is strictly greater,
    compute_set_value_automation, param.rs), so the intrinsic pushed at the
    next block start already carries the boundary event's value — the
    reference's own test_steps_k_rate (param.rs:1875-1901) pins this.
    (Round 3 held the left limit here instead; that was a misreading of
    the push-before-loop order, caught by transcribing the reference's
    k-rate vectors.)"""
    q = RENDER_QUANTUM_SIZE
    nq = length // q
    assert nq * q == length, "k-rate compile range must be quantum aligned"
    vals = dense.reshape(nq, q)[:, 0].copy()
    return np.repeat(vals, q)
