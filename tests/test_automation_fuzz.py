"""Fuzz the automation timeline compiler against a brute-force per-quantum
interpreter that mirrors the reference's render-thread loop
(param.rs compute_buffer + per-event handlers, processed 128 frames at a
time with per-sample fills).

The compiler evaluates whole segments vectorized; the oracle reproduces the
reference's block-by-block state machine literally.  Random event soups
must agree.
"""

import math

import numpy as np
import pytest

from webaudio_tpu.automation import (
    Timeline, ParamEvent, compile_timeline, SNAP_TO_TARGET,
    SET_VALUE, SET_VALUE_AT_TIME, LINEAR_RAMP, EXPONENTIAL_RAMP, SET_TARGET,
    SET_VALUE_CURVE, CANCEL_SCHEDULED_VALUES, CANCEL_AND_HOLD,
)
from webaudio_tpu.constants import NotSupportedError

Q = 128


def oracle_render(tl: Timeline, length: int) -> np.ndarray:
    """Per-quantum interpreter, a literal port of param.rs:1047-1600."""
    events = [e for e in tl.events]
    intrinsic = tl.intrinsic_value
    last_event = tl.last_event
    out = np.zeros(length, np.float32)
    dt = 1.0

    def round_idx(t, block_time):
        return int(np.floor((max(t - block_time, 0.0)) / dt + 0.5))

    n_blocks = -(-length // Q)
    buf_pos = 0
    for b in range(n_blocks):
        block_time = float(b * Q)
        count = min(Q, length - b * Q)
        next_block_time = block_time + count
        buffer = []

        # is_constant_block check (param.rs:1546-1560)
        if events:
            e = events[0]
            if e.event_type not in (LINEAR_RAMP, EXPONENTIAL_RAMP):
                constant = e.time >= next_block_time
            else:
                constant = False
        else:
            constant = True
        if constant:
            out[buf_pos:buf_pos + count] = np.float32(intrinsic)
            buf_pos += count
            continue

        while True:
            if not events:
                while len(buffer) < count:
                    buffer.append(intrinsic)
                break
            e = events[0]
            t = e.event_type
            if t in (SET_VALUE, SET_VALUE_AT_TIME):
                time = e.time
                if t == SET_VALUE and time == 0.0:
                    time = block_time
                end_i = min(round_idx(time, block_time), count)
                while len(buffer) < end_i:
                    buffer.append(intrinsic)
                if time > next_block_time:
                    break
                intrinsic = e.value
                last_event = events.pop(0)
            elif t in (LINEAR_RAMP, EXPONENTIAL_RAMP):
                if last_event is None:
                    last_event = ParamEvent(SET_VALUE, value=intrinsic, time=0.0)
                start_time = last_event.time
                end_time = e.time
                duration = end_time - start_time
                if e.cancel_time is not None:
                    end_time = e.cancel_time
                v0 = np.float32(last_event.value)
                v1 = np.float32(e.value)
                if t == EXPONENTIAL_RAMP and (v0 == 0.0 or v0 * v1 < 0):
                    # replacement uses the cancel-clamped end_time
                    # (param.rs compute_exponential_ramp_automation)
                    events[0] = ParamEvent(SET_VALUE_AT_TIME, value=float(v1),
                                           time=end_time)
                    continue

                def ramp_at(time):
                    phase = np.float32((time - start_time) / duration)
                    if t == LINEAR_RAMP:
                        return np.float32(v1 - v0) * phase + v0
                    return v0 * np.float32(v1 / v0) ** phase

                end_i = min(round_idx(end_time, block_time), count)
                while len(buffer) < end_i:
                    time = block_time + len(buffer)
                    buffer.append(float(ramp_at(time)))
                    intrinsic = buffer[-1]
                if end_time >= next_block_time:
                    intrinsic = float(ramp_at(next_block_time))
                    break
                if e.cancel_time is not None:
                    intrinsic = float(ramp_at(end_time))
                    ev2 = events.pop(0)
                    ev2.time = end_time
                    ev2.value = intrinsic
                    last_event = ev2
                else:
                    intrinsic = float(v1)
                    last_event = events.pop(0)
            elif t == SET_TARGET:
                end_time = next_block_time
                ended = False
                if len(events) > 1:
                    nxt = events[1]
                    if nxt.event_type in (LINEAR_RAMP, EXPONENTIAL_RAMP):
                        end_time = block_time
                        ended = True
                    elif nxt.time < next_block_time:
                        end_time = nxt.time
                        ended = True
                if e.cancel_time is not None and \
                        e.cancel_time < next_block_time and \
                        e.cancel_time < end_time:
                    end_time = e.cancel_time
                    ended = True
                start_time = e.time
                if last_event is None:
                    last_event = ParamEvent(SET_VALUE, value=intrinsic, time=0.0)
                v0 = np.float32(last_event.value)
                v1 = np.float32(e.value)
                diff = np.float32(v0 - v1)
                tau = e.time_constant

                def target_at(time):
                    # f32 FMA as in the reference (param.rs:83-93)
                    e32 = float(np.float32(math.exp(-(time - start_time) / tau)))
                    return float(np.float32(float(diff) * e32 + float(v1)))

                end_i = min(round_idx(end_time, block_time), count)
                while len(buffer) < end_i:
                    time = block_time + len(buffer)
                    if time - start_time < 0:
                        buffer.append(intrinsic)
                    else:
                        buffer.append(target_at(time))
                    intrinsic = buffer[-1]
                if not ended:
                    value = target_at(next_block_time)
                    if abs(v1 - value) < SNAP_TO_TARGET:
                        intrinsic = float(v1)
                        if v1 == 0.0:
                            buffer = [0.0 if (v != 0.0 and abs(v) <
                                      np.finfo(np.float32).tiny) else v
                                      for v in buffer]
                        events[0] = ParamEvent(SET_VALUE_AT_TIME,
                                               value=float(v1),
                                               time=next_block_time)
                        break  # snap exits the block loop (return true)
                    else:
                        intrinsic = value
                        break
                else:
                    value = target_at(end_time)
                    intrinsic = value
                    ev2 = events.pop(0)
                    ev2.time = end_time
                    ev2.value = value
                    last_event = ev2
            elif t == SET_VALUE_CURVE:
                start_time = e.time
                duration = e.duration
                values = e.values
                end_time = start_time + duration
                if e.cancel_time is not None:
                    end_time = e.cancel_time

                def curve_at(time):
                    if time - start_time >= duration:
                        return float(values[-1])
                    position = (len(values) - 1) * (time - start_time) / duration
                    k = max(int(position), 0)  # Rust `as usize` saturates
                    phase = np.float32(position - math.floor(position))
                    return float((values[k + 1] - values[k]) * phase + values[k])

                end_i = min(round_idx(end_time, block_time), count)
                while len(buffer) < end_i:
                    time = block_time + len(buffer)
                    if time < start_time:
                        buffer.append(intrinsic)
                    else:
                        buffer.append(curve_at(time))
                    intrinsic = buffer[-1]
                if end_time >= next_block_time:
                    intrinsic = curve_at(next_block_time)
                    break
                if e.cancel_time is not None:
                    value = curve_at(end_time)
                else:
                    value = float(values[-1])
                intrinsic = value
                ev2 = events.pop(0)
                ev2.time = end_time
                ev2.value = value
                last_event = ev2
            else:  # pragma: no cover
                raise AssertionError(t)
            # NOTE: the reference loop exits only via the handlers'
            # exit conditions, never on a full buffer — an event popping
            # exactly at the block end still lets the next handler run
            # (and pollute the intrinsic) within the same block.

        while len(buffer) < count:
            buffer.append(intrinsic)
        out[buf_pos:buf_pos + count] = np.float32(buffer[:count])
        buf_pos += count
    return out


def random_timeline(rng, horizon):
    tl = Timeline(float(rng.uniform(-2, 2)))
    n_events = rng.randint(1, 10)
    for _ in range(n_events):
        kind = rng.randint(0, 7)
        t = float(rng.uniform(0, horizon))
        v = float(rng.uniform(0.1, 4.0) * rng.choice([-1.0, 1.0]))
        try:
            if kind == 0:
                tl.handle_event(ParamEvent(SET_VALUE_AT_TIME, value=v, time=t))
            elif kind == 1:
                tl.handle_event(ParamEvent(LINEAR_RAMP, value=v, time=t))
            elif kind == 2:
                tl.handle_event(ParamEvent(EXPONENTIAL_RAMP, value=v, time=t))
            elif kind == 3:
                tl.handle_event(ParamEvent(
                    SET_TARGET, value=v, time=t,
                    time_constant=float(rng.uniform(5, horizon / 2))))
            elif kind == 4:
                vals = rng.uniform(-2, 2, rng.randint(2, 6)).astype(np.float32)
                tl.handle_event(ParamEvent(
                    SET_VALUE_CURVE, time=t, values=vals,
                    duration=float(rng.uniform(5, horizon / 3))))
            elif kind == 5:
                tl.handle_event(ParamEvent(CANCEL_SCHEDULED_VALUES, time=t))
            else:
                tl.handle_event(ParamEvent(CANCEL_AND_HOLD, time=t))
        except NotSupportedError:
            pass  # curve overlap rejected, as in the reference
    return tl


@pytest.mark.parametrize("seed", range(40))
def test_fuzz_compiler_matches_oracle(seed):
    rng = np.random.RandomState(seed)
    horizon = 5 * Q
    tl = random_timeline(rng, horizon)
    length = int(rng.randint(1, 8)) * Q

    compiled = compile_timeline(tl.snapshot(), 1.0, length, True,
                                force_dense=True).dense
    expected = oracle_render(tl.snapshot(), length)
    np.testing.assert_allclose(
        compiled, expected, atol=2e-5, rtol=2e-4,
        err_msg=f"compiler/oracle divergence (seed {seed})")


@pytest.mark.parametrize("seed", range(20))
def test_fuzz_split_compile_matches_oracle(seed):
    """Streaming resume: two chained compiles must equal the one-shot
    oracle — exercises the continuation state (intrinsic pollution at the
    chunk boundary, pending events, last_event) used by the online
    context, RenderSession, and suspend boundaries."""
    rng = np.random.RandomState(100000 + seed)
    tl = random_timeline(rng, 5 * Q)
    n1 = int(rng.randint(1, 5)) * Q
    n2 = int(rng.randint(1, 5)) * Q
    tl2 = tl.snapshot()
    a = compile_timeline(tl2, 1.0, n1, True, force_dense=True).dense
    b = compile_timeline(tl2, 1.0, n2, True, start_frame=n1,
                         force_dense=True).dense
    split = np.concatenate([a, b])
    expected = oracle_render(tl.snapshot(), n1 + n2)
    np.testing.assert_allclose(
        split, expected, atol=2e-5, rtol=2e-4,
        err_msg=f"split-compile divergence (seed {seed})")


def test_strict_spec_holds_before_set_target(monkeypatch):
    """WEBAUDIO_STRICT_SPEC=1: the value before a future setTarget holds
    the current intrinsic (W3C spec) instead of the reference's
    back-extrapolated boundary value."""
    monkeypatch.setenv("WEBAUDIO_STRICT_SPEC", "1")
    tl = Timeline(1.0)
    tl.handle_event(ParamEvent(SET_VALUE_AT_TIME, value=0.25, time=0.0))
    tl.handle_event(ParamEvent(SET_TARGET, value=2.0, time=600.0,
                               time_constant=20.0))
    dense = compile_timeline(tl.snapshot(), 1.0, 512, True,
                             force_dense=True).dense
    # spec semantics: flat 0.25 all the way to the (out-of-range) start
    np.testing.assert_array_equal(dense, np.float32(0.25))

    monkeypatch.delenv("WEBAUDIO_STRICT_SPEC")
    dense = compile_timeline(tl.snapshot(), 1.0, 512, True,
                             force_dense=True).dense
    # reference semantics: polluted from the first block boundary on
    assert dense[0] == np.float32(0.25)
    assert abs(dense[200]) > 1.0  # back-extrapolated e^{+x} plateau
