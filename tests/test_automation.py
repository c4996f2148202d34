"""AudioParam automation engine tests, below the graph.

Ports the semantics of the reference's param.rs unit tests (param.rs:
1656-3545) against the timeline compiler directly: compile_timeline plays
the role of compute_intrinsic_values (param.rs:730-737), with fs=1 so times
are in samples.  Mid-render insertions happen at 128-quantum boundaries,
matching the engine's suspend semantics.
"""

import math

import numpy as np
import pytest

from webaudio_tpu.automation import (
    Timeline, ParamEvent, compile_timeline,
    SET_VALUE_AT_TIME, LINEAR_RAMP, EXPONENTIAL_RAMP, SET_TARGET,
    SET_VALUE_CURVE, CANCEL_SCHEDULED_VALUES, CANCEL_AND_HOLD,
)
from webaudio_tpu.constants import NotSupportedError

Q = 128


def dense(tl, length, fs=1.0, a_rate=True, start=0):
    c = compile_timeline(tl, fs, length, a_rate, start_frame=start,
                         force_dense=True)
    return c.dense


def ev(etype, value=0.0, time=0.0, **kw):
    return ParamEvent(etype, value=value, time=time, **kw)


def test_steps_a_rate():
    # reference: param.rs:1815-1874
    tl = Timeline(0.0)
    tl.handle_event(ev(SET_VALUE_AT_TIME, 5.0, 2.0))
    tl.handle_event(ev(SET_VALUE_AT_TIME, 12.0, 8.0))
    tl.handle_event(ev(SET_VALUE_AT_TIME, 8.0, 10.0))
    out = dense(tl.snapshot(), 10)
    np.testing.assert_array_equal(
        out, [0, 0, 5, 5, 5, 5, 5, 5, 12, 12])
    out2 = dense(tl, 20)
    np.testing.assert_array_equal(out2[10:], [8.0] * 10)


def test_linear_ramp_a_rate():
    # reference: param.rs:1902-1928 (0 -> 10 over 10 samples from v=0)
    tl = Timeline(0.0)
    tl.handle_event(ev(SET_VALUE_AT_TIME, 0.0, 0.0))
    tl.handle_event(ev(LINEAR_RAMP, 10.0, 10.0))
    out = dense(tl, 20)
    np.testing.assert_allclose(out[:10], np.arange(10, dtype=np.float32),
                               atol=1e-6)
    np.testing.assert_array_equal(out[10:], [10.0] * 10)


def test_linear_ramp_implicit_set_value():
    # a ramp with no prior event gets an implicit SetValue(intrinsic) at the
    # block start (reference: param.rs:1960-1993)
    tl = Timeline(3.0)
    tl.handle_event(ev(LINEAR_RAMP, 13.0, 10.0))
    out = dense(tl, 10)
    expected = 3.0 + (13.0 - 3.0) * np.arange(10) / 10.0
    np.testing.assert_allclose(out, expected.astype(np.float32), atol=1e-6)


def test_exponential_ramp_a_rate():
    # reference: param.rs:2131-2165
    v0, v1, t0, t1 = 0.0001, 1.0, 0.0, 10.0
    tl = Timeline(0.0)
    tl.handle_event(ev(SET_VALUE_AT_TIME, v0, t0))
    tl.handle_event(ev(EXPONENTIAL_RAMP, v1, t1))
    out = dense(tl, 12)
    t = np.arange(10)
    expected = v0 * (v1 / v0) ** (t / 10.0)
    np.testing.assert_allclose(out[:10], expected.astype(np.float32),
                               rtol=1e-5)
    np.testing.assert_array_equal(out[10:], [1.0, 1.0])


def test_exponential_ramp_zero_or_opposite_is_step():
    # reference: param.rs:2206-2258 — v0 == 0 or sign change behaves as
    # SetValueAtTime at the ramp end
    for v0 in (0.0, -1.0):
        tl = Timeline(0.0)
        tl.handle_event(ev(SET_VALUE_AT_TIME, v0, 0.0))
        tl.handle_event(ev(EXPONENTIAL_RAMP, 1.0, 5.0))
        out = dense(tl, 10)
        np.testing.assert_array_equal(out[:5], [v0] * 5)
        np.testing.assert_array_equal(out[5:], [1.0] * 5)


def test_set_target_a_rate():
    # reference: param.rs:2403-2512
    v0, v1, t0, tau = 1.0, 2.0, 0.0, 4.0
    tl = Timeline(0.0)
    tl.handle_event(ev(SET_VALUE_AT_TIME, v0, t0))
    tl.handle_event(ev(SET_TARGET, v1, t0, time_constant=tau))
    out = dense(tl, 10)
    t = np.arange(10, dtype=np.float64)
    expected = v1 + (v0 - v1) * np.exp(-(t - t0) / tau)
    np.testing.assert_allclose(out, expected.astype(np.float32), rtol=1e-6)


def test_set_target_followed_by_set_value():
    # the target ends at the next event's time (reference: param.rs:2550-2588)
    tl = Timeline(0.0)
    tl.handle_event(ev(SET_VALUE_AT_TIME, 1.0, 0.0))
    tl.handle_event(ev(SET_TARGET, 0.0, 0.0, time_constant=3.0))
    tl.handle_event(ev(SET_VALUE_AT_TIME, 0.75, 6.0))
    out = dense(tl, 12)
    t = np.arange(6, dtype=np.float64)
    np.testing.assert_allclose(out[:6], np.exp(-t / 3.0).astype(np.float32),
                               rtol=1e-6)
    np.testing.assert_array_equal(out[6:], [0.75] * 6)


def test_set_target_snap_to_value():
    # once |v - target| < 1e-10 at a quantum boundary, the value snaps
    # exactly (reference: param.rs:2737-2776, SNAP_TO_TARGET)
    tl = Timeline(1.0)
    tl.handle_event(ev(SET_VALUE_AT_TIME, 1.0, 0.0))
    tl.handle_event(ev(SET_TARGET, 0.5, 0.0, time_constant=20.0))
    out = dense(tl, 20 * Q)
    # |diff|*exp(-t/tau) < 1e-10  =>  t* = 20*ln(0.5/1e-10) ~ 447 samples;
    # the first quantum boundary after that is 4*Q = 512
    assert out[300] != np.float32(0.5)
    np.testing.assert_array_equal(out[4 * Q:], np.full(16 * Q, 0.5, np.float32))


def test_set_target_followed_by_ramp_collapses_at_block_time():
    # reference: param.rs:2646-2698 — when a ramp follows a setTarget, the
    # target ends at the *block time* where the pair is processed, and the
    # ramp starts from the target's value there
    v0, v1, tau = 0.0, 2.0, 10.0
    tl = Timeline(0.0)
    tl.handle_event(ev(SET_VALUE_AT_TIME, v0, 0.0))
    tl.handle_event(ev(SET_TARGET, v1, 0.0, time_constant=tau))
    first = dense(tl, Q)  # consume the first quantum
    t = np.arange(Q, dtype=np.float64)
    np.testing.assert_allclose(
        first, (v1 + (v0 - v1) * np.exp(-t / tau)).astype(np.float32),
        rtol=1e-6)
    # insert the ramp at the quantum boundary (suspend-time insertion)
    ramp_v, ramp_t = 10.0, 2 * Q
    tl.handle_event(ev(LINEAR_RAMP, ramp_v, float(ramp_t)))
    second = dense(tl, Q, start=Q)
    # target collapsed at t=Q with value v(Q); ramp spans [Q, 2Q]
    vq = v1 + (v0 - v1) * math.exp(-Q / tau)
    tt = np.arange(Q, 2 * Q, dtype=np.float64)
    expected = vq + (ramp_v - vq) * (tt - Q) / Q
    np.testing.assert_allclose(second, expected.astype(np.float32), rtol=1e-4)


def test_cancel_scheduled_values():
    # reference: param.rs:2778-2802
    tl = Timeline(0.0)
    for t in range(10):
        tl.handle_event(ev(SET_VALUE_AT_TIME, float(t), float(t)))
    tl.handle_event(ev(CANCEL_SCHEDULED_VALUES, time=5.0))
    out = dense(tl, 10)
    np.testing.assert_array_equal(out, [0, 1, 2, 3, 4, 4, 4, 4, 4, 4])


def test_cancel_and_hold_during_linear_ramp():
    # reference: param.rs:2975-3021 — ramp is cut at the cancel time and
    # holds the ramp's value there
    tl = Timeline(0.0)
    tl.handle_event(ev(SET_VALUE_AT_TIME, 0.0, 0.0))
    tl.handle_event(ev(LINEAR_RAMP, 10.0, 10.0))
    tl.handle_event(ev(CANCEL_AND_HOLD, time=5.0))
    out = dense(tl, 10)
    np.testing.assert_allclose(out, [0, 1, 2, 3, 4, 5, 5, 5, 5, 5], atol=1e-6)


def test_cancel_and_hold_during_set_target():
    # reference: param.rs:2933-2973
    tl = Timeline(0.0)
    tl.handle_event(ev(SET_VALUE_AT_TIME, 1.0, 0.0))
    tl.handle_event(ev(SET_TARGET, 0.0, 0.0, time_constant=2.0))
    tl.handle_event(ev(CANCEL_AND_HOLD, time=5.0))
    out = dense(tl, 10)
    t = np.arange(5, dtype=np.float64)
    np.testing.assert_allclose(out[:5], np.exp(-t / 2).astype(np.float32),
                               rtol=1e-6)
    hold = math.exp(-5 / 2)
    np.testing.assert_allclose(out[5:], np.full(5, hold, np.float32),
                               rtol=1e-6)


def test_set_value_curve():
    # reference: param.rs:3141+ (linear interpolation of the curve)
    tl = Timeline(0.0)
    tl.handle_event(ev(SET_VALUE_CURVE, time=0.0, duration=8.0,
                       values=np.array([0.0, 1.0, 0.0], np.float32)))
    out = dense(tl, 12)
    expected = [0.0, 0.25, 0.5, 0.75, 1.0, 0.75, 0.5, 0.25, 0.0, 0.0, 0.0, 0.0]
    np.testing.assert_allclose(out, np.float32(expected), atol=1e-6)


def test_set_value_curve_overlap_raises():
    tl = Timeline(0.0)
    tl.handle_event(ev(SET_VALUE_CURVE, time=0.0, duration=8.0,
                       values=np.array([0.0, 1.0], np.float32)))
    with pytest.raises(NotSupportedError):
        tl.handle_event(ev(SET_VALUE_AT_TIME, 1.0, 4.0))


def test_k_rate_boundary_event_applies_to_its_block():
    # a SetValue exactly at a quantum boundary applies to THAT quantum for
    # k-rate: the reference consumes events with time <= next_block_time
    # while closing the previous block (strict `>` in
    # compute_set_value_automation), so the intrinsic at the next block
    # start already carries it — pinned by the reference's own
    # test_steps_k_rate (param.rs:1875-1901)
    tl = Timeline(1.0)
    tl.handle_event(ev(SET_VALUE_AT_TIME, 2.0, float(Q)))
    out = dense(tl, 3 * Q, a_rate=False)
    np.testing.assert_array_equal(out[:Q], np.ones(Q, np.float32))
    np.testing.assert_array_equal(out[Q:2 * Q], np.full(Q, 2.0, np.float32))
    np.testing.assert_array_equal(out[2 * Q:], np.full(Q, 2.0, np.float32))


def test_k_rate_ramp_samples_block_starts():
    tl = Timeline(0.0)
    tl.handle_event(ev(SET_VALUE_AT_TIME, 0.0, 0.0))
    tl.handle_event(ev(LINEAR_RAMP, float(4 * Q), float(4 * Q)))
    out = dense(tl, 4 * Q, a_rate=False)
    for b in range(4):
        np.testing.assert_array_equal(
            out[b * Q:(b + 1) * Q], np.full(Q, b * Q, np.float32))


def test_linear_ramp_k_rate_multiple_blocks():
    # reference: param.rs:2036-2093 — k-rate holds the block-start value
    tl = Timeline(0.0)
    tl.handle_event(ev(SET_VALUE_AT_TIME, 0.0, 0.0))
    tl.handle_event(ev(LINEAR_RAMP, float(2 * Q), float(2 * Q)))
    out = dense(tl, 3 * Q, a_rate=False)
    np.testing.assert_array_equal(out[:Q], np.zeros(Q, np.float32))
    np.testing.assert_array_equal(out[Q:2 * Q], np.full(Q, Q, np.float32))
    np.testing.assert_array_equal(out[2 * Q:], np.full(Q, 2 * Q, np.float32))


def test_exponential_ramp_k_rate_multiple_blocks():
    # reference: param.rs:2275-2314
    v0, v1 = 1.0, 16.0
    end = 2 * Q
    tl = Timeline(0.0)
    tl.handle_event(ev(SET_VALUE_AT_TIME, v0, 0.0))
    tl.handle_event(ev(EXPONENTIAL_RAMP, v1, float(end)))
    out = dense(tl, 3 * Q, a_rate=False)
    np.testing.assert_allclose(out[:Q], v0, rtol=1e-6)
    expect_mid = np.float32(v0) * np.float32(v1 / v0) ** np.float32(Q / end)
    np.testing.assert_allclose(out[Q:2 * Q], expect_mid, rtol=1e-6)
    np.testing.assert_allclose(out[2 * Q:], v1, rtol=1e-6)


def test_cancel_and_hold_during_exponential_ramp():
    # reference: param.rs:3023-3093
    v0, v1, end, tc = 1.0, 4.0, 8.0, 5.0
    tl = Timeline(0.0)
    tl.handle_event(ev(SET_VALUE_AT_TIME, v0, 0.0))
    tl.handle_event(ev(EXPONENTIAL_RAMP, v1, end))
    tl.handle_event(ev(CANCEL_AND_HOLD, time=tc))
    out = dense(tl, 12)
    t = np.arange(5, dtype=np.float64)
    np.testing.assert_allclose(
        out[:5], (np.float32(v0) * np.float32(v1 / v0)
                  ** (t / end).astype(np.float32)), rtol=1e-6)
    hold = np.float32(v0) * np.float32(v1 / v0) ** np.float32(tc / end)
    np.testing.assert_allclose(out[5:], np.full(7, hold), rtol=1e-6)


def test_cancel_and_hold_during_value_curve():
    # reference: param.rs:3095-3140 — curve cut at tc, holds curve(tc)
    tl = Timeline(0.0)
    tl.handle_event(ev(SET_VALUE_CURVE, time=0.0, duration=8.0,
                       values=np.array([0.0, 1.0, 0.0], np.float32)))
    tl.handle_event(ev(CANCEL_AND_HOLD, time=3.0))
    out = dense(tl, 10)
    np.testing.assert_allclose(out[:3], [0.0, 0.25, 0.5], atol=1e-6)
    np.testing.assert_allclose(out[3:], np.full(7, 0.75, np.float32), atol=1e-6)


def test_set_target_to_zero_flushes_subnormals():
    # reference: tests/denormals.rs + param.rs:1392-1399 — decay toward 0
    # must end at exactly 0.0 (no subnormals in the buffer)
    tl = Timeline(1.0)
    tl.handle_event(ev(SET_VALUE_AT_TIME, 1.0, 0.0))
    tl.handle_event(ev(SET_TARGET, 0.0, 0.0, time_constant=8.0))
    out = dense(tl, 16 * Q)
    # after the snap boundary the value is exactly zero
    assert out[-1] == 0.0
    tiny = np.finfo(np.float32).tiny
    nonzero = out[out != 0.0]
    assert np.all(np.abs(nonzero) >= tiny), "subnormals must be flushed"


# --- pinned vectors from the reference's own unit tests (param.rs) --------
# (only block-size-independent cases: the reference tests use artificial
# 10-sample quanta; ours are the production 128)

def _compile(tl, length):
    from webaudio_tpu.automation import compile_timeline
    return compile_timeline(tl.snapshot(), 1.0, length, True,
                            force_dense=True).dense


def test_ref_set_target_waits_for_start_time():
    """param.rs test_set_target_at_time_waits_for_start_time"""
    import math
    from webaudio_tpu.automation import (Timeline, ParamEvent,
                                         SET_VALUE_AT_TIME, SET_TARGET)
    tl = Timeline(0.0)
    tl.handle_event(ParamEvent(SET_VALUE_AT_TIME, value=1.0, time=0.0))
    tl.handle_event(ParamEvent(SET_TARGET, value=0.0, time=5.0,
                               time_constant=1.0))
    vs = _compile(tl, 128)
    np.testing.assert_array_equal(vs[:5], 1.0)
    for t in range(5, 20):
        expect = np.float32(1.0 * math.exp(-(t - 5.0)))
        np.testing.assert_allclose(vs[t], expect, atol=1e-7)


def test_ref_set_target_followed_by_set_value():
    """param.rs test_set_target_at_time_a_rate_followed_by_set_value"""
    import math
    from webaudio_tpu.automation import (Timeline, ParamEvent,
                                         SET_VALUE_AT_TIME, SET_TARGET)
    tl = Timeline(0.0)
    tl.handle_event(ParamEvent(SET_VALUE_AT_TIME, value=0.0, time=0.0))
    tl.handle_event(ParamEvent(SET_TARGET, value=2.0, time=0.0,
                               time_constant=1.0))
    tl.handle_event(ParamEvent(SET_VALUE_AT_TIME, value=0.5, time=15.0))
    vs = _compile(tl, 128)
    for t in range(15):
        expect = np.float32(2.0 + (0.0 - 2.0) * math.exp(-float(t)))
        np.testing.assert_allclose(vs[t], expect, atol=1e-7, err_msg=str(t))
    np.testing.assert_array_equal(vs[15:], np.float32(0.5))


def test_ref_cancel_scheduled_values():
    """param.rs test_cancel_scheduled_values"""
    from webaudio_tpu.automation import (Timeline, ParamEvent,
                                         SET_VALUE_AT_TIME,
                                         CANCEL_SCHEDULED_VALUES)
    tl = Timeline(0.0)
    for t in range(10):
        tl.handle_event(ParamEvent(SET_VALUE_AT_TIME, value=float(t),
                                   time=float(t)))
    tl.handle_event(ParamEvent(CANCEL_SCHEDULED_VALUES, time=5.0))
    vs = _compile(tl, 128)
    np.testing.assert_array_equal(
        vs[:10], np.array([0, 1, 2, 3, 4, 4, 4, 4, 4, 4], np.float32))
    np.testing.assert_array_equal(vs[10:], np.float32(4.0))


def test_ref_exponential_ramp_zero_and_opposite():
    """param.rs test_exponential_ramp_a_rate_zero_and_opposite_target:
    v0 and v1 with opposite signs (or v0 == 0) behave as SetValue at the
    ramp's end time."""
    from webaudio_tpu.automation import (Timeline, ParamEvent,
                                         SET_VALUE_AT_TIME,
                                         EXPONENTIAL_RAMP)
    tl = Timeline(0.0)
    tl.handle_event(ParamEvent(SET_VALUE_AT_TIME, value=1.0, time=0.0))
    tl.handle_event(ParamEvent(EXPONENTIAL_RAMP, value=-2.0, time=10.0))
    vs = _compile(tl, 128)
    np.testing.assert_array_equal(vs[:10], np.float32(1.0))
    np.testing.assert_array_equal(vs[10:], np.float32(-2.0))
