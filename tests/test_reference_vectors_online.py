"""Online-context, capacity, playback-stats, decode and connection-registry
test transcriptions (reference: src/context/online.rs, src/capacity.rs,
src/playback_stats.rs, src/context/base.rs, src/context/concrete_base.rs
`mod tests`).
"""

import time

import numpy as np
import pytest

from webaudio_tpu import AudioContext, OfflineAudioContext
from webaudio_tpu.constants import (InvalidAccessError, NotFoundError,
                                    NotSupportedError, WebAudioError)
from webaudio_tpu.context.base import AudioContextState


def _ctx(**kw):
    ctx = AudioContext(sink_id="none", **kw)
    ctx.set_realtime_pacing(False)
    return ctx


# --- online.rs ---------------------------------------------------------------

def test_suspend_resume_close():
    # online.rs test_suspend_resume_close — time freezes while suspended,
    # progresses while running, freezes after close
    ctx = _ctx()
    ctx.resume_sync()
    assert ctx.state == AudioContextState.RUNNING

    ctx.suspend_sync()
    assert ctx.state == AudioContextState.SUSPENDED
    t1 = ctx.current_time
    assert t1 >= 0.0
    time.sleep(0.05)
    assert ctx.current_time == t1  # no progression of time

    ctx.resume_sync()
    assert ctx.state == AudioContextState.RUNNING
    deadline = time.time() + 5.0
    while ctx.current_time <= t1 and time.time() < deadline:
        time.sleep(0.01)
    assert ctx.current_time > t1  # time is progressing

    ctx.close_sync()
    assert ctx.state == AudioContextState.CLOSED
    t4 = ctx.current_time
    time.sleep(0.05)
    assert ctx.current_time == t4


def test_suspend_during_startup():
    ctx = _ctx()
    ctx.suspend_sync()
    assert ctx.state == AudioContextState.SUSPENDED
    t1 = ctx.current_time
    time.sleep(0.05)
    assert ctx.current_time == t1
    ctx.close_sync()


def test_try_new_invalid_sample_rate():
    with pytest.raises(WebAudioError):
        AudioContext(sample_rate=0.0, sink_id="none")


def test_invalid_sink_id():
    # online.rs test_try_new_invalid_sink_id — NotFoundError naming the id
    with pytest.raises(NotFoundError, match="invalid"):
        AudioContext(sink_id="invalid")


# --- capacity.rs --------------------------------------------------------------

def test_render_capacity_same_instance():
    ctx = _ctx()
    assert ctx.render_capacity is ctx.render_capacity
    ctx.close_sync()


def test_render_capacity_stop_when_not_running():
    ctx = _ctx()
    ctx.render_capacity.stop()  # must not raise
    ctx.close_sync()


def test_render_capacity():
    # capacity.rs test_render_capacity — event fields present and finite
    ctx = _ctx()
    osc = ctx.create_oscillator()
    osc.connect(ctx.destination)
    osc.start()
    events = []
    rc = ctx.render_capacity
    rc.set_onupdate(lambda e: events.append(e))
    rc.start(update_interval=0.05)
    deadline = time.time() + 5.0
    while not events and time.time() < deadline:
        time.sleep(0.02)
    rc.stop()
    ctx.close_sync()
    assert events
    e = events[0]
    for field in ("timestamp", "average_load", "peak_load", "underrun_ratio"):
        v = float(getattr(e, field))
        assert v >= 0.0 and np.isfinite(v)


# --- playback_stats.rs ---------------------------------------------------------

def test_playback_stats_same_instance():
    ctx = _ctx()
    assert ctx.playback_stats is ctx.playback_stats
    ctx.close_sync()


def test_playback_stats():
    ctx = _ctx()
    osc = ctx.create_oscillator()
    osc.connect(ctx.destination)
    osc.start()
    ctx.resume_sync()
    stats = ctx.playback_stats
    deadline = time.time() + 5.0
    while stats.total_frames_duration <= 0.0 and time.time() < deadline:
        time.sleep(0.02)
    assert stats.total_frames_duration > 0.0
    assert stats.fallback_frames_duration >= 0.0
    assert np.isfinite(stats.average_latency)
    assert np.isfinite(stats.minimum_latency)
    assert np.isfinite(stats.maximum_latency)
    stats.reset_latency()
    assert stats.average_latency == 0.0
    assert stats.minimum_latency == 0.0
    assert stats.maximum_latency == 0.0
    ctx.close_sync()


def test_playback_stats_do_not_update_when_closed():
    ctx = _ctx()
    osc = ctx.create_oscillator()
    osc.connect(ctx.destination)
    osc.start()
    ctx.resume_sync()
    deadline = time.time() + 5.0
    while ctx.playback_stats.total_frames_duration <= 0.0 \
            and time.time() < deadline:
        time.sleep(0.02)
    ctx.close_sync()
    frozen = ctx.playback_stats.total_frames_duration
    time.sleep(0.1)
    assert ctx.playback_stats.total_frames_duration == frozen


# --- context/base.rs ------------------------------------------------------------

def test_decode_audio_data_sync():
    # base.rs test_decode_audio_data_sync — the full literal vector
    ctx = OfflineAudioContext(1, 1, 44100.0)
    buf = ctx.decode_audio_data_sync(
        open("/root/reference/samples/sample.wav", "rb").read())
    assert buf.sample_rate == 44100.0
    assert buf.length == 142187
    assert buf.number_of_channels == 2
    assert buf.duration == pytest.approx(3.224, abs=0.001)
    left = buf.get_channel_data(0)[:100]
    right = buf.get_channel_data(1)[:100]
    assert not np.array_equal(left, right)


def test_decode_audio_data_decoding_error():
    ctx = OfflineAudioContext(1, 1, 44100.0)
    with pytest.raises(Exception):
        ctx.decode_audio_data_sync(
            open("/root/reference/samples/corrupt.wav", "rb").read())


def test_decode_audio_data_empty():
    # the reference's own test is disabled (symphonia can't parse the
    # truncated fmt chunk); ours rejects it with a clear error too
    ctx = OfflineAudioContext(1, 1, 44100.0)
    with pytest.raises(Exception):
        ctx.decode_audio_data_sync(
            open("/root/reference/samples/empty_2c.wav", "rb").read())


def test_create_buffer():
    ctx = OfflineAudioContext(1, 1, 44100.0)
    buf = ctx.create_buffer(3, 2000, 96000.0)
    assert buf.number_of_channels == 3
    assert buf.length == 2000
    assert buf.sample_rate == 96000.0


# --- context/concrete_base.rs -----------------------------------------------------

def test_connect_disconnect():
    # concrete_base.rs test_connect_disconnect — plain disconnect() never
    # raises; connect/disconnect round-trips update the registry
    ctx = OfflineAudioContext(1, 128, 48000.0)
    n1 = ctx.create_constant_source()
    n2 = ctx.create_gain()

    assert not ctx._edges
    n1.disconnect()  # never raises for plain disconnect calls

    n1.connect(n2)
    assert len(ctx._edges) == 1
    n1.disconnect()
    assert not ctx._edges

    n1.connect(n2)
    assert len(ctx._edges) == 1
    n1.disconnect(n2)
    assert not ctx._edges


def test_disconnect_not_existing():
    # concrete_base.rs test_disconnect_not_existing (should_panic)
    ctx = OfflineAudioContext(1, 128, 48000.0)
    n1 = ctx.create_constant_source()
    n2 = ctx.create_gain()
    with pytest.raises(InvalidAccessError):
        n1.disconnect(n2)
