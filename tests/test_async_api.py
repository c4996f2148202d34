"""Promise-style API variants (reference: base.rs:68-103 async decode,
offline.rs:198-251 start_rendering/suspend futures, offline.rs:394 resume,
online.rs:523-784 async state machine)."""

import numpy as np

import webaudio_tpu as wa
from webaudio_tpu.constants import InvalidStateError


def test_decode_audio_data_future_matches_sync():
    fs = 48000.0
    ctx = wa.OfflineAudioContext(2, 16, fs)
    path = "/root/reference/samples/sample.wav"
    fut = ctx.decode_audio_data(path)
    sync = ctx.decode_audio_data_sync(path)
    buf = fut.result(timeout=60)
    assert buf.length == sync.length
    assert buf.sample_rate == sync.sample_rate
    np.testing.assert_array_equal(buf.to_array(), sync.to_array())


def test_offline_start_rendering_future():
    fs = 48000.0
    ctx = wa.OfflineAudioContext(1, int(fs * 0.25), fs)
    src = ctx.create_constant_source(offset=0.5)
    src.connect(ctx.destination)
    src.start()
    fut = ctx.start_rendering()
    buf = fut.result(timeout=120)
    assert buf.length == ctx.length
    assert abs(float(buf.get_channel_data(0)[1000]) - 0.5) < 1e-6


def test_offline_suspend_future_resume():
    """suspend(t) resolves when rendering reaches t and blocks until
    resume(); graph mutation during the suspension is picked up
    (reference: offline.rs:241-251, 294-387)."""
    fs = 48000.0
    ctx = wa.OfflineAudioContext(1, int(fs * 0.5), fs)
    src = ctx.create_constant_source(offset=1.0)
    g = ctx.create_gain(gain=0.25)
    src.connect(g)
    g.connect(ctx.destination)
    src.start()

    suspended = ctx.suspend(0.25)
    render_fut = ctx.start_rendering()
    suspended.result(timeout=120)          # rendering reached 0.25 s
    assert ctx.state.value == "suspended"
    assert not render_fut.done()
    g.gain.value = 1.0                     # mutate while suspended
    ctx.resume().result(timeout=10)
    buf = render_fut.result(timeout=120)
    ch = buf.get_channel_data(0)
    assert abs(float(ch[int(0.1 * fs)]) - 0.25) < 1e-6
    assert abs(float(ch[int(0.4 * fs)]) - 1.0) < 1e-6


def test_offline_resume_without_suspend_raises():
    fs = 48000.0
    ctx = wa.OfflineAudioContext(1, 1024, fs)
    try:
        ctx.resume()
        raise AssertionError("expected InvalidStateError")
    except InvalidStateError:
        pass


def test_online_state_futures():
    ctx = wa.AudioContext(sample_rate=48000.0, sink_id="none")
    osc = ctx.create_oscillator()
    osc.connect(ctx.destination)
    osc.start()
    ctx.suspend().result(timeout=30)
    assert ctx.state.value == "suspended"
    ctx.resume().result(timeout=30)
    assert ctx.state.value == "running"
    ctx.close().result(timeout=30)
    assert ctx.state.value == "closed"
