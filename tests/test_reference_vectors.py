"""Golden vectors transcribed from the reference implementation's unit
tests (orottier/web-audio-api-rs, read-only at /root/reference).

Each case cites the reference test it ports (file:line).  The expected
buffers are the literal closed-form values asserted by the reference —
this is the external-validity suite mandated by SURVEY.md §4.3 ("golden
comparison against the reference outputs"), replacing the circular
self-rendered goldens for these behaviors.
"""

import numpy as np
import pytest

from webaudio_tpu import OfflineAudioContext

Q = 128  # RENDER_QUANTUM_SIZE


def _render(ctx):
    return ctx.start_rendering_sync()


# ---------------------------------------------------------------------------
# DelayNode — /root/reference/src/node/delay.rs
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("delay_in_samples", [128.0, 131.0, 197.0])
def test_delay_sample_accurate(delay_in_samples):
    # delay.rs:767-792 test_sample_accurate
    fs = 48000.0
    ctx = OfflineAudioContext(1, 256, fs)
    delay = ctx.create_delay(2.0)
    delay.delay_time.set_value(delay_in_samples / fs)
    delay.connect(ctx.destination)
    dirac = ctx.create_buffer(1, 1, fs)
    dirac.copy_to_channel(np.array([1.0], np.float32), 0)
    src = ctx.create_buffer_source()
    src.connect(delay)
    src.buffer = dirac
    src.start(0.0)
    ch = _render(ctx).get_channel_data(0)
    expected = np.zeros(256, np.float32)
    expected[int(delay_in_samples)] = 1.0
    np.testing.assert_allclose(ch, expected, atol=1e-5)


@pytest.mark.parametrize("delay_in_samples,idx,vals", [
    (128.5, 128, (0.5, 0.5)),   # delay.rs:795-820 test_sub_sample_accurate_1
    (128.8, 128, (0.2, 0.8)),   # delay.rs:823-848 test_sub_sample_accurate_2
])
def test_delay_sub_sample_accurate(delay_in_samples, idx, vals):
    fs = 48000.0
    ctx = OfflineAudioContext(1, 256, fs)
    delay = ctx.create_delay(2.0)
    delay.delay_time.set_value(delay_in_samples / fs)
    delay.connect(ctx.destination)
    dirac = ctx.create_buffer(1, 1, fs)
    dirac.copy_to_channel(np.array([1.0], np.float32), 0)
    src = ctx.create_buffer_source()
    src.connect(delay)
    src.buffer = dirac
    src.start(0.0)
    ch = _render(ctx).get_channel_data(0)
    expected = np.zeros(256, np.float32)
    expected[idx], expected[idx + 1] = vals
    np.testing.assert_allclose(ch, expected, atol=1e-5)


def test_delay_multichannel():
    # delay.rs:851-881 test_multichannel
    fs = 48000.0
    ctx = OfflineAudioContext(2, 2 * Q, fs)
    delay = ctx.create_delay(2.0)
    delay.delay_time.set_value(128.0 / fs)
    delay.connect(ctx.destination)
    buf = ctx.create_buffer(2, 256, fs)
    buf.copy_to_channel(np.array([1.0], np.float32), 0)
    buf.copy_to_channel(np.array([0.0, 1.0], np.float32), 1)
    src = ctx.create_buffer_source()
    src.connect(delay)
    src.buffer = buf
    src.start(0.0)
    out = _render(ctx)
    exp_l = np.zeros(256, np.float32)
    exp_l[128] = 1.0
    exp_r = np.zeros(256, np.float32)
    exp_r[129] = 1.0
    np.testing.assert_allclose(out.get_channel_data(0), exp_l, atol=1e-5)
    np.testing.assert_allclose(out.get_channel_data(1), exp_r, atol=1e-5)


def test_delay_input_channel_count_change():
    # delay.rs:884-925 test_input_number_of_channels_change
    fs = 48000.0
    ctx = OfflineAudioContext(2, 3 * Q, fs)
    delay = ctx.create_delay(2.0)
    delay.delay_time.set_value(128.0 / fs)
    delay.connect(ctx.destination)
    mono = ctx.create_buffer(1, Q, fs)
    mono.copy_to_channel(np.array([1.0], np.float32), 0)
    s1 = ctx.create_buffer_source()
    s1.connect(delay)
    s1.buffer = mono
    s1.start(0.0)
    stereo = ctx.create_buffer(2, 256, fs)
    stereo.copy_to_channel(np.array([1.0], np.float32), 0)
    stereo.copy_to_channel(np.array([0.0, 1.0], np.float32), 1)
    s2 = ctx.create_buffer_source()
    s2.connect(delay)
    s2.buffer = stereo
    s2.start(128.0 / fs)
    out = _render(ctx)
    exp_l = np.zeros(3 * Q, np.float32)
    exp_l[128] = 1.0
    exp_l[256] = 1.0
    exp_r = np.zeros(3 * Q, np.float32)
    exp_r[128] = 1.0
    exp_r[257] = 1.0
    np.testing.assert_allclose(out.get_channel_data(0), exp_l, atol=1e-5)
    np.testing.assert_allclose(out.get_channel_data(1), exp_r, atol=1e-5)


def test_delay_source_starting_late():
    # delay.rs:927-960 test_node_stays_alive_long_enough (lifetime rules are
    # obsoleted by whole-graph compilation; the observable output contract
    # remains: dirac played in the 4th block, delayed one more block)
    fs = 48000.0
    ctx = OfflineAudioContext(1, 5 * Q, fs)
    delay = ctx.create_delay(1.0)
    delay.delay_time.set_value(128.0 / fs)
    delay.connect(ctx.destination)
    dirac = ctx.create_buffer(1, 1, fs)
    dirac.copy_to_channel(np.array([1.0], np.float32), 0)
    src = ctx.create_buffer_source()
    src.connect(delay)
    src.buffer = dirac
    src.start(128.0 * 3.0 / fs)
    ch = _render(ctx).get_channel_data(0)
    expected = np.zeros(5 * Q, np.float32)
    expected[4 * Q] = 1.0
    np.testing.assert_allclose(ch, expected, atol=1e-5)


@pytest.mark.parametrize("i", [0, 1, 63, 64, 127])
def test_delay_subquantum(i):
    # delay.rs:963-989 test_subquantum_delay (i in 0..128; representative set)
    fs = 48000.0
    ctx = OfflineAudioContext(1, Q, fs)
    delay = ctx.create_delay(1.0)
    delay.delay_time.set_value(i / fs)
    delay.connect(ctx.destination)
    dirac = ctx.create_buffer(1, 1, fs)
    dirac.copy_to_channel(np.array([1.0], np.float32), 0)
    src = ctx.create_buffer_source()
    src.connect(delay)
    src.buffer = dirac
    src.start(0.0)
    ch = _render(ctx).get_channel_data(0)
    expected = np.zeros(Q, np.float32)
    expected[i] = 1.0
    np.testing.assert_allclose(ch, expected, atol=1e-5)


def test_delay_min_clamp_in_loop():
    # delay.rs:991-1024 test_min_delay_when_in_loop — a delay inside a cycle
    # is clamped to one render quantum even if delay_time is smaller
    fs = 48000.0
    ctx = OfflineAudioContext(1, 256, fs)
    delay = ctx.create_delay(1.0)
    delay.delay_time.set_value(1.0 / fs)
    delay.connect(ctx.destination)
    gain = ctx.create_gain()
    gain.gain.set_value(0.0)
    delay.connect(gain)
    gain.connect(delay)
    dirac = ctx.create_buffer(1, 1, fs)
    dirac.copy_to_channel(np.array([1.0], np.float32), 0)
    src = ctx.create_buffer_source()
    src.connect(delay)
    src.buffer = dirac
    src.start(0.0)
    ch = _render(ctx).get_channel_data(0)
    expected = np.zeros(256, np.float32)
    expected[128] = 1.0
    np.testing.assert_allclose(ch, expected, atol=0.0)


@pytest.mark.parametrize("delay_seconds", [1.0, 1.5])
def test_delay_max_delay_tone(delay_seconds):
    # delay.rs:1026-1075 test_max_delay (WPT delaynode-max-*-delay.html):
    # a 2 s 20 Hz tone through delay==max_delay passes through unchanged
    fs = 44100.0
    length = 4 * int(fs)
    ctx = OfflineAudioContext(1, length, fs)
    tone_len = 2 * int(fs)
    tone = ctx.create_buffer(1, tone_len, fs)
    i = np.arange(tone_len, dtype=np.float32)
    data = np.sin(np.float32(20.0) * 2.0 * np.float32(np.pi) * i / np.float32(fs))
    tone.copy_to_channel(data.astype(np.float32), 0)
    src = ctx.create_buffer_source()
    src.buffer = tone
    delay = ctx.create_delay(delay_seconds)
    delay.delay_time.set_value(delay_seconds)
    src.connect(delay)
    delay.connect(ctx.destination)
    src.start(0.0)
    out = _render(ctx).get_channel_data(0)
    d = int(delay_seconds * fs)
    np.testing.assert_allclose(out[:d], 0.0, atol=1e-7)
    np.testing.assert_allclose(out[d:d + tone_len], data, atol=2e-7)
    np.testing.assert_allclose(out[d + tone_len:], 0.0, atol=1e-7)


def test_delay_max_smaller_than_quantum():
    # delay.rs:1077-1120 test_max_delay_smaller_than_quantum_size — in a
    # loop, both max_delay and delay_time clamp up to one quantum
    fs = 48000.0
    ctx = OfflineAudioContext(1, 256, fs)
    delay = ctx.create_delay(64.0 / fs)
    delay.delay_time.set_value(64.0 / fs)
    delay.connect(ctx.destination)
    gain = ctx.create_gain()
    gain.gain.set_value(0.0)
    delay.connect(gain)
    gain.connect(delay)
    dirac = ctx.create_buffer(1, 1, fs)
    dirac.copy_to_channel(np.array([1.0], np.float32), 0)
    src = ctx.create_buffer_source()
    src.connect(delay)
    src.buffer = dirac
    src.start(0.0)
    ch = _render(ctx).get_channel_data(0)
    expected = np.zeros(256, np.float32)
    expected[128] = 1.0
    np.testing.assert_allclose(ch, expected, atol=0.0)


@pytest.mark.parametrize("quanta,total", [(1, 256), (2, 384)])
def test_delay_max_delay_multiple_of_quantum(quanta, total):
    # delay.rs:1122-1148 / 1150-1176 test_max_delay_multiple_of_quantum_size
    fs = 48000.0
    ctx = OfflineAudioContext(1, total, fs)
    max_delay = quanta * 128.0 / fs
    delay = ctx.create_delay(max_delay)
    delay.delay_time.set_value(max_delay)
    delay.connect(ctx.destination)
    dirac = ctx.create_buffer(1, 1, fs)
    dirac.copy_to_channel(np.array([1.0], np.float32), 0)
    src = ctx.create_buffer_source()
    src.connect(delay)
    src.buffer = dirac
    src.start(0.0)
    ch = _render(ctx).get_channel_data(0)
    expected = np.zeros(total, np.float32)
    expected[quanta * 128] = 1.0
    np.testing.assert_allclose(ch, expected, atol=1e-5)


def test_delay_subquantum_dynamic_lifetime():
    # delay.rs:1178-1208 test_subquantum_delay_dynamic_lifetime — a source
    # that ends early must not trick the delay into cycle-clamping
    fs = 48000.0
    ctx = OfflineAudioContext(1, 3 * Q, fs)
    delay = ctx.create_delay(1.0)
    delay.delay_time.set_value(64.0 / fs)
    delay.connect(ctx.destination)
    src = ctx.create_constant_source()
    src.connect(delay)
    src.start(0.0)
    src.stop(120.0 / fs)
    ch = _render(ctx).get_channel_data(0)
    expected = np.zeros(3 * Q, np.float32)
    expected[64:64 + 120] = 1.0
    np.testing.assert_allclose(ch, expected, atol=1e-5)


# ---------------------------------------------------------------------------
# ConstantSourceNode — /root/reference/src/node/constant_source.rs
# ---------------------------------------------------------------------------

def test_constant_source_start_stop_subquantum():
    # constant_source.rs:307-340 test_start_stop
    fs = 48000.0
    ctx = OfflineAudioContext(1, 4 * Q, fs)
    src = ctx.create_constant_source()
    src.connect(ctx.destination)
    src.start(129.0 / fs)
    src.stop(257.0 / fs)
    ch = _render(ctx).get_channel_data(0)
    np.testing.assert_allclose(ch[0:128], 0.0, atol=0.0)
    exp2 = np.ones(128, np.float32)
    exp2[0] = 0.0
    np.testing.assert_allclose(ch[128:256], exp2, atol=0.0)
    exp3 = np.zeros(128, np.float32)
    exp3[0] = 1.0
    np.testing.assert_allclose(ch[256:384], exp3, atol=0.0)
    np.testing.assert_allclose(ch[384:512], 0.0, atol=0.0)


def test_constant_source_start_in_the_past():
    # constant_source.rs:341-358 test_start_in_the_past — start_at(0) issued
    # during the suspend at quantum 1 applies from that quantum on
    fs = 48000.0
    ctx = OfflineAudioContext(1, 2 * Q, fs)

    def cb(context):
        src = context.create_constant_source()
        src.connect(context.destination)
        src.start(0.0)

    ctx.suspend_sync(128.0 / fs, cb)
    ch = _render(ctx).get_channel_data(0)
    np.testing.assert_allclose(ch[0:128], 0.0, atol=0.0)
    np.testing.assert_allclose(ch[128:], 1.0, atol=0.0)


def test_constant_source_start_future_while_dropped():
    # constant_source.rs:360-377 test_start_in_the_future_while_dropped —
    # Rust drop() does not cancel a scheduled start; sub-quantum start at 258
    fs = 48000.0
    ctx = OfflineAudioContext(1, 4 * Q, fs)
    src = ctx.create_constant_source()
    src.connect(ctx.destination)
    src.start(258.0 / fs)
    del src
    ch = _render(ctx).get_channel_data(0)
    np.testing.assert_allclose(ch[0:258], 0.0, atol=0.0)
    np.testing.assert_allclose(ch[258:], 1.0, atol=0.0)


# ---------------------------------------------------------------------------
# StereoPannerNode — /root/reference/src/node/stereo_panner.rs
# ---------------------------------------------------------------------------

def _mono_pan_render(pan):
    fs = 44100.0
    ctx = OfflineAudioContext(2, Q, fs)
    panner = ctx.create_stereo_panner(pan=pan)
    panner.channel_count = 1
    panner.channel_count_mode = "clamped-max"
    panner.connect(ctx.destination)
    buf = ctx.create_buffer(1, Q, fs)
    buf.copy_to_channel(np.ones(Q, np.float32), 0)
    src = ctx.create_buffer_source()
    src.connect(panner)
    src.buffer = buf
    src.start()
    out = _render(ctx)
    return out.get_channel_data(0), out.get_channel_data(1)


def test_stereo_panner_mono_left_right_center():
    # stereo_panner.rs:370-469 test_mono_panning
    l, r = _mono_pan_render(-1.0)
    np.testing.assert_allclose(l, 1.0, atol=0.0)
    np.testing.assert_allclose(r, 0.0, atol=0.0)
    l, r = _mono_pan_render(1.0)
    np.testing.assert_allclose(l, 0.0, atol=1e-7)
    np.testing.assert_allclose(r, 1.0, atol=0.0)
    l, r = _mono_pan_render(0.0)
    np.testing.assert_allclose(l * l + r * r, 1.0, atol=1.2e-7)


def _stereo_pan_render(pan):
    fs = 44100.0
    ctx = OfflineAudioContext(2, Q, fs)
    panner = ctx.create_stereo_panner(pan=pan)
    panner.connect(ctx.destination)
    buf = ctx.create_buffer(2, Q, fs)
    buf.copy_to_channel(np.ones(Q, np.float32), 0)
    buf.copy_to_channel(np.ones(Q, np.float32), 1)
    src = ctx.create_buffer_source()
    src.connect(panner)
    src.buffer = buf
    src.start()
    out = _render(ctx)
    return out.get_channel_data(0), out.get_channel_data(1)


def test_stereo_panner_stereo_left_right_center():
    # stereo_panner.rs:472-569 test_stereo_panning
    l, r = _stereo_pan_render(-1.0)
    np.testing.assert_allclose(l, 2.0, atol=0.0)
    np.testing.assert_allclose(r, 0.0, atol=0.0)
    l, r = _stereo_pan_render(1.0)
    np.testing.assert_allclose(l, 0.0, atol=1e-7)
    np.testing.assert_allclose(r, 2.0, atol=0.0)
    l, r = _stereo_pan_render(0.0)
    np.testing.assert_allclose(l, 1.0, atol=1e-7)
    np.testing.assert_allclose(r, 1.0, atol=0.0)


# ---------------------------------------------------------------------------
# ChannelMerger / ChannelSplitter
# ---------------------------------------------------------------------------

def test_channel_merger_merge():
    # channel_merger.rs:207-232 test_merge
    fs = 48000.0
    ctx = OfflineAudioContext(2, Q, fs)
    merger = ctx.create_channel_merger(2)
    merger.connect(ctx.destination)
    s1 = ctx.create_constant_source()
    s1.offset.set_value(2.0)
    s1.connect(merger, 0, 0)
    s1.start()
    s2 = ctx.create_constant_source()
    s2.offset.set_value(3.0)
    s2.connect(merger, 0, 1)
    s2.start()
    out = _render(ctx)
    np.testing.assert_allclose(out.get_channel_data(0), 2.0, atol=0.0)
    np.testing.assert_allclose(out.get_channel_data(1), 3.0, atol=0.0)


def test_channel_merger_disconnect_mid_render():
    # channel_merger.rs:234-271 test_merge_disconnect
    fs = 48000.0
    length = 4 * Q
    ctx = OfflineAudioContext(2, length, fs)
    merger = ctx.create_channel_merger(2)
    merger.connect(ctx.destination)
    s1 = ctx.create_constant_source()
    s1.offset.set_value(2.0)
    s1.connect(merger, 0, 0)
    s1.start()
    s2 = ctx.create_constant_source()
    s2.offset.set_value(3.0)
    s2.connect(merger, 0, 1)
    s2.start()
    ctx.suspend_sync(length / fs / 2.0, lambda _ctx: s2.disconnect())
    out = _render(ctx)
    np.testing.assert_allclose(out.get_channel_data(0), 2.0, atol=0.0)
    right = out.get_channel_data(1)
    np.testing.assert_allclose(right[: length // 2], 3.0, atol=0.0)
    np.testing.assert_allclose(right[length // 2:], 0.0, atol=0.0)


def test_channel_splitter():
    # channel_splitter.rs:261-287 test_splitter — 2nd output to destination
    fs = 48000.0
    ctx = OfflineAudioContext(1, Q, fs)
    splitter = ctx.create_channel_splitter(2)
    splitter.connect(ctx.destination, 1, 0)
    buf = ctx.create_buffer(2, 1, fs)
    buf.copy_to_channel(np.array([1.0], np.float32), 0)
    buf.copy_to_channel(np.array([-1.0], np.float32), 1)
    src = ctx.create_buffer_source(loop=True)
    src.buffer = buf
    src.start()
    src.connect(splitter)
    out = _render(ctx)
    np.testing.assert_allclose(out.get_channel_data(0), -1.0, atol=0.0)


# ---------------------------------------------------------------------------
# WaveShaperNode — /root/reference/src/node/waveshaper.rs
# ---------------------------------------------------------------------------

def test_waveshaper_shape_boundaries():
    # waveshaper.rs:673-709 test_shape_boundaries
    fs = 44100.0
    ctx = OfflineAudioContext(1, 3 * Q, fs)
    shaper = ctx.create_wave_shaper()
    shaper.curve = [-0.5, 0.0, 0.5]
    shaper.connect(ctx.destination)
    data = np.zeros(3 * Q, np.float32)
    expected = np.zeros(3 * Q, np.float32)
    data[:Q] = -1.0
    expected[:Q] = -0.5
    data[2 * Q:] = 1.0
    expected[2 * Q:] = 0.5
    buf = ctx.create_buffer(1, 3 * Q, fs)
    buf.copy_to_channel(data, 0)
    src = ctx.create_buffer_source()
    src.connect(shaper)
    src.buffer = buf
    src.start(0.0)
    ch = _render(ctx).get_channel_data(0)
    np.testing.assert_allclose(ch, expected, atol=0.0)


def test_waveshaper_shape_interpolation():
    # waveshaper.rs:711-745 test_shape_interpolation
    fs = 44100.0
    ctx = OfflineAudioContext(1, Q, fs)
    shaper = ctx.create_wave_shaper()
    shaper.curve = [-0.5, 0.0, 0.5]
    shaper.connect(ctx.destination)
    i = np.arange(Q, dtype=np.float32)
    data = i / np.float32(Q) * 2.0 - 1.0
    expected = data / 2.0
    buf = ctx.create_buffer(1, 3 * Q, fs)
    buf.copy_to_channel(data.astype(np.float32), 0)
    src = ctx.create_buffer_source()
    src.connect(shaper)
    src.buffer = buf
    src.start(0.0)
    ch = _render(ctx).get_channel_data(0)
    np.testing.assert_allclose(ch, expected, atol=1e-7)


# ---------------------------------------------------------------------------
# OscillatorNode — /root/reference/src/node/oscillator.rs
# ---------------------------------------------------------------------------

def test_oscillator_start_in_the_past():
    # oscillator.rs:1311-1342 test_start_in_the_past — start_at(0) issued at
    # the quantum-1 suspend renders a sine with phase 0 from sample 128
    freq = 8910.1
    fs = 44100.0
    ctx = OfflineAudioContext(1, int(fs), fs)

    def cb(context):
        osc = context.create_oscillator()
        osc.connect(context.destination)
        osc.frequency.set_value(freq)
        osc.start(0.0)

    ctx.suspend_sync(128.0 / fs, cb)
    result = _render(ctx).get_channel_data(0)
    n = int(fs)
    expected = np.zeros(n, np.float64)
    k = np.arange(n - 128, dtype=np.float64)
    # the reference's phase_incr is (freq as f32) as f64 / fs
    expected[128:] = np.sin(k * (float(np.float32(freq)) / fs) * 2.0 * np.pi)
    np.testing.assert_allclose(result, expected.astype(np.float32), atol=1e-5)


@pytest.mark.parametrize("freq,detune", [
    (20000.0, 1200.0),    # oscillator.rs:1345-1362 above nyquist -> silence
    (-20000.0, 1200.0),   # oscillator.rs:1365-1382 below -nyquist -> silence
])
def test_oscillator_beyond_nyquist_is_silent(freq, detune):
    fs = 44100.0
    ctx = OfflineAudioContext(1, Q, fs)
    osc = ctx.create_oscillator()
    osc.connect(ctx.destination)
    osc.frequency.set_value(freq)
    osc.detune.set_value(detune)
    osc.start(0.0)
    result = _render(ctx).get_channel_data(0)
    np.testing.assert_allclose(result, 0.0, atol=1e-5)


# ---------------------------------------------------------------------------
# AudioBufferSourceNode — /root/reference/src/node/audio_buffer_source.rs
# ---------------------------------------------------------------------------

def _dirac_ctx(fs=48000.0, length=Q, data=(1.0,), buf_len=None):
    ctx = OfflineAudioContext(1, length, fs)
    buf = ctx.create_buffer(1, buf_len or len(data), fs)
    buf.copy_to_channel(np.array(data, np.float32), 0)
    src = ctx.create_buffer_source()
    src.connect(ctx.destination)
    src.buffer = buf
    return ctx, src


def test_bufsrc_sub_quantum_start_1():
    # audio_buffer_source.rs:974-993 test_sub_quantum_start_1
    fs = 48000.0
    ctx, src = _dirac_ctx(fs)
    src.start(1.0 / fs)
    ch = _render(ctx).get_channel_data(0)
    expected = np.zeros(Q, np.float32)
    expected[1] = 1.0
    np.testing.assert_allclose(ch, expected, atol=0.0)


def test_bufsrc_sample_accurate_scheduling():
    # audio_buffer_source.rs:997-1033 test_sub_quantum_start_2 (WPT
    # sample-accurate-scheduling.html)
    fs = 44100.0
    ctx = OfflineAudioContext(2, int(4 * fs), fs)
    dirac = ctx.create_buffer(2, 512, fs)
    dirac.copy_to_channel(np.array([1.0], np.float32), 0)
    dirac.copy_to_channel(np.array([1.0], np.float32), 1)
    offsets = [0, 3, 512, 517, 1000, 1005, 20000, 21234, 37590]
    for idx in offsets:
        src = ctx.create_buffer_source()
        src.buffer = dirac
        src.connect(ctx.destination)
        src.start(idx / fs)
    out = _render(ctx)
    left, right = out.get_channel_data(0), out.get_channel_data(1)
    np.testing.assert_allclose(left, right, atol=0.0)
    for idx in offsets:
        assert left[idx] != 0.0, f"zero sample at index {idx}"


def test_bufsrc_sub_sample_start():
    # audio_buffer_source.rs:1036-1057 test_sub_sample_start
    fs = 48000.0
    ctx, src = _dirac_ctx(fs)
    src.start(1.5 / fs)
    ch = _render(ctx).get_channel_data(0)
    expected = np.zeros(Q, np.float32)
    expected[2] = 0.5
    np.testing.assert_allclose(ch, expected, atol=0.0)


@pytest.mark.parametrize("start,stop,expected_idx", [
    (0.0, 4.0, None),    # rs:1059-1079 stop at dirac -> not played (fast)
    (1.0, 4.0, None),    # rs:1081-1101 slow track variant
    (0.0, 4.5, 4),       # rs:1103-1125 stop between diracs (fast)
    (1.0, 5.5, 5),       # rs:1127-1149 slow track variant
])
def test_bufsrc_sub_quantum_and_sample_stop(start, stop, expected_idx):
    fs = 48000.0
    data = [0.0, 0.0, 0.0, 0.0, 1.0, 1.0] if stop > 4.0 else \
        ([0.0, 0.0, 0.0, 1.0] if start == 1.0 else [0.0, 0.0, 0.0, 0.0, 1.0])
    ctx, src = _dirac_ctx(fs, data=tuple(data), buf_len=Q)
    src.start(start / fs)
    src.stop(stop / fs)
    ch = _render(ctx).get_channel_data(0)
    expected = np.zeros(Q, np.float32)
    if expected_idx is not None:
        expected[expected_idx] = 1.0
    np.testing.assert_allclose(ch, expected, atol=0.0)


def test_bufsrc_start_in_the_past():
    # audio_buffer_source.rs:1151-1173 test_start_in_the_past
    fs = 48000.0
    ctx = OfflineAudioContext(1, 2 * Q, fs)
    dirac = ctx.create_buffer(1, 1, fs)
    dirac.copy_to_channel(np.array([1.0], np.float32), 0)

    def cb(context):
        src = context.create_buffer_source()
        src.connect(context.destination)
        src.buffer = dirac
        src.start(0.0)

    ctx.suspend_sync(128.0 / fs, cb)
    ch = _render(ctx).get_channel_data(0)
    expected = np.zeros(2 * Q, np.float32)
    expected[128] = 1.0
    np.testing.assert_allclose(ch, expected, atol=0.0)


@pytest.mark.parametrize("buf_sr", [22500, 38000, 43800, 48000, 96000])
def test_bufsrc_buffer_resampling(buf_sr):
    # audio_buffer_source.rs:1175-1218 test_audio_buffer_resampling — a 1 Hz
    # sine in a buffer at buf_sr plays back as a 1 Hz sine at the context
    # rate (linear interpolation error budget from the reference)
    base_sr = 44100
    ctx = OfflineAudioContext(1, base_sr, float(base_sr))
    buf = ctx.create_buffer(1, buf_sr, float(buf_sr))
    i = np.arange(buf_sr, dtype=np.float32)
    sine = np.sin(np.float32(1.0) * i / np.float32(buf_sr) * 2.0
                  * np.float32(np.pi))
    buf.copy_to_channel(sine.astype(np.float32), 0)
    src = ctx.create_buffer_source()
    src.connect(ctx.destination)
    src.buffer = buf
    src.start()
    ch = _render(ctx).get_channel_data(0)
    k = np.arange(base_sr, dtype=np.float64)
    expected = np.sin(k / base_sr * 2.0 * np.pi)
    np.testing.assert_allclose(ch, expected, atol=1e-6)


def test_bufsrc_playback_rate_half():
    # audio_buffer_source.rs:1220-1255 test_playback_rate
    fs = 44100
    ctx = OfflineAudioContext(1, fs, float(fs))
    buf = ctx.create_buffer(1, fs, float(fs))
    i = np.arange(fs, dtype=np.float32)
    sine = np.sin(i / np.float32(fs) * 2.0 * np.float32(np.pi))
    buf.copy_to_channel(sine.astype(np.float32), 0)
    src = ctx.create_buffer_source()
    src.connect(ctx.destination)
    src.buffer = buf
    src.playback_rate.set_value(0.5)
    src.start()
    ch = _render(ctx).get_channel_data(0)
    expected = np.sin(np.arange(fs, dtype=np.float64) / fs * np.pi)
    np.testing.assert_allclose(ch, expected, atol=1e-6)


def test_bufsrc_negative_playback_rate():
    # audio_buffer_source.rs:1258-1291 test_negative_playback_rate
    fs = 44100
    ctx = OfflineAudioContext(1, fs, float(fs))
    buf = ctx.create_buffer(1, fs, float(fs))
    i = np.arange(fs, dtype=np.float32)
    sine = np.sin(i / np.float32(fs) * 2.0 * np.float32(np.pi)).astype(
        np.float32)
    buf.copy_to_channel(sine, 0)
    src = ctx.create_buffer_source()
    src.connect(ctx.destination)
    src.buffer = buf
    src.playback_rate.set_value(-1.0)
    src.start_at_with_offset(0.0, buf.duration)
    ch = _render(ctx).get_channel_data(0)
    expected = np.concatenate([[0.0], sine[::-1][:-1]])
    np.testing.assert_allclose(ch, expected, atol=1e-6)


def test_bufsrc_detune_minus_octave():
    # audio_buffer_source.rs:1294-1329 test_detune (-1200 cents == rate 0.5)
    fs = 44100
    ctx = OfflineAudioContext(1, fs, float(fs))
    buf = ctx.create_buffer(1, fs, float(fs))
    i = np.arange(fs, dtype=np.float32)
    sine = np.sin(i / np.float32(fs) * 2.0 * np.float32(np.pi))
    buf.copy_to_channel(sine.astype(np.float32), 0)
    src = ctx.create_buffer_source()
    src.connect(ctx.destination)
    src.buffer = buf
    src.detune.set_value(-1200.0)
    src.start()
    ch = _render(ctx).get_channel_data(0)
    expected = np.sin(np.arange(fs, dtype=np.float64) / fs * np.pi)
    np.testing.assert_allclose(ch, expected, atol=1e-6)


@pytest.mark.parametrize("start", [0.0, 1.0])
def test_bufsrc_end_of_file(start):
    # audio_buffer_source.rs:1332-1356 (fast) / 1358-1382 (slow track) —
    # a 129-frame buffer with diracs at 0 and 128 plays exactly once
    fs = 48000.0
    ctx = OfflineAudioContext(1, 2 * Q, fs)
    buf = ctx.create_buffer(1, 129, fs)
    data = np.zeros(129, np.float32)
    data[0] = 1.0
    data[128] = 1.0
    buf.copy_to_channel(data, 0)
    src = ctx.create_buffer_source()
    src.connect(ctx.destination)
    src.buffer = buf
    src.start(start / fs)
    ch = _render(ctx).get_channel_data(0)
    expected = np.zeros(256, np.float32)
    expected[int(start)] = 1.0
    expected[128 + int(start)] = 1.0
    np.testing.assert_allclose(ch, expected, atol=1e-10)


@pytest.mark.parametrize("start,offset,duration,expected_idx", [
    (0.0, 0.0, 4.5, 4),   # rs:1384-1405 test_with_duration_0
    (1.0, 0.0, 4.5, 5),   # rs:1407-1435 test_with_duration_1 (slow track)
    (0.0, 1.0, 3.5, 3),   # rs:1479-1507 test_with_offset
])
def test_bufsrc_duration_and_offset(start, offset, duration, expected_idx):
    fs = 48000.0
    ctx, src = _dirac_ctx(fs, data=(0.0, 0.0, 0.0, 0.0, 1.0, 1.0), buf_len=Q)
    src.start(start / fs, offset / fs, duration / fs)
    ch = _render(ctx).get_channel_data(0)
    expected = np.zeros(Q, np.float32)
    expected[expected_idx] = 1.0
    np.testing.assert_allclose(ch, expected, atol=0.0)


def test_bufsrc_sub_sample_grain():
    # audio_buffer_source.rs:1437-1477 test_with_duration_2 (WPT
    # sub-sample-scheduling.html / sub-sample-grain)
    fs = 32768.0
    ctx = OfflineAudioContext(1, Q, fs)
    buf = ctx.create_buffer(1, Q, fs)
    buf.copy_to_channel(np.ones(Q, np.float32), 0)
    start_grain, end_grain = 3.1, 37.2
    src = ctx.create_buffer_source()
    src.connect(ctx.destination)
    src.buffer = buf
    src.start(start_grain / fs, 0.0, (end_grain - start_grain) / fs)
    ch = _render(ctx).get_channel_data(0)
    expected = np.ones(Q, np.float32)
    expected[: int(np.floor(start_grain)) + 1] = 0.0
    expected[int(np.ceil(end_grain)):] = 0.0
    np.testing.assert_allclose(ch, expected, atol=0.0)


def test_bufsrc_reverse_playback_with_duration():
    # audio_buffer_source.rs:1537-1556 test_reverse_playback_with_duration
    fs = 48000.0
    ctx = OfflineAudioContext(1, Q, fs)
    buf = ctx.create_buffer(1, 5, fs)
    buf.copy_to_channel(np.array([1, 2, 3, 4, 5], np.float32), 0)
    src = ctx.create_buffer_source()
    src.connect(ctx.destination)
    src.buffer = buf
    src.playback_rate.set_value(-1.0)
    src.start(0.0, buf.duration, 2.0 / fs)
    ch = _render(ctx).get_channel_data(0)
    expected = np.zeros(Q, np.float32)
    expected[1] = 5.0
    np.testing.assert_allclose(ch, expected, atol=0.0)


def test_bufsrc_offset_larger_than_buffer():
    # audio_buffer_source.rs:1558-1574 test_offset_larger_than_buffer_duration
    fs = 48000.0
    ctx = OfflineAudioContext(1, Q, fs)
    buf = ctx.create_buffer(1, 13, fs)
    buf.copy_to_channel(np.ones(13, np.float32), 0)
    src = ctx.create_buffer_source()
    src.buffer = buf
    src.connect(ctx.destination)
    src.start_at_with_offset(0.0, 64.0 / fs)
    ch = _render(ctx).get_channel_data(0)
    np.testing.assert_allclose(ch, 0.0, atol=0.0)


_LOOP_LENS = [Q // 2 - 1, Q // 2, Q // 2 + 1, Q - 1, Q, Q + 1,
              2 * Q - 1, 2 * Q, 2 * Q + 1]


@pytest.mark.parametrize("start", [0, 1])
def test_bufsrc_loop_mono(start):
    # audio_buffer_source.rs:1576-1613 (fast) / 1615-1652 (slow track)
    fs = 48000.0
    length = 4 * Q
    for buffer_len in _LOOP_LENS:
        ctx = OfflineAudioContext(1, length, fs)
        dirac = ctx.create_buffer(1, buffer_len, fs)
        dirac.copy_to_channel(np.array([1.0], np.float32), 0)
        src = ctx.create_buffer_source(loop=True)
        src.connect(ctx.destination)
        src.buffer = dirac
        src.start(start / fs)
        ch = _render(ctx).get_channel_data(0)
        expected = np.zeros(length, np.float32)
        expected[start::buffer_len] = 1.0
        np.testing.assert_allclose(ch, expected, atol=1e-9,
                                   err_msg=f"buffer_len={buffer_len}")


@pytest.mark.parametrize("start", [0, 1])
def test_bufsrc_loop_stereo(start):
    # audio_buffer_source.rs:1654-1704 (fast) / 1706-1756 (slow track)
    fs = 48000.0
    length = 4 * Q
    for buffer_len in _LOOP_LENS:
        ctx = OfflineAudioContext(2, length, fs)
        dirac = ctx.create_buffer(2, buffer_len, fs)
        dirac.copy_to_channel(np.array([1.0], np.float32), 0)
        dirac.copy_to_channel(np.array([0.0, 1.0], np.float32), 1)
        src = ctx.create_buffer_source(loop=True)
        src.connect(ctx.destination)
        src.buffer = dirac
        src.start(start / fs)
        out = _render(ctx)
        exp_l = np.zeros(length, np.float32)
        exp_r = np.zeros(length, np.float32)
        for i in range(start, length, buffer_len):
            exp_l[i] = 1.0
            if i < length - 1:
                exp_r[i + 1] = 1.0
        np.testing.assert_allclose(out.get_channel_data(0), exp_l, atol=1e-9,
                                   err_msg=f"buffer_len={buffer_len}")
        np.testing.assert_allclose(out.get_channel_data(1), exp_r, atol=1e-9,
                                   err_msg=f"buffer_len={buffer_len}")


def test_bufsrc_reverse_loop_boundaries():
    # audio_buffer_source.rs:1758-1778 test_reverse_loop_boundaries
    fs = 48000.0
    ctx = OfflineAudioContext(1, Q, fs)
    buf = ctx.create_buffer(1, 5, fs)
    buf.copy_to_channel(np.array([1, 2, 3, 4, 5], np.float32), 0)
    src = ctx.create_buffer_source(loop=True)
    src.connect(ctx.destination)
    src.buffer = buf
    src.loop_start = 1.0 / fs
    src.loop_end = 4.0 / fs
    src.playback_rate.set_value(-1.0)
    src.start_at_with_offset(0.0, 3.0 / fs)
    ch = _render(ctx).get_channel_data(0)
    expected = np.array([4, 3, 2, 4, 3, 2, 4, 3], np.float32)
    np.testing.assert_allclose(ch[:8], expected, atol=0.0)


@pytest.mark.parametrize("loop_start,loop_end", [
    (-2.0, -1.0), (-1.0, -2.0), (0.0, 0.0), (-1.0, 2.0),
    (2.0, -1.0), (1.0, 1.0), (2.0, 3.0), (3.0, 2.0),
])
def test_bufsrc_loop_out_of_bounds(loop_start, loop_end):
    # audio_buffer_source.rs:1780-1835 test_loop_out_of_bounds — loop points
    # outside the buffer mean the whole buffer loops
    fs = 48000.0
    length = int(fs) // 10
    ctx = OfflineAudioContext(1, length, fs)
    buf = ctx.create_buffer(1, 500, fs)
    buf.copy_to_channel(np.array([1.0], np.float32), 0)
    src = ctx.create_buffer_source(loop=True)
    src.connect(ctx.destination)
    src.buffer = buf
    src.loop_start = loop_start
    src.loop_end = loop_end
    src.start()
    ch = _render(ctx).get_channel_data(0)
    expected = np.zeros(length, np.float32)
    expected[::500] = 1.0
    np.testing.assert_allclose(ch, expected, atol=1e-10)


@pytest.mark.parametrize("buffer_rate,err", [
    (44100.0, 9.0957e-5), (43800.0, 3.8986e-3),
])
def test_bufsrc_subsample_buffer_stitching(buffer_rate, err):
    # audio_buffer_source.rs:1987-2040 test_subsample_buffer_stitching (WPT
    # sub-sample-scheduling.html): a sine sliced into 30-frame buffers
    # scheduled back-to-back reconstructs the sine
    fs = 44100.0
    buffer_length = 30
    frequency = 440.0
    length = buffer_length * 15
    ctx = OfflineAudioContext(2, length, fs)
    i = np.arange(length, dtype=np.float32)
    omega = np.float32(2.0 * np.pi) / np.float32(buffer_rate) * np.float32(
        frequency)
    wave = np.sin(omega * i).astype(np.float32)
    for k in range(0, length, buffer_length):
        buf = ctx.create_buffer(1, buffer_length, buffer_rate)
        buf.copy_to_channel(wave[k:k + buffer_length], 0)
        src = ctx.create_buffer_source()
        src.buffer = buf
        src.connect(ctx.destination)
        src.start(k / buffer_rate)
    ch = _render(ctx).get_channel_data(0)
    k = np.arange(length, dtype=np.float64)
    expected = np.sin(2.0 * np.pi / fs * frequency * k)
    np.testing.assert_allclose(ch, expected, atol=err)


# ---------------------------------------------------------------------------
# DynamicsCompressorNode — /root/reference/src/node/dynamics_compressor.rs
# ---------------------------------------------------------------------------

def test_compressor_inner_delay():
    # dynamics_compressor.rs:524-562 test_inner_delay — the lookahead delay
    # (6 ms) rounds up to 3 quanta at 44.1 kHz: silence before, signal after
    fs = 44100.0
    non_zero_index = int(np.ceil(0.006 * fs / Q)) * Q
    ctx = OfflineAudioContext(1, Q * 8, fs)
    comp = ctx.create_dynamics_compressor()
    comp.connect(ctx.destination)
    buf = ctx.create_buffer(1, Q * 5, fs)
    buf.copy_to_channel(np.ones(Q * 5, np.float32), 0)
    src = ctx.create_buffer_source()
    src.buffer = buf
    src.connect(comp)
    src.start()
    ch = _render(ctx).get_channel_data(0)
    np.testing.assert_allclose(ch[:non_zero_index], 0.0, atol=0.0)
    assert np.all(ch[non_zero_index: Q * 8] != 0.0)
