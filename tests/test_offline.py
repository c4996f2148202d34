"""End-to-end offline rendering tests.

Mirrors reference tests/offline.rs and the in-module OfflineAudioContext
patterns (constant_source.rs:307-340, gain.rs tests).
"""

import numpy as np
import pytest

from webaudio_tpu import OfflineAudioContext
from webaudio_tpu.constants import RENDER_QUANTUM_SIZE


def test_constant_source_render():
    ctx = OfflineAudioContext(1, 256, 48000.0)
    src = ctx.create_constant_source(offset=0.5)
    src.connect(ctx.destination)
    src.start(0.0)
    buf = ctx.start_rendering_sync()
    assert buf.length == 256
    assert buf.number_of_channels == 1
    np.testing.assert_allclose(buf.get_channel_data(0), 0.5, atol=0)


def test_constant_source_gain():
    ctx = OfflineAudioContext(2, 480, 48000.0)
    src = ctx.create_constant_source(offset=1.0)
    g = ctx.create_gain(gain=0.25)
    src.connect(g)
    g.connect(ctx.destination)
    src.start()
    buf = ctx.start_rendering_sync()
    for ch in range(2):
        np.testing.assert_allclose(buf.get_channel_data(ch), 0.25, atol=0)


def test_sub_quantum_start_stop():
    # start rendering in 2nd block, sample-accurate
    # (reference: constant_source.rs:308-340)
    fs = 48000.0
    start = 129 / fs
    stop = 300 / fs
    ctx = OfflineAudioContext(1, 512, fs)
    src = ctx.create_constant_source()
    src.connect(ctx.destination)
    src.start(start)
    src.stop(stop)
    out = ctx.start_rendering_sync().get_channel_data(0)
    expected = np.zeros(512, np.float32)
    expected[129:300] = 1.0
    np.testing.assert_array_equal(out, expected)


def test_source_mixing():
    # two constant sources summed at the destination
    # (reference: tests/offline.rs mixing)
    ctx = OfflineAudioContext(1, 128, 44100.0)
    s1 = ctx.create_constant_source(offset=2.0)
    s2 = ctx.create_constant_source(offset=3.0)
    s1.connect(ctx.destination)
    s2.connect(ctx.destination)
    s1.start()
    s2.start()
    out = ctx.start_rendering_sync().get_channel_data(0)
    np.testing.assert_allclose(out, 5.0)


def test_gain_automation_linear_ramp():
    fs = 48000.0
    n = 480
    ctx = OfflineAudioContext(1, n, fs)
    src = ctx.create_constant_source(offset=1.0)
    g = ctx.create_gain()
    g.gain.set_value_at_time(0.0, 0.0)
    g.gain.linear_ramp_to_value_at_time(1.0, n / fs)
    src.connect(g)
    g.connect(ctx.destination)
    src.start()
    out = ctx.start_rendering_sync().get_channel_data(0)
    expected = np.arange(n, dtype=np.float64) / n
    np.testing.assert_allclose(out, expected.astype(np.float32), atol=1e-6)


def test_unconnected_graph_silent():
    ctx = OfflineAudioContext(2, 256, 48000.0)
    buf = ctx.start_rendering_sync()
    np.testing.assert_array_equal(buf.to_array(), 0.0)


def test_channel_upmix_mono_to_stereo():
    ctx = OfflineAudioContext(2, 128, 48000.0)
    src = ctx.create_constant_source(offset=0.7)
    src.connect(ctx.destination)
    src.start()
    buf = ctx.start_rendering_sync()
    np.testing.assert_allclose(buf.get_channel_data(0), 0.7)
    np.testing.assert_allclose(buf.get_channel_data(1), 0.7)


def test_suspend_graph_mutation():
    # reference: offline.rs:474-508 (suspend_sync building graph mid-render)
    fs = 48000.0
    q = RENDER_QUANTUM_SIZE
    ctx = OfflineAudioContext(1, 4 * q, fs)

    state = {}

    def cb1(c):
        src = c.create_constant_source()
        src.connect(c.destination)
        src.start()
        state["src"] = src

    def cb2(c):
        state["src"].disconnect()

    ctx.suspend_sync(q / fs, cb1)
    ctx.suspend_sync(3 * q / fs, cb2)
    out = ctx.start_rendering_sync().get_channel_data(0)
    np.testing.assert_array_equal(out[:q], 0.0)
    np.testing.assert_array_equal(out[q:3 * q], 1.0)
    np.testing.assert_array_equal(out[3 * q:], 0.0)


def test_delay_sample_accurate():
    # one-sample impulse delayed by exactly 3 samples
    # (reference: delay.rs:767-792)
    fs = 48000.0
    ctx = OfflineAudioContext(1, 256, fs)
    src = ctx.create_constant_source()
    src.start(0.0)
    src.stop(1.0 / fs)  # single-sample impulse
    d = ctx.create_delay(max_delay_time=1.0)
    d.delay_time.set_value(3.0 / fs)
    src.connect(d)
    d.connect(ctx.destination)
    out = ctx.start_rendering_sync().get_channel_data(0)
    expected = np.zeros(256, np.float32)
    expected[3] = 1.0
    np.testing.assert_allclose(out, expected, atol=1e-6)


def test_delay_fractional():
    fs = 48000.0
    ctx = OfflineAudioContext(1, 64 * 128, fs)
    src = ctx.create_constant_source()
    src.start(0.0)
    src.stop(1.0 / fs)
    d = ctx.create_delay(max_delay_time=1.0)
    d.delay_time.set_value(2.5 / fs)
    src.connect(d)
    d.connect(ctx.destination)
    out = ctx.start_rendering_sync().get_channel_data(0)
    assert out[2] == pytest.approx(0.5, abs=1e-6)
    assert out[3] == pytest.approx(0.5, abs=1e-6)
    assert abs(out[4]) < 1e-7


def test_feedback_cycle_with_delay():
    # cycle breaker: src -> gain -> dest, gain -> delay -> gain
    # (reference: tests/offline.rs:206-244)
    fs = 48000.0
    q = RENDER_QUANTUM_SIZE
    ctx = OfflineAudioContext(1, 4 * q, fs)
    src = ctx.create_constant_source()
    src.start(0.0)
    src.stop(1.0 / fs)  # impulse
    mix = ctx.create_gain()
    fb = ctx.create_gain(gain=0.5)
    delay = ctx.create_delay(max_delay_time=1.0)
    delay.delay_time.set_value(q / fs)
    src.connect(mix)
    mix.connect(delay)
    delay.connect(fb)
    fb.connect(mix)
    mix.connect(ctx.destination)
    out = ctx.start_rendering_sync().get_channel_data(0)
    # impulse at 0, echoes at q, 2q, 3q with gain 0.5^k
    assert out[0] == pytest.approx(1.0)
    assert out[q] == pytest.approx(0.5, abs=1e-6)
    assert out[2 * q] == pytest.approx(0.25, abs=1e-6)
    assert out[3 * q] == pytest.approx(0.125, abs=1e-6)
    assert np.abs(out[1:q]).max() < 1e-7


def test_cycle_without_delay_is_muted():
    # reference: tests/offline.rs:171-203
    fs = 48000.0
    ctx = OfflineAudioContext(1, 256, fs)
    src = ctx.create_constant_source()
    src.start()
    g1 = ctx.create_gain()
    g2 = ctx.create_gain()
    src.connect(g1)
    g1.connect(g2)
    g2.connect(g1)  # unbreakable cycle
    g2.connect(ctx.destination)
    out = ctx.start_rendering_sync().get_channel_data(0)
    np.testing.assert_array_equal(out, 0.0)


def test_krate_automation_with_unaligned_length():
    # regression: k-rate automation + render length not a multiple of 128
    # crashed in _advance_param_state
    fs = 44100.0
    ctx = OfflineAudioContext(1, 1000, fs)
    buf = ctx.create_buffer(1, 1000, fs)
    buf.copy_to_channel(np.ones(1000, np.float32), 0)
    src = ctx.create_buffer_source()
    src.buffer = buf
    src.playback_rate.set_value_at_time(2.0, 0.01)  # k-rate param event
    src.connect(ctx.destination)
    src.start()
    out = ctx.start_rendering_sync().get_channel_data(0)
    assert np.isfinite(out).all()


def test_analyser_readback_in_suspend_callback():
    # probe states must be live at suspend boundaries
    fs = 48000.0
    ctx = OfflineAudioContext(1, 4096, fs)
    osc = ctx.create_oscillator(frequency=3000.0)
    an = ctx.create_analyser(fft_size=1024)
    osc.connect(an)
    an.connect(ctx.destination)
    osc.start()
    seen = {}

    def cb(c):
        fd = np.zeros(an.frequency_bin_count, np.float32)
        an.get_float_frequency_data(fd)
        seen["peak_hz"] = float(np.argmax(fd) * fs / 1024)

    ctx.suspend_sync(2048 / fs, cb)
    ctx.start_rendering_sync()
    assert abs(seen["peak_hz"] - 3000.0) < fs / 1024 * 1.5


def test_const_delay_cycle_runs_large_blocks_bit_exact():
    """WEBAUDIO_CYCLE_BLOCKS=auto: a feedback cycle through a CONSTANT
    delay of d frames may legally render blocks up to d-1 frames (every
    in-cycle read lands in carried ring state); output must be
    bit-identical to the default one-quantum stepping."""
    import os
    import numpy as np
    from webaudio_tpu.graph import compiler as C

    os.environ["WEBAUDIO_CYCLE_BLOCKS"] = "auto"
    try:
        _run_cycle_block_check()
    finally:
        os.environ.pop("WEBAUDIO_CYCLE_BLOCKS", None)


def _run_cycle_block_check():
    import numpy as np
    from webaudio_tpu.graph import compiler as C

    fs = 48000.0

    def build(automated=False):
        ctx = OfflineAudioContext(2, int(fs * 1.0), fs)
        n = int(fs * 0.05)
        b = ctx.create_buffer(1, n, fs)
        b.copy_to_channel(
            (np.random.RandomState(0).randn(n)
             * np.exp(-np.arange(n) / 500)).astype(np.float32), 0)
        s = ctx.create_buffer_source()
        s.buffer = b
        d = ctx.create_delay(1.0)
        d.delay_time.value = 0.2
        if automated:
            d.delay_time.linear_ramp_to_value_at_time(0.3, 0.5)
        fb = ctx.create_gain(gain=0.5)
        s.connect(ctx.destination)
        s.connect(d)
        d.connect(fb)
        fb.connect(d)
        fb.connect(ctx.destination)
        s.start()
        return ctx

    ctx = build()
    cg = C.compile_graph(dict(ctx._nodes), list(ctx._edges), ctx.sample_rate,
                         ctx.length, ctx._destination.node_id)
    assert cg.block_frames > 128  # the optimization engaged

    fast = build().start_rendering_sync().to_array()
    ctx2 = build()
    cg2 = C.compile_graph(dict(ctx2._nodes), list(ctx2._edges),
                          ctx2.sample_rate, ctx2.length,
                          ctx2._destination.node_id, quanta_per_block=1)
    out2, _ = C.render_compiled(cg2, ctx2._nodes, ctx2.length)
    ref = np.asarray(out2)[:, : ctx2.length]
    np.testing.assert_array_equal(fast, ref)

    # an automated delay pins the cycle back to one-quantum stepping
    ctx3 = build(automated=True)
    cg3 = C.compile_graph(dict(ctx3._nodes), list(ctx3._edges),
                          ctx3.sample_rate, ctx3.length,
                          ctx3._destination.node_id)
    assert cg3.block_frames == 128
