"""Remaining small reference test-module transcriptions: ScriptProcessor
(script_processor.rs `mod tests`), Analyser construction/after-close
(analyser.rs `mod tests`), Gain immediate param value (gain.rs `mod tests`).
"""

import time

import numpy as np

from webaudio_tpu import AudioContext, OfflineAudioContext


# --- script_processor.rs tests ---------------------------------------------

def test_script_processor_constructor():
    # script_processor.rs test_constructor
    ctx = OfflineAudioContext(2, 1024, 48000.0)
    node = ctx.create_script_processor(512, 1, 1)
    node.connect(ctx.destination)
    ctx.start_rendering_sync()


def test_script_processor_constructor_zero_inputs():
    ctx = OfflineAudioContext(2, 1024, 48000.0)
    ctx.create_script_processor(512, 0, 1)  # must not raise


def test_script_processor_constructor_zero_outputs():
    ctx = OfflineAudioContext(2, 1024, 48000.0)
    ctx.create_script_processor(512, 1, 0)  # must not raise


def test_script_processor_rendering():
    # script_processor.rs test_rendering — a generator-style processor
    # (0 inputs) that fills its output with ones; the first two buffers
    # are silent (fixed two-buffer latency)
    N = 256
    ctx = OfflineAudioContext(1, N * 3, 48000.0)
    node = ctx.create_script_processor(N, 0, 1)
    node.connect(ctx.destination)

    def handler(ev):
        ev.output_buffer[:] = 1.0

    node.set_onaudioprocess(handler)
    out = ctx.start_rendering_sync().get_channel_data(0)
    np.testing.assert_array_equal(out[: 2 * N], 0.0)
    np.testing.assert_array_equal(out[2 * N:], 1.0)


def test_script_processor_multiple_channels():
    # script_processor.rs test_multiple_channels — a mono constant source
    # upmixes to the node's two explicit input channels; left out = 2x
    # left in, right out = 3x right in
    N = 256
    ctx = OfflineAudioContext(2, N * 3, 48000.0)
    node = ctx.create_script_processor(N, 2, 2)
    node.connect(ctx.destination)

    def handler(ev):
        ev.output_buffer[0] = ev.input_buffer[0] * 2.0
        ev.output_buffer[1] = ev.input_buffer[1] * 3.0

    node.set_onaudioprocess(handler)
    src = ctx.create_constant_source()
    src.start()
    src.connect(node)
    result = ctx.start_rendering_sync()
    ch1 = result.get_channel_data(0)
    ch2 = result.get_channel_data(1)
    np.testing.assert_array_equal(ch1[: 2 * N], 0.0)
    np.testing.assert_array_equal(ch2[: 2 * N], 0.0)
    np.testing.assert_array_equal(ch1[2 * N:], 2.0)
    np.testing.assert_array_equal(ch2[2 * N:], 3.0)


# --- analyser.rs tests ------------------------------------------------------

def test_analyser_construct_decibels():
    # analyser.rs test_construct_decibels — a valid (min, max) pair that
    # straddles BOTH defaults (-100, -30) must construct: bounds are set
    # jointly, not sequentially (analysis.rs:244-250)
    ctx = OfflineAudioContext(1, 128, 44100.0)
    ctx.create_analyser(min_decibels=-10.0, max_decibels=20.0)


def test_analyser_after_closed():
    # analyser.rs test_analyser_after_closed — time-domain reads keep
    # returning the most recent frames after the context closes
    ctx = AudioContext(sample_rate=48000.0, sink_id="none")
    ctx.set_realtime_pacing(False)
    src = ctx.create_constant_source()
    src.start()
    analyser = ctx.create_analyser()
    src.connect(analyser)

    buf = np.zeros(128, np.float32)
    deadline = time.time() + 5.0
    while time.time() < deadline:
        time.sleep(0.05)
        analyser.get_float_time_domain_data(buf)
        if np.all(buf == 1.0):
            break
    np.testing.assert_array_equal(buf, 1.0)

    ctx.close_sync()
    time.sleep(0.05)
    buf2 = np.zeros(128, np.float32)
    analyser.get_float_time_domain_data(buf2)  # must not crash or hang
    np.testing.assert_array_equal(buf2, 1.0)


# --- gain.rs tests -----------------------------------------------------------

def test_gain_audioparam_value_applies_immediately():
    # gain.rs test_audioparam_value_applies_immediately
    ctx = OfflineAudioContext(1, 128, 48000.0)
    g = ctx.create_gain(gain=0.12)
    assert g.gain.value == np.float32(0.12)
