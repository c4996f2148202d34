"""ConvolverNode test vectors transcribed from the reference's own unit
tests (reference: src/node/convolver.rs:511-990, `mod tests`).

Expected arrays are the literal values the reference asserts, so this file
is an external-validity anchor: passthrough / degenerate IRs, the
equal-power-normalized identity calibration (0.00125 at 44.1 kHz), tail
time, and all six channel-matrixing configurations (1/2-channel input x
1/2/4-channel IR, convolver.rs:671-990).
"""

import numpy as np
import pytest

from webaudio_tpu import OfflineAudioContext
from webaudio_tpu.buffer import AudioBuffer
from webaudio_tpu.constants import NotSupportedError

FS = 44100.0
CALIBRATION = 0.00125  # convolver.rs:17 GAIN_CALIBRATION


def _convolve(signal, ir_channels, length, *, disable_normalization=False,
              input_channels=None, context_channels=1):
    """The reference's test_convolve helper (convolver.rs:580-598), plus
    the channel-config variants (convolver.rs:671-990)."""
    ctx = OfflineAudioContext(context_channels, length, FS)
    if input_channels is None:
        input_channels = [signal]
    src = ctx.create_buffer_source()
    src.buffer = AudioBuffer.from_array(
        np.asarray(input_channels, np.float32), FS)
    conv = ctx.create_convolver(disable_normalization=disable_normalization)
    if ir_channels is not None:
        conv.set_buffer(AudioBuffer.from_array(
            np.asarray(ir_channels, np.float32).reshape(
                len(ir_channels), -1), FS))
    src.connect(conv)
    conv.connect(ctx.destination)
    src.start()
    return ctx.start_rendering_sync()


def test_buffer_sample_rate_matches():
    # convolver.rs:522-535 (should_panic)
    ctx = OfflineAudioContext(1, 128, 44100.0)
    ir = AudioBuffer.from_array(np.ones((1, 1), np.float32), 48000.0)
    with pytest.raises(NotSupportedError):
        ctx.create_convolver(buffer=ir)


def test_buffer_must_have_1_2_4_channels():
    # convolver.rs:537-549 (should_panic)
    ctx = OfflineAudioContext(1, 128, 48000.0)
    ir = AudioBuffer.from_array(np.ones((3, 1), np.float32), 48000.0)
    with pytest.raises(NotSupportedError):
        ctx.create_convolver(buffer=ir)


def test_constructor_options_buffer():
    # convolver.rs:551-578 — identity IR through the constructor option,
    # normalization on: output is the signal scaled by the calibration
    ctx = OfflineAudioContext(1, 10, FS)
    src = ctx.create_buffer_source()
    src.buffer = AudioBuffer.from_array(
        np.array([[0., 1., 0., -1., 0.]], np.float32), FS)
    conv = ctx.create_convolver(
        buffer=AudioBuffer.from_array(np.ones((1, 1), np.float32), FS))
    src.connect(conv)
    conv.connect(ctx.destination)
    src.start()
    out = ctx.start_rendering_sync().get_channel_data(0)
    expected = np.array(
        [0., CALIBRATION, 0., -CALIBRATION, 0., 0., 0., 0., 0., 0.])
    np.testing.assert_allclose(out, expected, atol=1e-6)


def test_passthrough():
    # convolver.rs:601-606 — no IR set: the node passes input through
    out = _convolve([0., 1., 0., -1., 0.], None, 10)
    expected = np.array([0., 1., 0., -1., 0., 0., 0., 0., 0., 0.])
    np.testing.assert_allclose(out.get_channel_data(0), expected, atol=1e-6)


def test_empty():
    # convolver.rs:608-614 — zero-length IR renders silence
    out = _convolve([0., 1., 0., -1., 0.], [[]], 10)
    np.testing.assert_allclose(
        out.get_channel_data(0), np.zeros(10), atol=1e-6)


def test_zeroed():
    # convolver.rs:616-622
    out = _convolve([0., 1., 0., -1., 0.], [[0.] * 6], 10)
    np.testing.assert_allclose(
        out.get_channel_data(0), np.zeros(10), atol=1e-6)


def test_identity():
    # convolver.rs:624-631 — normalization on: unit IR scales by the
    # 44.1 kHz gain calibration
    out = _convolve([0., 1., 0., -1., 0.], [[1.]], 10)
    expected = np.array(
        [0., CALIBRATION, 0., -CALIBRATION, 0., 0., 0., 0., 0., 0.])
    np.testing.assert_allclose(out.get_channel_data(0), expected, atol=1e-6)


def test_two_id():
    # convolver.rs:633-651
    out = _convolve([0., 1., 0., -1., 0.], [[1., 1.]], 10)
    expected = np.array([0., CALIBRATION, CALIBRATION, -CALIBRATION,
                         -CALIBRATION, 0., 0., 0., 0., 0.])
    np.testing.assert_allclose(out.get_channel_data(0), expected, atol=1e-6)


def test_should_have_tail_time():
    # convolver.rs:653-669 — a 256-tap ones IR driven by a single unit
    # impulse rings for exactly IR_LEN samples, then is silent
    IR_LEN = 256
    out = _convolve([1.], [[1.] * IR_LEN], 512)
    data = out.get_channel_data(0)
    assert np.all(data[:IR_LEN] > 1e-6)
    np.testing.assert_allclose(data[IR_LEN:], np.zeros(512 - IR_LEN),
                               atol=1e-6)


def _channel_config(input_channels, ir_channels, context_channels):
    return _convolve(None, ir_channels, 128,
                     disable_normalization=True,
                     input_channels=input_channels,
                     context_channels=context_channels)


def test_channel_config_1_chan_in_1_chan_ir():
    # convolver.rs:671-712
    out = _channel_config([[1.]], [[0., 1.]], 1)
    expected = np.zeros(128)
    expected[1] = 1.
    np.testing.assert_allclose(out.get_channel_data(0), expected, atol=1e-7)


def test_channel_config_1_chan_in_2_chan_ir():
    # convolver.rs:714-764
    out = _channel_config([[1.]], [[0., 1., 0.], [0., 0., 1.]], 2)
    left = np.zeros(128)
    left[1] = 1.
    right = np.zeros(128)
    right[2] = 1.
    assert out.number_of_channels == 2
    np.testing.assert_allclose(out.get_channel_data(0), left, atol=1e-7)
    np.testing.assert_allclose(out.get_channel_data(1), right, atol=1e-7)


def test_channel_config_2_chan_in_1_chan_ir():
    # convolver.rs:766-816 — mono IR duplicated across the stereo input
    out = _channel_config([[1., 0.], [0., 1.]], [[0., 1.]], 2)
    left = np.zeros(128)
    left[1] = 1.
    right = np.zeros(128)
    right[2] = 1.
    assert out.number_of_channels == 2
    np.testing.assert_allclose(out.get_channel_data(0), left, atol=1e-7)
    np.testing.assert_allclose(out.get_channel_data(1), right, atol=1e-7)


def test_channel_config_2_chan_in_2_chan_ir():
    # convolver.rs:818-868
    out = _channel_config([[1., 0.], [0., 1.]],
                          [[0., 1., 0.], [0., 0., 1.]], 2)
    left = np.zeros(128)
    left[1] = 1.
    right = np.zeros(128)
    right[3] = 1.
    assert out.number_of_channels == 2
    np.testing.assert_allclose(out.get_channel_data(0), left, atol=1e-7)
    np.testing.assert_allclose(out.get_channel_data(1), right, atol=1e-7)


def test_channel_config_2_chan_in_4_chan_ir():
    # convolver.rs:870-930 — true-stereo matrixing:
    # L = in0*ir0 + in1*ir2, R = in0*ir1 + in1*ir3
    out = _channel_config(
        [[1., 0.], [0., 1.]],
        [[0., 1., 0., 0., 0.],
         [0., 0., 1., 0., 0.],
         [0., 0., 0., 1., 0.],
         [0., 0., 0., 0., 1.]], 2)
    left = np.zeros(128)
    left[1] = 1.
    left[4] = 1.
    right = np.zeros(128)
    right[2] = 1.
    right[5] = 1.
    assert out.number_of_channels == 2
    np.testing.assert_allclose(out.get_channel_data(0), left, atol=1e-7)
    np.testing.assert_allclose(out.get_channel_data(1), right, atol=1e-7)


def test_channel_config_1_chan_in_4_chan_ir():
    # convolver.rs:932-990 — mono input fans out to all four IR lanes
    out = _channel_config(
        [[1., 0.]],
        [[0., 1., 0., 0., 0.],
         [0., 0., 1., 0., 0.],
         [0., 0., 0., 1., 0.],
         [0., 0., 0., 0., 1.]], 2)
    left = np.zeros(128)
    left[1] = 1.
    left[3] = 1.
    right = np.zeros(128)
    right[2] = 1.
    right[4] = 1.
    assert out.number_of_channels == 2
    np.testing.assert_allclose(out.get_channel_data(0), left, atol=1e-7)
    np.testing.assert_allclose(out.get_channel_data(1), right, atol=1e-7)
