"""AudioBuffer test vectors transcribed from the reference's unit tests
(reference: src/buffer.rs:415-817, `mod tests`).

Covers constructor validation, the copy_from/to_channel clamping suites
(literal expected arrays), and the resample corpus — including the
endpoint-preserving upsample vector (1 + 4/9*i) and the [1., 3., 5.]
downsample that pin the exact interpolation mapping.
"""

import numpy as np
import pytest

from webaudio_tpu.buffer import AudioBuffer
from webaudio_tpu.constants import WebAudioError


def _buf(channels=1, length=10, rate=48000.0):
    return AudioBuffer(channels, length, rate)


def test_constructor():
    # buffer.rs test_constructor
    b = AudioBuffer(1, 96000, 48000.0)
    assert b.number_of_channels == 1
    assert b.length == 96000
    assert b.sample_rate == 48000.0
    assert b.duration == 2.0


def test_zero_channels():
    with pytest.raises(WebAudioError):
        AudioBuffer(0, 10, 48000.0)


def test_zero_channels_from():
    with pytest.raises(WebAudioError):
        AudioBuffer.from_array(np.zeros((0, 5), np.float32), 48000.0)


def test_invalid_sample_rate():
    with pytest.raises(WebAudioError):
        AudioBuffer(1, 10, 0.0)


def test_invalid_sample_rate_from():
    with pytest.raises(WebAudioError):
        AudioBuffer.from_array(np.zeros((1, 1), np.float32), 0.0)


def test_invalid_length():
    with pytest.raises(WebAudioError):
        AudioBuffer(1, 0, 48000.0)


def test_channel_data_get_set():
    b = _buf()
    b.get_channel_data(0)[:] = 1.0
    np.testing.assert_array_equal(b.get_channel_data(0), np.ones(10))


def test_invalid_copy_from_channel():
    b = _buf()
    dest = np.ones(10, np.float32)
    with pytest.raises(WebAudioError):
        b.copy_from_channel(dest, 1)


def test_copy_from_channel():
    # buffer.rs test_copy_from_channel — clamping/no-op suites
    b = _buf()

    dest = np.ones(10, np.float32)
    b.copy_from_channel(dest, 0)
    np.testing.assert_array_equal(dest, np.zeros(10))

    dest = np.ones(5, np.float32)
    b.copy_from_channel(dest, 0)
    np.testing.assert_array_equal(dest, np.zeros(5))

    dest = np.ones(11, np.float32)
    b.copy_from_channel(dest, 0)
    np.testing.assert_array_equal(
        dest, np.array([0., 0., 0., 0., 0., 0., 0., 0., 0., 0., 1.]))

    dest = np.ones(10, np.float32)
    b.copy_from_channel_with_offset(dest, 0, 5)
    np.testing.assert_array_equal(
        dest, np.array([0., 0., 0., 0., 0., 1., 1., 1., 1., 1.]))

    dest = np.ones(10, np.float32)
    b.copy_from_channel_with_offset(dest, 0, 2 ** 63)
    np.testing.assert_array_equal(dest, np.ones(10))


def test_invalid_copy_to_channel():
    b = _buf()
    with pytest.raises(WebAudioError):
        b.copy_to_channel(np.ones(10, np.float32), 1)


def test_copy_to_channel():
    # buffer.rs test_copy_to_channel
    b = _buf()
    b.copy_to_channel(np.ones(10, np.float32), 0)
    np.testing.assert_array_equal(b.get_channel_data(0), np.ones(10))

    b = _buf()
    b.copy_to_channel(np.ones(5, np.float32), 0)
    np.testing.assert_array_equal(
        b.get_channel_data(0),
        np.array([1., 1., 1., 1., 1., 0., 0., 0., 0., 0.]))

    b = _buf()
    b.copy_to_channel(np.ones(12, np.float32), 0)
    np.testing.assert_array_equal(b.get_channel_data(0), np.ones(10))

    b = _buf()
    b.copy_to_channel_with_offset(np.ones(10, np.float32), 0, 5)
    np.testing.assert_array_equal(
        b.get_channel_data(0),
        np.array([0., 0., 0., 0., 0., 1., 1., 1., 1., 1.]))

    b = _buf()
    b.copy_to_channel_with_offset(np.ones(10, np.float32), 0, 2 ** 63)
    np.testing.assert_array_equal(b.get_channel_data(0), np.zeros(10))


def test_invalid_get_channel_data():
    b = _buf()
    with pytest.raises(WebAudioError):
        b.get_channel_data(1)


def test_silent():
    b = AudioBuffer(2, 10, 44100.0)
    assert b.length == 10
    assert b.number_of_channels == 2
    assert b.sample_rate == 44100.0
    np.testing.assert_array_equal(b.get_channel_data(0), np.zeros(10))
    np.testing.assert_array_equal(b.get_channel_data(1), np.zeros(10))


def test_resample_to_zero_hertz():
    b = AudioBuffer.from_array(
        np.array([[1., 2., 3., 4., 5.]], np.float32), 48000.0)
    with pytest.raises(WebAudioError):
        b.resample(0.0)


def test_resample_from_empty():
    b = AudioBuffer.from_array(np.zeros((1, 0), np.float32), 48000.0)
    b.resample(48000.0)
    assert b.length == 0
    assert b.sample_rate == 48000.0


def test_upsample():
    # buffer.rs test_upsample — endpoint-preserving doubling of [1..5]:
    # expected[i] = 1 + (4/9) * i  over 10 samples
    b = AudioBuffer.from_array(
        np.array([[1., 2., 3., 4., 5.]], np.float32), 48000.0)
    b.resample(96000.0)
    expected = 1.0 + (4.0 / 9.0) * np.arange(10)
    np.testing.assert_allclose(b.get_channel_data(0), expected, atol=1e-6)
    assert b.sample_rate == 96000.0


def test_downsample():
    # buffer.rs test_downsample — halving [1..5] keeps [1., 3., 5.]
    b = AudioBuffer.from_array(
        np.array([[1., 2., 3., 4., 5.]], np.float32), 96000.0)
    b.resample(48000.0)
    np.testing.assert_allclose(
        b.get_channel_data(0), np.array([1., 3., 5.]), atol=0.0)
    assert b.sample_rate == 48000.0


@pytest.mark.parametrize("source_sr", [22500, 38000, 48000, 96000])
def test_resample_stereo(source_sr):
    # buffer.rs test_resample_stereo — one period of sin/cos resampled to
    # 44.1 kHz must track the analytically resampled waveform to 1e-3
    target_sr = 44100
    i = np.arange(source_sr, dtype=np.float64)
    phase = i / source_sr * 2 * np.pi
    b = AudioBuffer.from_array(
        np.stack([np.sin(phase), np.cos(phase)]).astype(np.float32),
        float(source_sr))
    b.resample(float(target_sr))
    j = np.arange(target_sr, dtype=np.float64)
    tphase = j / target_sr * 2 * np.pi
    np.testing.assert_allclose(
        b.get_channel_data(0), np.sin(tphase).astype(np.float32), atol=1e-3)
    np.testing.assert_allclose(
        b.get_channel_data(1), np.cos(tphase).astype(np.float32), atol=1e-3)
    assert b.sample_rate == float(target_sr)
