"""Channel up/down-mix matrix vs destination configs.

Port of reference tests/mixing.rs (all 6 cases): a mono constant source
through an intermediate gain with a given channel config, into destinations
of various channel counts / interpretations.
"""

import numpy as np
import pytest

from webaudio_tpu import OfflineAudioContext

ONES = np.ones(128, np.float32)
ZEROES = np.zeros(128, np.float32)


def run(dest_channels, dest_interp, gain_count, gain_mode, gain_interp):
    ctx = OfflineAudioContext(dest_channels, 128, 44100.0)
    ctx.destination.set_channel_interpretation(dest_interp)
    const = ctx.create_constant_source()
    const.start()
    gain = ctx.create_gain()
    gain.set_channel_count(gain_count)
    gain.set_channel_count_mode(gain_mode)
    gain.set_channel_interpretation(gain_interp)
    const.connect(gain)
    gain.connect(ctx.destination)
    return ctx.start_rendering_sync()


def test_mono_speakers():
    out = run(1, "speakers", 1, "max", "speakers")
    assert out.number_of_channels == 1
    np.testing.assert_array_equal(out.get_channel_data(0), ONES)


def test_stereo_speakers():
    out = run(2, "speakers", 2, "max", "speakers")
    assert out.number_of_channels == 2
    np.testing.assert_array_equal(out.get_channel_data(0), ONES)
    np.testing.assert_array_equal(out.get_channel_data(1), ONES)


def test_quad_speakers():
    # mono signal upmixed to a quad destination: L/R = input, SL/SR = 0
    out = run(4, "speakers", 4, "max", "speakers")
    assert out.number_of_channels == 4
    np.testing.assert_array_equal(out.get_channel_data(0), ONES)
    np.testing.assert_array_equal(out.get_channel_data(1), ONES)
    np.testing.assert_array_equal(out.get_channel_data(2), ZEROES)
    np.testing.assert_array_equal(out.get_channel_data(3), ZEROES)


def test_mono_to_discrete_stereo():
    out = run(2, "discrete", 1, "max", "speakers")
    np.testing.assert_array_equal(out.get_channel_data(0), ONES)
    np.testing.assert_array_equal(out.get_channel_data(1), ZEROES)


def test_stereo_to_discrete_stereo():
    out = run(2, "discrete", 2, "max", "speakers")
    np.testing.assert_array_equal(out.get_channel_data(0), ONES)
    np.testing.assert_array_equal(out.get_channel_data(1), ZEROES)


def test_stereo_to_discrete_mono():
    out = run(1, "discrete", 2, "max", "speakers")
    np.testing.assert_array_equal(out.get_channel_data(0), ONES)


def test_5_1_downmix_to_stereo():
    # 6-channel constant into a stereo speakers destination:
    # L' = L + sqrt(1/2)*(C + SL) (reference: quantum.rs:447-473)
    ctx = OfflineAudioContext(2, 128, 44100.0)
    merger = ctx.create_channel_merger(6)
    for i in range(6):
        c = ctx.create_constant_source()
        c.start()
        c.connect(merger, 0, i)
    merger.connect(ctx.destination)
    out = ctx.start_rendering_sync()
    s = np.float32(np.sqrt(0.5))
    expected = np.float32(1.0 + s * (1.0 + 1.0))
    np.testing.assert_allclose(out.get_channel_data(0), expected, atol=1e-6)
    np.testing.assert_allclose(out.get_channel_data(1), expected, atol=1e-6)


def test_stereo_down_to_mono_sum():
    # (2,1): M = 0.5(L+R) (reference: quantum.rs:386-396)
    ctx = OfflineAudioContext(1, 128, 44100.0)
    merger = ctx.create_channel_merger(2)
    left = ctx.create_constant_source(offset=0.8)
    right = ctx.create_constant_source(offset=0.2)
    left.start()
    right.start()
    left.connect(merger, 0, 0)
    right.connect(merger, 0, 1)
    merger.connect(ctx.destination)
    out = ctx.start_rendering_sync()
    np.testing.assert_allclose(out.get_channel_data(0), 0.5, atol=1e-7)
