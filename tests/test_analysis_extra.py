"""Analyser byte outputs, listener orientation, misc semantics."""

import numpy as np
import pytest

from webaudio_tpu import OfflineAudioContext
from webaudio_tpu.constants import IndexSizeError


def test_analyser_byte_outputs():
    fs = 48000.0
    ctx = OfflineAudioContext(1, 4096, fs)
    osc = ctx.create_oscillator(frequency=1500.0)
    an = ctx.create_analyser(fft_size=2048)
    osc.connect(an)
    an.connect(ctx.destination)
    osc.start()
    ctx.start_rendering_sync()

    bt = np.zeros(2048, np.uint8)
    an.get_byte_time_domain_data(bt)
    # sine in [-1,1] maps to ~[0,255] centered at 128
    assert bt.min() < 20 and bt.max() > 235
    assert abs(int(bt.astype(np.int64).mean()) - 128) < 4

    bf = np.zeros(an.frequency_bin_count, np.uint8)
    an.get_byte_frequency_data(bf)
    peak_bin = int(np.argmax(bf))
    assert abs(peak_bin * fs / 2048 - 1500) < fs / 2048 * 1.5
    assert bf.max() > 100  # strong peak scaled into byte range


def test_analyser_validation():
    ctx = OfflineAudioContext(1, 128, 48000.0)
    an = ctx.create_analyser()
    with pytest.raises(IndexSizeError):
        an.set_fft_size(1000)      # not a power of two
    with pytest.raises(IndexSizeError):
        an.set_fft_size(16)        # < 32
    with pytest.raises(IndexSizeError):
        an.set_smoothing_time_constant(1.5)
    with pytest.raises(IndexSizeError):
        an.set_min_decibels(0.0)   # >= max (-30)


def test_listener_orientation_flips_image():
    # rotating the listener 180deg swaps left/right
    fs = 48000.0

    def render(forward_z):
        ctx = OfflineAudioContext(2, 128, fs)
        src = ctx.create_constant_source(offset=1.0)
        p = ctx.create_panner(position_x=1.0)  # source to the right
        ctx.listener.forward_z.set_value(forward_z)
        src.connect(p)
        p.connect(ctx.destination)
        src.start()
        return ctx.start_rendering_sync().to_array()[:, 64]

    facing_fwd = render(-1.0)   # default: source right -> right ear
    facing_back = render(1.0)   # turned around -> source on the left
    assert facing_fwd[1] > facing_fwd[0]
    assert facing_back[0] > facing_back[1]


def test_oscillator_stop_before_start_is_silent_after():
    fs = 48000.0
    ctx = OfflineAudioContext(1, 512, fs)
    osc = ctx.create_oscillator(frequency=1000.0)
    osc.connect(ctx.destination)
    osc.start(128 / fs)
    osc.stop(256 / fs)
    out = ctx.start_rendering_sync().get_channel_data(0)
    assert np.all(out[:128] == 0.0)
    assert np.abs(out[128:256]).max() > 0.1
    np.testing.assert_array_equal(out[256:], 0.0)
