"""Analyser engine test vectors transcribed from the reference's unit tests
(reference: src/analysis.rs:405-860, `mod tests`), driven through the
public AnalyserNode API (the rendered ring stands in for the reference's
direct ring-buffer writes).
"""

import numpy as np
import pytest

from webaudio_tpu import OfflineAudioContext
from webaudio_tpu.buffer import AudioBuffer
from webaudio_tpu.constants import IndexSizeError
from webaudio_tpu.nodes.analyser import generate_blackman


def test_blackman():
    # analysis.rs test_blackman — window in (0, 1], min at index 0, peak
    # at the center
    values = generate_blackman(2048)
    assert 0.0 < values.min() < 0.01
    assert 0.99 < values.max() <= 1.0
    assert int(np.argmin(values)) == 0
    assert int(np.argmax(values)) == 1024


def test_set_decibels():
    # analysis.rs test_set_decibels — joint setter accepts pairs that
    # sequential setters would reject
    ctx = OfflineAudioContext(1, 128, 44100.0)
    an = ctx.create_analyser()
    an.set_decibels(-10.0, 20.0)
    assert an.min_decibels == -10.0
    assert an.max_decibels == 20.0
    with pytest.raises(IndexSizeError):
        an.set_decibels(20.0, -10.0)


@pytest.mark.parametrize("bad", [1000, 16, 65536])
def test_fft_size_constraints(bad):
    # analysis.rs test_fft_size_constraints_* (pow2, >=32, <=32768)
    ctx = OfflineAudioContext(1, 128, 44100.0)
    an = ctx.create_analyser()
    with pytest.raises(IndexSizeError):
        an.set_fft_size(bad)


@pytest.mark.parametrize("bad", [-0.5, 1.5])
def test_smoothing_time_constant_constraints(bad):
    ctx = OfflineAudioContext(1, 128, 44100.0)
    an = ctx.create_analyser()
    with pytest.raises(IndexSizeError):
        an.set_smoothing_time_constant(bad)


def test_decibel_constraints():
    ctx = OfflineAudioContext(1, 128, 44100.0)
    an = ctx.create_analyser()
    with pytest.raises(IndexSizeError):
        an.set_min_decibels(-29.0)   # >= max (-30)
    with pytest.raises(IndexSizeError):
        an.set_max_decibels(-101.0)  # <= min (-100)


def _render_ones(fft_size, n=512, value=1.0):
    ctx = OfflineAudioContext(1, n, 48000.0)
    src = ctx.create_buffer_source()
    src.buffer = AudioBuffer.from_array(
        np.full((1, n), value, np.float32), 48000.0)
    an = ctx.create_analyser(fft_size=fft_size)
    src.connect(an)
    an.connect(ctx.destination)
    src.start()
    ctx.start_rendering_sync()
    return an


def test_get_float_time_domain_data_vs_fft_size():
    # analysis.rs test_get_float_time_domain_data_vs_fft_size — dst larger
    # than fft_size: only fft_size values written; dst smaller: filled
    an = _render_ones(32)
    dst = np.zeros(128, np.float32)
    an.get_float_time_domain_data(dst)
    expected = np.zeros(128, np.float32)
    expected[:32] = 1.0
    np.testing.assert_array_equal(dst, expected)

    an = _render_ones(128)
    dst = np.zeros(16, np.float32)
    an.get_float_time_domain_data(dst)
    np.testing.assert_array_equal(dst, np.ones(16))


def test_get_byte_time_domain_data():
    # analysis.rs get_byte_time_domain_data — +1.0 -> 255, -1.0 -> 0
    an = _render_ones(128, value=1.0)
    dst = np.zeros(128, np.uint8)
    an.get_byte_time_domain_data(dst)
    np.testing.assert_array_equal(dst, np.full(128, 255, np.uint8))

    an = _render_ones(128, value=-1.0)
    dst = np.zeros(128, np.uint8)
    an.get_byte_time_domain_data(dst)
    np.testing.assert_array_equal(dst, np.zeros(128, np.uint8))


@pytest.mark.parametrize("num_bin", [1, 7, 31, 64, 127])
def test_get_float_frequency_data_peak_bin(num_bin):
    # analysis.rs test_get_float_frequency_data — a sine centered on bin k
    # of a 1024-point FFT at 44.1 kHz peaks in bin k (sampled sweep)
    fs = 44100.0
    fft_size = 1024
    freq = fs / fft_size * num_bin
    n = 2048
    i = np.arange(n, dtype=np.float64)
    signal = np.sin(2 * np.pi * freq * i / fs).astype(np.float32)

    ctx = OfflineAudioContext(1, n, fs)
    src = ctx.create_buffer_source()
    src.buffer = AudioBuffer.from_array(signal[None], fs)
    an = ctx.create_analyser(fft_size=fft_size, smoothing_time_constant=0.0)
    src.connect(an)
    an.connect(ctx.destination)
    src.start()
    ctx.start_rendering_sync()

    bins = np.zeros(an.frequency_bin_count, np.float32)
    an.get_float_frequency_data(bins)
    assert int(np.argmax(bins)) == num_bin


def test_get_float_frequency_data_vs_frequency_bin_count():
    # analysis.rs — only frequency_bin_count entries written; the rest of
    # dst is unaltered; silence reads as -inf dB
    ctx = OfflineAudioContext(1, 256, 48000.0)
    an = ctx.create_analyser(fft_size=128)
    g = ctx.create_gain()   # silent graph
    g.connect(an)
    an.connect(ctx.destination)
    ctx.start_rendering_sync()

    bins = np.full(128, -1.0, np.float32)
    an.get_float_frequency_data(bins)
    assert np.all(np.isneginf(bins[:64]))
    np.testing.assert_array_equal(bins[64:], np.full(64, -1.0, np.float32))


def test_get_byte_frequency_data_vs_frequency_bin_count():
    ctx = OfflineAudioContext(1, 256, 48000.0)
    an = ctx.create_analyser(fft_size=128)
    g = ctx.create_gain()
    g.connect(an)
    an.connect(ctx.destination)
    ctx.start_rendering_sync()

    bins = np.full(128, 255, np.uint8)
    an.get_byte_frequency_data(bins)
    np.testing.assert_array_equal(bins[:64], np.zeros(64, np.uint8))
    np.testing.assert_array_equal(bins[64:], np.full(64, 255, np.uint8))
