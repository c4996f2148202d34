"""BiquadFilterNode vs scipy oracle (the reference runs the same DF1
recurrence in f64, biquad_filter.rs:868-892)."""

import numpy as np
import pytest
from scipy.signal import lfilter

from webaudio_tpu import OfflineAudioContext
from webaudio_tpu.nodes.biquad_filter import (
    BiquadFilterType, _np_coefs, _computed_freq,
)


def _render_filter(x, fs, **filter_kw):
    n = x.shape[-1]
    ctx = OfflineAudioContext(1, n, fs)
    buf = ctx.create_buffer(1, n, fs)
    buf.copy_to_channel(x, 0)
    src = ctx.create_buffer_source()
    src.buffer = buf
    f = ctx.create_biquad_filter(**filter_kw)
    src.connect(f)
    f.connect(ctx.destination)
    src.start()
    return ctx.start_rendering_sync().get_channel_data(0), f


@pytest.mark.parametrize("ftype", [t.value for t in BiquadFilterType])
def test_biquad_types_match_scipy(ftype):
    fs = 48000.0
    n = 8192
    rng = np.random.RandomState(42)
    x = rng.randn(n).astype(np.float32) * 0.5
    kw = dict(type=ftype, frequency=1200.0, q=2.0, gain=6.0)
    out, node = _render_filter(x, fs, **kw)
    b0, b1, b2, a1, a2 = _np_coefs(
        BiquadFilterType(ftype), fs, 1200.0, 6.0, 2.0)
    expected = lfilter([b0, b1, b2], [1.0, a1, a2], x.astype(np.float64))
    scale = max(np.abs(expected).max(), 1e-6)
    np.testing.assert_allclose(out, expected, atol=2e-5 * scale)


def test_biquad_high_q_resonant():
    fs = 48000.0
    n = 48000
    rng = np.random.RandomState(1)
    x = rng.randn(n).astype(np.float32) * 0.1
    out, _ = _render_filter(x, fs, type="lowpass", frequency=800.0, q=30.0)
    b0, b1, b2, a1, a2 = _np_coefs(BiquadFilterType.LOWPASS, fs, 800.0, 0.0, 30.0)
    expected = lfilter([b0, b1, b2], [1.0, a1, a2], x.astype(np.float64))
    scale = np.abs(expected).max()
    np.testing.assert_allclose(out, expected, atol=1e-4 * scale)


def test_biquad_automated_frequency():
    # a-rate path: associative scan with per-sample coefficients
    fs = 48000.0
    n = 4096
    rng = np.random.RandomState(3)
    x = rng.randn(n).astype(np.float32) * 0.3
    ctx = OfflineAudioContext(1, n, fs)
    buf = ctx.create_buffer(1, n, fs)
    buf.copy_to_channel(x, 0)
    src = ctx.create_buffer_source()
    src.buffer = buf
    f = ctx.create_biquad_filter(type="lowpass", q=1.0)
    f.frequency.set_value_at_time(500.0, 0.0)
    f.frequency.linear_ramp_to_value_at_time(5000.0, n / fs)
    src.connect(f)
    f.connect(ctx.destination)
    src.start()
    out = ctx.start_rendering_sync().get_channel_data(0)

    # oracle: per-sample coefficient recompute + DF1 in f64
    t = np.arange(n, dtype=np.float64)
    freq = (500.0 + (5000.0 - 500.0) * t / n).astype(np.float32)
    y = np.zeros(n)
    x1 = x2 = y1 = y2 = 0.0
    for i in range(n):
        b0, b1, b2, a1, a2 = _np_coefs(
            BiquadFilterType.LOWPASS, fs, float(freq[i]), 0.0, 1.0)
        yy = b0 * x[i] + b1 * x1 + b2 * x2 - a1 * y1 - a2 * y2
        x2, x1, y2, y1 = x1, float(x[i]), y1, yy
        y[i] = yy
    scale = np.abs(y).max()
    np.testing.assert_allclose(out, y, atol=5e-4 * scale)


def test_frequency_response():
    fs = 48000.0
    ctx = OfflineAudioContext(1, 128, fs)
    f = ctx.create_biquad_filter(type="lowpass", frequency=1000.0)
    freqs = np.array([10.0, 1000.0, 20000.0], dtype=np.float32)
    mag = np.zeros(3, np.float32)
    phase = np.zeros(3, np.float32)
    f.get_frequency_response(freqs, mag, phase)
    assert mag[0] == pytest.approx(1.0, abs=0.01)   # passband
    assert mag[2] < 0.01                            # stopband


def test_buffer_source_identity():
    fs = 48000.0
    n = 1000
    x = np.sin(np.arange(n, dtype=np.float32) * 0.1).astype(np.float32)
    ctx = OfflineAudioContext(1, 2048, fs)
    buf = ctx.create_buffer(1, n, fs)
    buf.copy_to_channel(x, 0)
    src = ctx.create_buffer_source()
    src.buffer = buf
    src.connect(ctx.destination)
    src.start()
    out = ctx.start_rendering_sync().get_channel_data(0)
    np.testing.assert_allclose(out[:n], x, atol=1e-7)
    np.testing.assert_array_equal(out[n:], 0.0)


def test_buffer_source_playback_rate_half():
    fs = 48000.0
    n = 1024
    x = np.arange(n, dtype=np.float32)
    ctx = OfflineAudioContext(1, 2048, fs)
    buf = ctx.create_buffer(1, n, fs)
    buf.copy_to_channel(x, 0)
    src = ctx.create_buffer_source(playback_rate=0.5)
    src.buffer = buf
    src.connect(ctx.destination)
    src.start()
    out = ctx.start_rendering_sync().get_channel_data(0)
    # linear interpolation at half rate: out[n] = n/2
    expect = np.arange(2046, dtype=np.float64) * 0.5
    np.testing.assert_allclose(out[:2046], expect, atol=1e-3)


def test_buffer_source_loop():
    fs = 48000.0
    period = 100
    x = np.sin(2 * np.pi * np.arange(period) / period).astype(np.float32)
    ctx = OfflineAudioContext(1, 1000, fs)
    buf = ctx.create_buffer(1, period, fs)
    buf.copy_to_channel(x, 0)
    src = ctx.create_buffer_source(loop=True)
    src.buffer = buf
    src.connect(ctx.destination)
    src.start()
    out = ctx.start_rendering_sync().get_channel_data(0)
    tiled = np.tile(x, 10)
    np.testing.assert_allclose(out, tiled, atol=1e-5)


def test_buffer_source_offset_duration():
    fs = 48000.0
    n = 500
    x = np.arange(n, dtype=np.float32)
    ctx = OfflineAudioContext(1, 512, fs)
    buf = ctx.create_buffer(1, n, fs)
    buf.copy_to_channel(x, 0)
    src = ctx.create_buffer_source()
    src.buffer = buf
    src.connect(ctx.destination)
    src.start(0.0, 100.0 / fs, 50.0 / fs)  # offset 100 samples, 50 samples long
    out = ctx.start_rendering_sync().get_channel_data(0)
    np.testing.assert_allclose(out[:50], x[100:150], atol=1e-4)
    np.testing.assert_array_equal(out[51:], 0.0)


def test_buffer_source_resampling_buffer_rate():
    # buffer at half the context rate -> played at double length
    fs = 48000.0
    n = 400
    x = np.sin(2 * np.pi * 5 * np.arange(n, dtype=np.float64) / n).astype(np.float32)
    ctx = OfflineAudioContext(1, 1024, fs)
    buf = ctx.create_buffer(1, n, 24000.0)
    buf.copy_to_channel(x, 0)
    src = ctx.create_buffer_source()
    src.buffer = buf
    src.connect(ctx.destination)
    src.start()
    out = ctx.start_rendering_sync().get_channel_data(0)
    # linear interp of x at positions 0, 0.5, 1.0, ...
    pos = np.arange(798) * 0.5
    k = np.floor(pos).astype(int)
    frac = pos - k
    expect = x[k] * (1 - frac) + x[np.minimum(k + 1, n - 1)] * frac
    np.testing.assert_allclose(out[:798], expect, atol=1e-5)
