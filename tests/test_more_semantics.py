"""Additional reference-semantics coverage: reverse playback, a-rate delay
automation, oscillator type switching, dither export."""

import numpy as np
import pytest

from webaudio_tpu import OfflineAudioContext


def test_buffer_source_reverse_playback():
    # negative playback rate with an offset plays backwards
    # (reference: audio_buffer_source.rs slow track, reverse loop tests)
    fs = 48000.0
    n = 500
    x = np.arange(n, dtype=np.float32)
    ctx = OfflineAudioContext(1, 512, fs)
    buf = ctx.create_buffer(1, n, fs)
    buf.copy_to_channel(x, 0)
    src = ctx.create_buffer_source(playback_rate=-1.0)
    src.buffer = buf
    src.connect(ctx.destination)
    src.start(0.0, 400.0 / fs)  # start at sample 400, going backwards
    out = ctx.start_rendering_sync().get_channel_data(0)
    np.testing.assert_allclose(out[:400], np.arange(400, 0, -1, dtype=np.float32),
                               atol=1e-4)
    # playhead went below zero -> silence
    np.testing.assert_array_equal(out[401:], 0.0)


def test_buffer_source_reverse_loop():
    fs = 48000.0
    n = 100
    x = np.arange(n, dtype=np.float32)
    ctx = OfflineAudioContext(1, 256, fs)
    buf = ctx.create_buffer(1, n, fs)
    buf.copy_to_channel(x, 0)
    src = ctx.create_buffer_source(playback_rate=-1.0, loop=True)
    src.buffer = buf
    src.connect(ctx.destination)
    src.start(0.0, 50.0 / fs)
    out = ctx.start_rendering_sync().get_channel_data(0)
    # wraps inside the loop region [0, n): 50, 49, ..., 1, 0->wraps to end
    np.testing.assert_allclose(out[:50], np.arange(50, 0, -1), atol=1e-3)
    assert out[55] == pytest.approx(n - 5, abs=1e-2)


def test_delay_a_rate_automation():
    # delay time ramping while reading: per-sample fractional positions
    fs = 48000.0
    n = 1024
    ctx = OfflineAudioContext(1, n, fs)
    # ramp source so delayed output is analytically checkable
    buf = ctx.create_buffer(1, n, fs)
    buf.copy_to_channel(np.arange(n, dtype=np.float32), 0)
    src = ctx.create_buffer_source()
    src.buffer = buf
    d = ctx.create_delay(max_delay_time=0.1)
    d.delay_time.set_value_at_time(10.0 / fs, 0.0)
    d.delay_time.linear_ramp_to_value_at_time(20.0 / fs, n / fs)
    src.connect(d)
    d.connect(ctx.destination)
    src.start()
    out = ctx.start_rendering_sync().get_channel_data(0)
    t = np.arange(n, dtype=np.float64)
    delay_samples = 10.0 + 10.0 * t / n
    expected = np.maximum(t - delay_samples, 0.0)
    expected[t - delay_samples < 0] = 0.0
    # linear signal -> fractional delay is exact under linear interpolation
    np.testing.assert_allclose(out[32:], expected[32:], atol=1e-2)


def test_oscillator_type_switch_before_render():
    fs = 48000.0
    ctx = OfflineAudioContext(1, 256, fs)
    osc = ctx.create_oscillator(frequency=1000.0)
    osc.type = "triangle"
    assert osc.type.value == "triangle"
    osc.connect(ctx.destination)
    osc.start()
    out = ctx.start_rendering_sync().get_channel_data(0)
    # triangle starts at 2 - 4*phase fold; at phase 0 -> value 2 folded to... -4*0+2=2 -> folded 0? formula: s=2 at phase 0 -> >1 -> 2-2=0
    assert out[0] == pytest.approx(0.0, abs=1e-6)


def test_dither_fallback_statistics():
    from webaudio_tpu.ops.dither import dither_to_i16

    x = np.full((1, 20000), 0.25 / 32767.0 * 10.0, np.float32)  # 10.25 LSB?? no:
    x = np.full((1, 20000), 10.25 / 32767.0, np.float32)  # 10.25 LSB
    q = dither_to_i16(x, seed=3)
    # dithered quantization preserves the sub-LSB mean
    assert q.dtype == np.int16
    assert q.mean() == pytest.approx(10.25, abs=0.05)
    # triangular dither spans +-1 LSB around the ideal code
    assert set(np.unique(q)) <= {9, 10, 11}
