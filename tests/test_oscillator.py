"""OscillatorNode tests vs closed-form/numpy oracles
(reference: oscillator.rs tests use cfg!(test) closed forms)."""

import numpy as np
import pytest

from webaudio_tpu import OfflineAudioContext
from webaudio_tpu.ops import oscillator as osc_ops


def _render(fs, n, **osc_kw):
    ctx = OfflineAudioContext(1, n, fs)
    osc = ctx.create_oscillator(**osc_kw)
    osc.connect(ctx.destination)
    osc.start()
    return ctx.start_rendering_sync().get_channel_data(0), ctx, osc


def test_sine_440():
    fs, n = 48000.0, 4 * 16384
    out, _, _ = _render(fs, n, frequency=440.0)
    t = np.arange(n, dtype=np.float64)
    expected = np.sin(2 * np.pi * ((440.0 / fs) * t % 1.0))
    np.testing.assert_allclose(out, expected.astype(np.float32), atol=2e-5)


def test_sine_sub_sample_start():
    fs = 48000.0
    n = 512
    start = 100.5 / fs
    ctx = OfflineAudioContext(1, n, fs)
    osc = ctx.create_oscillator(frequency=1000.0)
    osc.connect(ctx.destination)
    osc.start(start)
    out = ctx.start_rendering_sync().get_channel_data(0)
    assert np.all(out[:101] == 0.0)
    # phase at sample 101 pre-advanced by incr * (101 - 100.5)
    incr = 1000.0 / fs
    k = np.arange(101, n, dtype=np.float64)
    phase = (incr * 0.5 + incr * (k - 101)) % 1.0
    np.testing.assert_allclose(out[101:], np.sin(2 * np.pi * phase), atol=1e-5)


def test_triangle_shape():
    fs, n = 48000.0, 480
    out, _, _ = _render(fs, n, type="triangle", frequency=100.0)
    phase = (100.0 / fs) * np.arange(n, dtype=np.float64) % 1.0
    exp = -4 * phase + 2
    exp = np.where(exp > 1, 2 - exp, exp)
    exp = np.where(exp < -1, -2 - exp, exp)
    np.testing.assert_allclose(out, exp.astype(np.float32), atol=1e-5)


def test_square_and_sawtooth_no_blep():
    osc_ops.DISABLE_POLYBLEP = True
    try:
        fs, n = 48000.0, 480
        out, _, _ = _render(fs, n, type="square", frequency=100.0)
        phase = (100.0 / fs) * np.arange(n, dtype=np.float64) % 1.0
        np.testing.assert_allclose(out, np.where(phase < 0.5, 1.0, -1.0), atol=0)

        out, _, _ = _render(fs, n, type="sawtooth", frequency=100.0)
        p = (phase + 0.5) % 1.0
        np.testing.assert_allclose(out, (2 * p - 1).astype(np.float32), atol=1e-6)
    finally:
        osc_ops.DISABLE_POLYBLEP = False


def test_detune_octave():
    fs, n = 48000.0, 4800
    out, _, _ = _render(fs, n, frequency=220.0, detune=1200.0)
    ref, _, _ = _render(fs, n, frequency=440.0)
    np.testing.assert_allclose(out, ref, atol=1e-5)


def test_nyquist_silence_phase_advances():
    fs, n = 48000.0, 256
    ctx = OfflineAudioContext(1, n, fs)
    osc = ctx.create_oscillator(frequency=24000.0)  # exactly nyquist
    osc.connect(ctx.destination)
    osc.start()
    out = ctx.start_rendering_sync().get_channel_data(0)
    np.testing.assert_array_equal(out, 0.0)


def test_frequency_ramp_matches_cumsum_oracle():
    fs, n = 48000.0, 16384
    ctx = OfflineAudioContext(1, n, fs)
    osc = ctx.create_oscillator(frequency=100.0)
    osc.frequency.linear_ramp_to_value_at_time(2000.0, n / fs)
    osc.connect(ctx.destination)
    osc.start()
    out = ctx.start_rendering_sync().get_channel_data(0)
    # oracle: per-sample f64 phase accumulation with f32 param values
    t = np.arange(n, dtype=np.float64)
    f = (100.0 + (2000.0 - 100.0) * (t / n)).astype(np.float32)
    phase = np.concatenate([[0.0], np.cumsum(f[:-1].astype(np.float64) / fs)]) % 1.0
    expected = np.sin(2 * np.pi * phase)
    np.testing.assert_allclose(out, expected, atol=2e-4)


def test_custom_periodic_wave():
    from webaudio_tpu import PeriodicWave

    fs, n = 48000.0, 4800
    ctx = OfflineAudioContext(1, n, fs)
    # pure 2nd harmonic sine
    wave = ctx.create_periodic_wave(real=[0, 0, 0], imag=[0, 0, 1])
    osc = ctx.create_oscillator(periodic_wave=wave, frequency=100.0)
    osc.connect(ctx.destination)
    osc.start()
    out = ctx.start_rendering_sync().get_channel_data(0)
    phase = (100.0 / fs) * np.arange(n, dtype=np.float64) % 1.0
    expected = np.sin(2 * np.pi * 2 * phase)
    # wavetable is 8192-entry lerp of the normalized series
    np.testing.assert_allclose(out, expected, atol=5e-3)
    assert osc.type.value == "custom"
