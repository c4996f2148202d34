"""Oscillator golden vectors from the reference's unit tests
(/root/reference/src/node/oscillator.rs).

The reference disables polyBLEP under cfg!(test) (oscillator.rs:592-603)
so waveforms are closed-form; `ops.oscillator.DISABLE_POLYBLEP` is the
same switch here.  Phase oracles are computed in f64 exactly as the
reference test loops do; samples landing within fp-epsilon of a waveform
discontinuity are masked (the reference's accumulated phase and this
engine's closed-form phase may legitimately disagree on which side of
the jump an exactly-boundary sample falls).
"""

import numpy as np
import pytest

from webaudio_tpu import OfflineAudioContext
from webaudio_tpu.ops import oscillator as osc_ops

FS = 44100
FREQS = [1.0, 10.0, 100.0, 1000.0, 10000.0]


def _render_osc(freq, typ="sine", fs=FS, n=FS, wave=None, raw=False,
                start=0.0, stop=None, detune=None):
    old = osc_ops.DISABLE_POLYBLEP
    osc_ops.DISABLE_POLYBLEP = raw
    try:
        ctx = OfflineAudioContext(1, n, float(fs))
        osc = ctx.create_oscillator()
        osc.connect(ctx.destination)
        osc.frequency.set_value(freq)
        if detune is not None:
            osc.detune.set_value(detune)
        if wave is not None:
            osc.set_periodic_wave(wave)
        elif typ != "sine":
            osc.type = typ
        osc.start(start)
        if stop is not None:
            osc.stop(stop)
        return ctx.start_rendering_sync().get_channel_data(0), ctx
    finally:
        osc_ops.DISABLE_POLYBLEP = old


def _phases(freq, fs=FS, n=FS):
    k = np.arange(n, dtype=np.float64)
    return np.mod(k * (float(np.float32(freq)) / fs), 1.0)


def _mask_near(phase, boundaries, eps=1e-9):
    m = np.ones_like(phase, bool)
    for b in boundaries:
        m &= np.abs(phase - b) > eps
        m &= np.abs(phase - (b + 1.0)) > eps
        m &= np.abs(phase - (b - 1.0)) > eps
    return m


@pytest.mark.parametrize("freq", FREQS)
def test_sine_raw(freq):
    # oscillator.rs:807-841 sine_raw / :843-870 sine_raw_exact_phase
    out, _ = _render_osc(freq)
    expected = np.sin(_phases(freq) * 2 * np.pi)
    np.testing.assert_allclose(out, expected, atol=1e-5)


@pytest.mark.parametrize("freq", FREQS)
def test_square_raw(freq):
    # oscillator.rs:872-907 square_raw (polyBLEP off; 0.5 belongs to the
    # second half)
    out, _ = _render_osc(freq, "square", raw=True)
    ph = _phases(freq)
    expected = np.where(ph < 0.5, 1.0, -1.0)
    m = _mask_near(ph, [0.0, 0.5])
    np.testing.assert_allclose(out[m], expected[m], atol=1e-6)


@pytest.mark.parametrize("freq", FREQS)
def test_triangle_raw(freq):
    # oscillator.rs:910-955 triangle_raw
    out, _ = _render_osc(freq, "triangle", raw=True)
    ph = _phases(freq)
    s = -4.0 * ph + 2.0
    expected = np.where(s > 1.0, 2.0 - s, np.where(s < -1.0, -2.0 - s, s))
    np.testing.assert_allclose(out, expected, atol=1e-6)


@pytest.mark.parametrize("freq", FREQS)
def test_sawtooth_raw(freq):
    # oscillator.rs:957-999 sawtooth_raw
    out, _ = _render_osc(freq, "sawtooth", raw=True)
    ph = _phases(freq)
    expected = 2.0 * np.mod(ph + 0.5, 1.0) - 1.0
    m = _mask_near(ph, [0.5])
    np.testing.assert_allclose(out[m], expected[m], atol=1e-6)


@pytest.mark.parametrize("freq", FREQS)
def test_periodic_wave_1f_is_sine(freq):
    # oscillator.rs:1001-1046 periodic_wave_1f
    ctx = OfflineAudioContext(1, 8, FS)
    wave = ctx.create_periodic_wave(real=[0.0, 0.0], imag=[0.0, 1.0])
    out, _ = _render_osc(freq, wave=wave)
    expected = np.sin(_phases(freq) * 2 * np.pi)
    np.testing.assert_allclose(out, expected, atol=1e-5)


@pytest.mark.parametrize("freq", [1.0, 10.0, 100.0, 1000.0])
def test_periodic_wave_2f(freq):
    # oscillator.rs:1048-1094 periodic_wave_2f (normalization disabled)
    ctx = OfflineAudioContext(1, 8, FS)
    wave = ctx.create_periodic_wave(real=[0.0, 0.0, 0.0],
                                    imag=[0.0, 0.5, 0.5],
                                    disable_normalization=True)
    out, _ = _render_osc(freq, wave=wave)
    ph = _phases(freq) * 2 * np.pi
    expected = 0.5 * np.sin(ph) + 0.5 * np.sin(2 * ph)
    np.testing.assert_allclose(out, expected, atol=1e-5)


def test_osc_sub_quantum_start():
    # oscillator.rs:1136-1166 — start at sample 2, phase 0 from there
    freq = 1.25
    out, _ = _render_osc(freq, start=2.0 / FS)
    k = np.concatenate([[0.0, 0.0],
                        np.arange(FS - 2, dtype=np.float64)])
    expected = np.sin(k * (freq / FS) * 2 * np.pi)
    expected[:2] = 0.0
    np.testing.assert_allclose(out, expected, atol=1e-5)


def test_osc_sub_sample_start():
    # oscillator.rs:1168-1198 — start at 1.3/fs: first computed sample (2)
    # has phase 0.7 * phase_incr
    freq, fs = 1.0, 96000
    out, _ = _render_osc(freq, fs=fs, n=fs, start=1.3 / fs)
    incr = freq / fs
    k = np.arange(fs, dtype=np.float64) - 2.0
    expected = np.sin((0.7 + k) * incr * 2 * np.pi)
    expected[:2] = 0.0
    np.testing.assert_allclose(out, expected, atol=1e-5)


def test_osc_sub_quantum_stop():
    # oscillator.rs:1200-1230 — stop at sample 6
    freq = 2345.6
    out, _ = _render_osc(freq, stop=6.0 / FS)
    k = np.arange(FS, dtype=np.float64)
    expected = np.sin(k * (float(np.float32(freq)) / FS) * 2 * np.pi)
    expected[6:] = 0.0
    np.testing.assert_allclose(out, expected, atol=1e-5)


def test_osc_stop_disarms_future_start():
    # oscillator.rs:1232-1247 — stop() now with a future start: no output
    ctx = OfflineAudioContext(1, 128, float(FS))
    osc = ctx.create_oscillator()
    osc.connect(ctx.destination)
    osc.start(2.0 / FS)
    osc.stop()
    out = ctx.start_rendering_sync().get_channel_data(0)
    np.testing.assert_allclose(out, 0.0, atol=0.0)


def test_osc_delayed_start_renders_first_active_block():
    # oscillator.rs:1410-1429
    out, _ = _render_osc(440.0, n=256, start=128.0 / FS)
    np.testing.assert_allclose(out[:128], 0.0, atol=1e-5)
    assert np.any(out[128:] != 0.0)


def test_osc_reenters_audible_range_after_nyquist():
    # oscillator.rs:1383-1408 — computed freq 80 kHz renders silence but
    # the phase keeps advancing; dropping detune at quantum 2 resumes sound
    ctx = OfflineAudioContext(1, 256, float(FS))
    osc = ctx.create_oscillator()
    osc.connect(ctx.destination)
    osc.frequency.set_value(20000.0)
    osc.detune.set_value(2400.0)
    osc.detune.set_value_at_time(0.0, 128.0 / FS)
    osc.start(0.0)
    out = ctx.start_rendering_sync().get_channel_data(0)
    np.testing.assert_allclose(out[:128], 0.0, atol=1e-5)
    assert np.isfinite(out[128:]).all()
    assert np.any(out[128:] != 0.0)


def test_sine_negative_frequency():
    # oscillator.rs:1431-1460 — negative frequency runs the phase backwards
    freq = -100.0
    out, _ = _render_osc(freq)
    k = np.arange(FS, dtype=np.float64)
    expected = np.sin(k * (freq / FS) * 2 * np.pi)
    np.testing.assert_allclose(out, expected, atol=1e-5)
