"""Core-module test transcriptions: periodic_wave.rs, context/offline.rs
suspend validation + event tests, and lib.rs validation helpers
(reference: src/periodic_wave.rs:215-350, src/context/offline.rs tests,
src/lib.rs tests).
"""

import numpy as np
import pytest

from webaudio_tpu import OfflineAudioContext
from webaudio_tpu.constants import (
    IndexSizeError, InvalidStateError, NotSupportedError,
    assert_valid_sample_rate, assert_valid_number_of_channels,
    assert_valid_time_value, WebAudioError)
from webaudio_tpu.periodic_wave import (PeriodicWave,
                                        PERIODIC_WAVE_TABLE_LENGTH)


# --- periodic_wave.rs -------------------------------------------------------

def test_fails_to_build_when_only_real_is_defined_and_too_short():
    with pytest.raises(IndexSizeError):
        PeriodicWave(real=[0.0])


def test_fails_to_build_when_only_imag_is_defined_and_too_short():
    with pytest.raises(IndexSizeError):
        PeriodicWave(imag=[0.0])


def test_fails_to_build_when_imag_and_real_not_equal_length():
    with pytest.raises(IndexSizeError):
        PeriodicWave(real=[0.0, 0.0, 0.0], imag=[0.0, 0.0])


def test_fails_to_build_when_imag_and_real_too_short():
    with pytest.raises(IndexSizeError):
        PeriodicWave(real=[0.0], imag=[0.0])


def test_wavetable_generate_sine():
    # periodic_wave.rs wavetable_generate_sine
    table = PeriodicWave(real=[0.0, 0.0], imag=[0.0, 1.0]).as_array()
    n = PERIODIC_WAVE_TABLE_LENGTH
    i = np.arange(n, dtype=np.float32)
    expected = np.sin(i / np.float32(n) * 2.0 * np.float32(np.pi))
    np.testing.assert_allclose(table, expected, atol=1e-6)


def _two_partials_expected():
    n = PERIODIC_WAVE_TABLE_LENGTH
    i = np.arange(n, dtype=np.float64)
    return (0.5 * np.sin(1.0 * i / n * 2 * np.pi)
            + 0.5 * np.sin(2.0 * i / n * 2 * np.pi)).astype(np.float32)


def test_wavetable_generate_2f_not_norm():
    table = PeriodicWave(real=[0.0, 0.0, 0.0], imag=[0.0, 0.5, 0.5],
                         disable_normalization=True).as_array()
    np.testing.assert_allclose(table, _two_partials_expected(), atol=1e-6)


def test_wavetable_generate_2f_norm():
    # periodic_wave.rs wavetable_generate_2f_norm — the normalized table
    # is the raw table scaled so its peak hits 1.0
    table = PeriodicWave(real=[0.0, 0.0, 0.0], imag=[0.0, 0.5, 0.5]).as_array()
    raw = _two_partials_expected()
    expected = raw / np.abs(raw).max()
    np.testing.assert_allclose(table, expected, atol=1e-6)
    assert np.abs(table).max() == pytest.approx(1.0, abs=1e-7)


# --- context/offline.rs -----------------------------------------------------

def test_sample_rate_length():
    ctx = OfflineAudioContext(1, 48000, 96000.0)
    assert ctx.sample_rate == 96000.0
    assert ctx.length == 48000


def test_suspend_negative_raises():
    ctx = OfflineAudioContext(2, 128, 44100.0)
    with pytest.raises(InvalidStateError):
        ctx.suspend_sync(-1.0, lambda c: None)


def test_suspend_after_duration_raises():
    ctx = OfflineAudioContext(2, 128, 44100.0)
    with pytest.raises(InvalidStateError):
        ctx.suspend_sync(1.0, lambda c: None)


def test_suspend_after_render_raises():
    ctx = OfflineAudioContext(2, 128, 44100.0)
    ctx.start_rendering_sync()
    with pytest.raises(InvalidStateError):
        ctx.suspend_sync(0.0, lambda c: None)


def test_suspend_identical_frame_raises():
    ctx = OfflineAudioContext(2, 128, 44100.0)
    ctx.suspend_sync(0.0, lambda c: None)
    with pytest.raises(InvalidStateError):
        ctx.suspend_sync(0.0, lambda c: None)


def test_onstatechange():
    ctx = OfflineAudioContext(2, 555, 44100.0)
    seen = []
    ctx.set_onstatechange(lambda ev: seen.append(ev))
    ctx.start_rendering_sync()
    assert seen


def test_oncomplete():
    ctx = OfflineAudioContext(2, 555, 44100.0)
    seen = []
    ctx.set_oncomplete(lambda ev: seen.append(ev.rendered_buffer.length))
    ctx.start_rendering_sync()
    assert seen == [555]


def test_onstatechange_event_type():
    ctx = OfflineAudioContext(2, 128, 44100.0)
    types = []
    ctx.set_onstatechange(lambda ev: types.append(ev.type))
    ctx.start_rendering_sync()
    assert types and all(t == "statechange" for t in types)


# --- lib.rs validation helpers ----------------------------------------------

def test_valid_sample_rate():
    assert_valid_sample_rate(8000.0)


def test_invalid_sample_rate_too_small():
    with pytest.raises(NotSupportedError):
        assert_valid_sample_rate(2999.0)


def test_invalid_sample_rate_too_big():
    with pytest.raises(NotSupportedError):
        assert_valid_sample_rate(768001.0)


def test_invalid_number_of_channels_min():
    with pytest.raises(WebAudioError):
        assert_valid_number_of_channels(0)


def test_invalid_number_of_channels_max():
    with pytest.raises(WebAudioError):
        assert_valid_number_of_channels(33)


def test_valid_number_of_channels():
    assert_valid_number_of_channels(1)
    assert_valid_number_of_channels(32)


def test_invalid_time_value_non_finite():
    # the reference panic maps to TypeError (the convention the param
    # corpus already pins, test_reference_vectors_param.py:546)
    with pytest.raises(TypeError):
        assert_valid_time_value(float("nan"))


def test_invalid_time_value_negative():
    with pytest.raises(TypeError):
        assert_valid_time_value(-1.0)


def test_valid_time_value():
    assert_valid_time_value(0.0)
    assert_valid_time_value(1.0)


def test_context_equals():
    """reference: context/mod.rs test_context_equals — a node's .context
    is the context that created it (the Send/Sync trait assertions in the
    same mod are Rust-specific and moot in Python)."""
    ctx = OfflineAudioContext(1, 48000, 96000.0)
    assert ctx.destination.context is ctx
