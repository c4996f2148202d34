"""Native host library (wahost.cpp) vs numpy reference paths."""

import numpy as np
import pytest

from webaudio_tpu.media import wav as wav_codec
from webaudio_tpu.native import get_lib, wav_decode_native, resample_linear_native


def test_native_builds():
    assert get_lib() is not None, "g++ build of wahost failed"


def test_native_wav_matches_python():
    rng = np.random.RandomState(0)
    x = (rng.randn(2, 5000) * 0.4).astype(np.float32)
    blob = wav_codec.write_wav(None, x, 48000.0)
    native = wav_decode_native(blob)
    assert native is not None
    data, rate = native
    assert rate == 48000.0
    np.testing.assert_array_equal(data, x)
    # 16-bit path
    blob16 = wav_codec.write_wav(None, np.clip(x, -1, 1), 44100.0, bits=16)
    d16, r16 = wav_decode_native(blob16)
    assert r16 == 44100.0
    # write scales by 32767, read divides by 32768 (hound/symphonia convention)
    assert np.abs(d16 - np.clip(x, -1, 1)).max() < 6e-5


def test_native_resample_matches_numpy():
    rng = np.random.RandomState(1)
    x = rng.randn(2, 1000).astype(np.float32)
    ratio = 48000.0 / 44100.0
    n_out = int(round(1000 * ratio))
    native = resample_linear_native(x, ratio, n_out)
    assert native is not None
    pos = np.arange(n_out, dtype=np.float64) / ratio
    k = np.floor(pos).astype(np.int64)
    frac = (pos - k).astype(np.float32)
    k1 = np.minimum(k + 1, 999)
    k = np.minimum(k, 999)
    expected = x[:, k] * (1 - frac) + x[:, k1] * frac
    np.testing.assert_allclose(native, expected, atol=1e-6)


def test_decode_samples_via_native():
    from webaudio_tpu.media.decoding import decode_audio_data

    buf = decode_audio_data("/root/reference/samples/sample.wav")
    assert buf.number_of_channels == 2
    assert buf.length == 142187
