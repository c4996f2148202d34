"""Compressed-codec decode (native wacodec host over system FFmpeg libs).

The reference decodes these formats via symphonia
(/root/reference/src/decoding.rs:15-54) and ships test media for each;
we cross-validate every compressed decode against the same clip's WAV
(lossless: exact; lossy: aligned correlation > 0.99), per SURVEY §4.3.
"""

import os

import numpy as np
import pytest

from webaudio_tpu.media.decoding import decode_audio_data

SAMPLES = "/root/reference/samples"

needs_samples = pytest.mark.skipif(
    not os.path.isdir(SAMPLES), reason="reference sample media not present")


def _decode(name):
    return decode_audio_data(os.path.join(SAMPLES, name))


def _xcorr_align(a, b, max_lag=4096):
    """Best alignment lag of b against a (both mono f32)."""
    n = min(len(a), len(b), 1 << 16)
    a = a[:n] - a[:n].mean()
    b = b[:n] - b[:n].mean()
    corr = np.correlate(a, b[max_lag:-max_lag] if n > 3 * max_lag else b,
                        mode="valid")
    return int(np.argmax(corr)) - (max_lag if n > 3 * max_lag else 0)


def _aligned_corr(ref, dec):
    """Pearson correlation after xcorr alignment."""
    lag = _xcorr_align(ref, dec)
    if lag >= 0:
        r, d = ref[lag:], dec[: len(ref) - lag]
    else:
        r, d = ref[: len(ref) + lag], dec[-lag:]
    n = min(len(r), len(d))
    r, d = r[:n].astype(np.float64), d[:n].astype(np.float64)
    denom = np.sqrt((r * r).sum() * (d * d).sum())
    return float((r * d).sum() / max(denom, 1e-12))


@needs_samples
def test_wav_reference_clip():
    buf = _decode("sample.wav")
    assert buf.sample_rate == 44100.0
    assert buf.number_of_channels == 2
    assert abs(buf.duration - 3.224) < 0.01


@needs_samples
@pytest.mark.parametrize("name,rate,lossless", [
    ("sample.mp3", 44100.0, False),
    ("sample.ogg", 44100.0, False),
    ("sample-aac.m4a", 44100.0, False),
    ("sample-alac.m4a", 44100.0, True),
    ("sample.webm", 48000.0, False),   # opus decodes at 48 kHz
])
def test_codec_matches_wav(name, rate, lossless):
    ref = _decode("sample.wav")
    dec = _decode(name)
    assert dec.sample_rate == rate
    assert dec.number_of_channels == 2
    # duration parity: within one codec frame (~60 ms for aac padding)
    assert abs(dec.duration - ref.duration) < 0.06, (dec.duration,
                                                     ref.duration)
    ref0 = ref.get_channel_data(0)
    dec0 = dec.get_channel_data(0)
    if dec.sample_rate != ref.sample_rate:
        # compare at the reference rate via numpy linear resample
        x = np.arange(len(ref0), dtype=np.float64)
        xi = np.arange(len(dec0)) * (ref.sample_rate / dec.sample_rate)
        dec0 = np.interp(x, xi, dec0).astype(np.float32)
    if lossless:
        n = min(len(ref0), len(dec0))
        np.testing.assert_allclose(dec0[:n], ref0[:n], atol=1e-4)
    else:
        corr = _aligned_corr(ref0, dec0)
        assert corr > 0.99, f"{name}: aligned correlation {corr:.4f}"


@needs_samples
def test_flac_matches_wav():
    # the reference's sample.flac and sample.wav are separate 16-bit encodes
    # of the same clip (they differ by a few 2^-15 quanta), so assert
    # sample-aligned near-equality rather than bit-exactness
    ref = _decode("sample.wav")
    dec = _decode("sample.flac")
    assert dec.sample_rate == ref.sample_rate
    assert dec.length == ref.length
    for c in range(2):
        np.testing.assert_allclose(dec.get_channel_data(c),
                                   ref.get_channel_data(c), atol=1e-3)
        assert _aligned_corr(ref.get_channel_data(c),
                             dec.get_channel_data(c)) > 0.9999


@needs_samples
@pytest.mark.parametrize("name,rate,channels,dur", [
    ("major-scale.ogg", 32000.0, 1, 4.26),
    ("siren.mp3", 44100.0, 2, 31.53),
    ("white.ogg", 44100.0, 1, 5.0),
])
def test_codec_standalone_clips(name, rate, channels, dur):
    buf = _decode(name)
    assert buf.sample_rate == rate
    assert buf.number_of_channels == channels
    assert abs(buf.duration - dur) < 0.05
    data = buf.get_channel_data(0)
    assert np.isfinite(data).all()
    assert np.abs(data).max() > 0.1


@needs_samples
def test_decode_into_offline_graph():
    """End-to-end: decode an mp3, resample into a context, render it."""
    import jax
    jax.config.update("jax_platforms", "cpu")
    from webaudio_tpu import OfflineAudioContext

    clip = _decode("sample.mp3")
    fs = 48000.0
    ctx = OfflineAudioContext(2, int(fs * 0.5), fs)
    src = ctx.create_buffer_source()
    src.buffer = clip.resampled(fs) if hasattr(clip, "resampled") else clip
    src.connect(ctx.destination)
    src.start()
    out = ctx.start_rendering_sync().to_array()
    assert np.isfinite(out).all()
    assert np.abs(out).max() > 0.01


def test_garbage_stream_raises():
    from webaudio_tpu.constants import NotSupportedError
    with pytest.raises(NotSupportedError):
        decode_audio_data(b"\xff\xfb" + os.urandom(64))


@needs_samples
def test_sequential_mixed_decodes_one_process():
    """Regression: decoding many formats back-to-back in one process used
    to corrupt the heap (swr_convert needs av_samples_alloc-padded output
    planes; an exact-size buffer trampled allocator metadata)."""
    names = ["sample.flac", "sample.mp3", "sample.ogg", "sample-aac.m4a",
             "sample-alac.m4a", "sample.webm", "white.ogg", "siren.mp3"]
    for _ in range(3):
        for name in names:
            buf = _decode(name)
            assert buf.length > 0
            assert np.isfinite(buf.get_channel_data(0)).all()
