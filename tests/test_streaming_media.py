"""Streaming decode pipeline: CodecStream, MediaDecoder, MediaElement.

reference: src/decoding.rs:60-92 (MediaInput over any Read stream),
decoding.rs:97+ (MediaDecoder chunk iterator), media_element.rs:12-55
(creek bounded-memory disk streaming).  The rebuild streams through the
native codec host (wacodec.cpp over libavformat); these tests assert
(a) chunked decode == whole decode bit-exactly, (b) the MediaElement
window stays bounded while playing a long file, (c) live controls
(seek/loop/pause/rate) behave, (d) graceful fallback for in-memory
sources.
"""

import io
import math
import os

import numpy as np
import pytest

import webaudio_tpu as wa
from webaudio_tpu.media.decoding import MediaDecoder, decode_audio_data
from webaudio_tpu.media.element import MediaElement
from webaudio_tpu.media.wav import write_wav
from webaudio_tpu.native import codec_open_stream, get_codec_lib

SAMPLES = "/root/reference/samples"

needs_codec = pytest.mark.skipif(
    get_codec_lib() is None or not hasattr(get_codec_lib(), "wac_open"),
    reason="native codec host unavailable")


def _long_wav(tmp_path, seconds=65.0, fs=8000.0):
    """A >=60 s two-channel test file whose samples are analytically
    known (frame index encoded in the signal)."""
    n = int(seconds * fs)
    t = np.arange(n, dtype=np.float64)
    sig = np.stack([
        np.sin(2 * np.pi * 220.0 * t / fs),
        np.sin(2 * np.pi * 330.0 * t / fs),
    ]).astype(np.float32) * 0.5
    path = os.path.join(str(tmp_path), "long.wav")
    write_wav(path, sig, fs)
    return path, sig, fs


@needs_codec
def test_media_decoder_chunks_match_whole():
    for name in ("sample.mp3", "sample.ogg", "sample.flac"):
        path = os.path.join(SAMPLES, name)
        with open(path, "rb") as f:
            whole = decode_audio_data(f.read()).to_array()
        md = MediaDecoder(path, chunk_frames=5000)
        chunks = [b.to_array() for b in md]
        got = np.concatenate(chunks, axis=1)
        assert all(c.shape[1] <= 5000 for c in chunks)
        np.testing.assert_array_equal(got, whole, err_msg=name)


@needs_codec
def test_media_decoder_unseekable_stream():
    # forward-only source (the reference's MediaInput contract): an
    # unseekable reader must still decode chunk-by-chunk
    class ForwardOnly(io.RawIOBase):
        def __init__(self, data):
            self._d = data
            self._p = 0

        def readable(self):
            return True

        def seekable(self):
            return False

        def read(self, n=-1):
            if n is None or n < 0:
                n = len(self._d) - self._p
            out = self._d[self._p:self._p + n]
            self._p += len(out)
            return out

    path = os.path.join(SAMPLES, "sample.ogg")
    with open(path, "rb") as f:
        data = f.read()
    whole = decode_audio_data(data).to_array()
    md = MediaDecoder(ForwardOnly(data), chunk_frames=4096)
    got = np.concatenate([b.to_array() for b in md], axis=1)
    np.testing.assert_array_equal(got, whole)


@needs_codec
def test_decode_audio_data_streams_path_without_slurp():
    # path input for a compressed container goes through the incremental
    # host; result equals the in-memory decode
    path = os.path.join(SAMPLES, "sample.mp3")
    via_path = decode_audio_data(path).to_array()
    with open(path, "rb") as f:
        via_bytes = decode_audio_data(f.read()).to_array()
    np.testing.assert_array_equal(via_path, via_bytes)


@needs_codec
def test_media_element_streams_long_file_bounded(tmp_path):
    path, sig, fs = _long_wav(tmp_path)
    el = MediaElement(path)
    assert el.streaming, "expected disk-streaming mode"
    assert el.number_of_channels == 2
    assert abs(el.duration - sig.shape[1] / fs) < 0.05

    el.play()
    pulled = []
    max_window = 0
    # pull the whole 65 s file in 1024-frame chunks at the native rate
    total = sig.shape[1]
    while sum(p.shape[1] for p in pulled) < total:
        pulled.append(el._pull_chunk(1024, fs).copy())
        max_window = max(max_window, el._win.shape[1])
        if el.paused:  # ended
            break
    got = np.concatenate(pulled, axis=1)[:, :total]
    np.testing.assert_allclose(got, sig, atol=1e-4)
    # bounded memory: the rolling window never grows near the file length
    assert max_window < 64 * 1024, max_window
    assert el.paused  # ended at EOF
    el.close()


@needs_codec
def test_media_element_seek_rate_loop(tmp_path):
    path, sig, fs = _long_wav(tmp_path, seconds=2.0)
    n = sig.shape[1]
    el = MediaElement(path)
    el.play()

    # sample-accurate seek on PCM
    el.set_current_time(1.0)
    chunk = el._pull_chunk(256, fs)
    k0 = int(1.0 * fs)
    np.testing.assert_allclose(chunk, sig[:, k0:k0 + 256], atol=1e-4)

    # backward seek
    el.set_current_time(0.25)
    chunk = el._pull_chunk(256, fs)
    k0 = int(0.25 * fs)
    np.testing.assert_allclose(chunk, sig[:, k0:k0 + 256], atol=1e-4)

    # double-rate playback: output[i] = source[pos + 2i] (lerped)
    el.set_current_time(0.0)
    el.playback_rate = 2.0
    chunk = el._pull_chunk(200, fs)
    np.testing.assert_allclose(chunk[:, :100], sig[:, 0:200:2], atol=1e-3)
    el.playback_rate = 1.0

    # loop: play past the end wraps to the start seamlessly
    el.loop = True
    el.set_current_time((n - 100) / fs)
    chunk = el._pull_chunk(300, fs)
    np.testing.assert_allclose(chunk[:, :100], sig[:, n - 100:], atol=1e-4)
    np.testing.assert_allclose(chunk[:, 100:], sig[:, :200], atol=1e-4)
    assert not el.paused
    assert el.current_time == pytest.approx(200 / fs, abs=1e-6)

    # pause produces silence and holds the position
    el.pause()
    assert np.all(el._pull_chunk(64, fs) == 0.0)
    assert el.current_time == pytest.approx(200 / fs, abs=1e-6)
    el.close()


def test_media_element_bytes_fallback_still_works():
    # in-memory sources keep the whole-decode path (API-identical)
    fs = 8000.0
    sig = (np.arange(1000, dtype=np.float32) / 1000.0)[None, :]
    blob = write_wav(None, sig, fs)
    el = MediaElement(io.BytesIO(blob))
    assert not el.streaming
    el.play()
    chunk = el._pull_chunk(100, fs)
    np.testing.assert_allclose(chunk[0], sig[0, :100], atol=1e-4)


@needs_codec
def test_media_element_through_graph(tmp_path):
    # end-to-end: a streaming MediaElement drives a
    # MediaElementAudioSourceNode inside an offline render
    path, sig, fs = _long_wav(tmp_path, seconds=1.0)
    ctx = wa.OfflineAudioContext(2, 2048, fs)
    el = MediaElement(path)
    assert el.streaming
    el.play()
    from webaudio_tpu.nodes.media_nodes import MediaElementAudioSourceNode

    node = MediaElementAudioSourceNode(ctx, el)
    node.connect(ctx.destination)
    out = ctx.start_rendering_sync().to_array()
    np.testing.assert_allclose(out, sig[:, :2048], atol=1e-4)
    el.close()


@needs_codec
def test_caf_container_decodes(tmp_path):
    # CAF coverage (the reference's symphonia features=["all"] would accept
    # caf; SURVEY item 36): s16-BE LPCM Core Audio Format written here,
    # decoded through the codec host
    import struct

    fs = 22050.0
    n = 4000
    t = np.arange(n)
    sig = np.stack([np.sin(2 * np.pi * 440.0 * t / fs),
                    np.sin(2 * np.pi * 660.0 * t / fs)]) * 0.4
    codes = np.round(sig * 32767.0).astype(">i2")          # big-endian s16

    desc = struct.pack(">d4sIIIII", fs, b"lpcm", 0, 4, 1, 2, 16)
    payload = codes.T.reshape(-1).tobytes()                # interleaved
    data = struct.pack(">I", 0) + payload
    caf = (b"caff" + struct.pack(">HH", 1, 0)
           + b"desc" + struct.pack(">q", len(desc)) + desc
           + b"data" + struct.pack(">q", len(data)) + data)
    path = os.path.join(str(tmp_path), "t.caf")
    with open(path, "wb") as f:
        f.write(caf)

    buf = decode_audio_data(path)
    assert buf.sample_rate == fs
    assert buf.number_of_channels == 2
    got = buf.to_array()[:, :n]
    np.testing.assert_allclose(got, sig, atol=2e-4)


def test_decoder_fallback_rewinds_after_probe(tmp_path, monkeypatch):
    # advisor round-3: when codec_open_stream fails AFTER its container
    # probe consumed bytes, the whole-file fallback must rewind a seekable
    # source instead of decoding from a mid-stream position
    import webaudio_tpu.media.decoding as dec_mod

    sr = 8000
    t = np.arange(sr, dtype=np.float32) / sr
    x = (0.5 * np.sin(2 * np.pi * 440.0 * t)).astype(np.float32)
    path = tmp_path / "probe.wav"
    write_wav(str(path), x[None, :], sr)

    def consuming_probe(f):
        f.read(512)  # container probe eats bytes, then gives up
        raise RuntimeError("no codec")

    monkeypatch.setattr("webaudio_tpu.native.codec_open_stream",
                        consuming_probe)
    with open(path, "rb") as f:
        md = dec_mod.MediaDecoder(f, chunk_frames=4096)
        chunks = [c.to_array() for c in md]
    got = np.concatenate(chunks, axis=1)
    ref = decode_audio_data(path.read_bytes()).to_array()
    np.testing.assert_allclose(got, ref, atol=1e-6)
