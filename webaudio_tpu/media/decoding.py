"""Host-side media decoding -> AudioBuffer.

reference: src/decoding.rs (symphonia probe over wav/mp3/ogg/flac/aac/...).
This build decodes WAV and AIFF (numpy, plus the optional C++ wahost
fast path) and FLAC (native wahost decoder, wahost.cpp:wah_flac_decode)
natively; every other container/codec (mp3, ogg-vorbis, aac/m4a, alac,
webm-opus, caf, ...) routes through the native codec host
(wacodec.cpp over the system FFmpeg libraries — the C++ analog of the
reference's symphonia probe).  Decode is host-side feeding device
buffers either way, per SURVEY.md §2.1; on a machine without
libavformat the compressed formats raise NotSupportedError.
"""

from __future__ import annotations

import struct

import numpy as np

from ..buffer import AudioBuffer
from ..constants import NotSupportedError
from . import wav as wav_codec

_MAGIC = {
    b"ID3": "mp3", b"\xff\xfb": "mp3", b"\xff\xf3": "mp3", b"\xff\xf2": "mp3",
    b"OggS": "ogg", b"fLaC": "flac", b"\x00\x00\x00 ftyp": "m4a",
    b"\x1a\x45\xdf\xa3": "webm",
}


def _sniff(data: bytes) -> str:
    if data[:4] == b"RIFF" and data[8:12] == b"WAVE":
        return "wav"
    if data[:4] == b"FORM" and data[8:12] in (b"AIFF", b"AIFC"):
        return "aiff"
    for magic, name in _MAGIC.items():
        if data[: len(magic)] == magic:
            return name
    if data[4:8] == b"ftyp":
        return "m4a"
    return "unknown"


def decode_audio_data(source) -> AudioBuffer:
    """Decode an encoded stream (path / bytes / file-like) to an AudioBuffer
    at the *media's* sample rate; callers resample to the context rate
    (reference: context/base.rs:68-103)."""
    if hasattr(source, "read"):
        data = source.read()
    elif isinstance(source, str):
        with open(source, "rb") as f:
            data = f.read()
    else:
        data = bytes(source)

    kind = _sniff(data)
    if kind == "wav":
        arr, rate = wav_codec.read_wav(data)
        if arr.shape[1] == 0:
            raise NotSupportedError("WAV stream contains no audio frames")
        return AudioBuffer.from_array(arr, rate)
    if kind == "flac":
        from ..native import flac_decode_native
        res = flac_decode_native(data)
        if res is None:
            raise NotSupportedError(
                "FLAC decode failed (corrupt stream or native wahost "
                "library unavailable)")
        arr, rate = res
        if arr.shape[1] == 0:
            raise NotSupportedError("FLAC stream contains no audio frames")
        return AudioBuffer.from_array(arr, rate)
    if kind == "aiff":
        arr, rate = _read_aiff(data)
        return AudioBuffer.from_array(arr, rate)
    # compressed codecs (mp3, ogg/vorbis, aac/m4a, alac, webm/opus, ...)
    # go through the native codec host (wacodec.cpp over the system FFmpeg
    # libraries) — the C++ equivalent of the reference's symphonia probe
    # (/root/reference/src/decoding.rs:15-54)
    from ..native import codec_decode_native
    try:
        res = codec_decode_native(data)
    except ValueError as e:
        raise NotSupportedError(f"decoding '{kind}' stream failed: {e}")
    if res is None:
        raise NotSupportedError(
            f"decoding '{kind}' streams requires the native codec host "
            f"(libwacodec.so over libavformat), which is unavailable here; "
            f"always supported: WAV (PCM/float/G.711/ADPCM), AIFF, FLAC")
    arr, rate = res
    if arr.shape[1] == 0:
        raise NotSupportedError(f"'{kind}' stream contains no audio frames")
    return AudioBuffer.from_array(arr, rate)


def _read_aiff(data: bytes) -> tuple[np.ndarray, float]:
    """Minimal AIFF (big-endian PCM) parser."""
    pos = 12
    comm = ssnd = None
    while pos + 8 <= len(data):
        cid = data[pos:pos + 4]
        size = struct.unpack_from(">I", data, pos + 4)[0]
        body = data[pos + 8: pos + 8 + size]
        if cid == b"COMM":
            comm = body
        elif cid == b"SSND":
            ssnd = body
        pos += 8 + size + (size & 1)
    if comm is None or ssnd is None:
        raise NotSupportedError("missing COMM/SSND chunk")
    channels, _frames, bits = struct.unpack_from(">HIH", comm, 0)
    # 80-bit extended float sample rate
    exp = struct.unpack_from(">H", comm, 8)[0]
    mant = struct.unpack_from(">Q", comm, 10)[0]
    sample_rate = mant * 2.0 ** (exp - 16383 - 63) if mant else 0.0
    offset = struct.unpack_from(">I", ssnd, 0)[0]
    payload = ssnd[8 + offset:]
    if bits == 16:
        x = np.frombuffer(payload, dtype=">i2").astype(np.float32) / 32768.0
    elif bits == 8:
        x = np.frombuffer(payload, dtype=np.int8).astype(np.float32) / 128.0
    elif bits == 24:
        raw = np.frombuffer(payload, dtype=np.uint8)
        raw = raw[: len(raw) // 3 * 3].reshape(-1, 3)
        x = ((raw[:, 0].astype(np.int32) << 16)
             | (raw[:, 1].astype(np.int32) << 8) | raw[:, 2].astype(np.int32))
        x = np.where(x >= 1 << 23, x - (1 << 24), x).astype(np.float32) / float(1 << 23)
    elif bits == 32:
        x = np.frombuffer(payload, dtype=">i4").astype(np.float32) / 2147483648.0
    else:
        raise NotSupportedError(f"unsupported AIFF bit depth {bits}")
    n = len(x) // channels * channels
    return x[:n].reshape(-1, channels).T.copy(), float(sample_rate)
