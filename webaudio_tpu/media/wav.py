"""WAV (RIFF) codec, host-side.

The analog of the reference's symphonia-wav decode path (decoding.rs) and
hound-based encode (media_recorder/mod.rs:40-48).  Pure numpy RIFF parsing:
PCM u8/i16/i24/i32 and float32/float64, arbitrary channel counts.  A C++
fast path (native/wahost.cpp) is used when built; this module is the
always-available fallback and the format reference.
"""

from __future__ import annotations

import io
import struct

import numpy as np

from ..constants import NotSupportedError


def read_wav(source) -> tuple[np.ndarray, float]:
    """Decode a WAV file/path/bytes -> ((channels, frames) f32, sample_rate)."""
    if isinstance(source, (str, bytes)) and not (
            isinstance(source, bytes) and source[:4] == b"RIFF"):
        with open(source, "rb") as f:
            data = f.read()
    elif isinstance(source, bytes):
        data = source
    elif hasattr(source, "read"):
        data = source.read()
    else:
        raise TypeError(f"cannot read WAV from {type(source)}")

    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise NotSupportedError("not a RIFF/WAVE stream")

    # native fast path (webaudio_tpu/native/wahost.cpp)
    from ..native import wav_decode_native

    native = wav_decode_native(data)
    if native is not None:
        return native

    pos = 12
    fmt = None
    payload = None
    while pos + 8 <= len(data):
        cid = data[pos:pos + 4]
        size = struct.unpack_from("<I", data, pos + 4)[0]
        body = data[pos + 8: pos + 8 + size]
        if cid == b"fmt ":
            fmt = body
        elif cid == b"data":
            payload = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned

    if fmt is None or payload is None:
        raise NotSupportedError("missing fmt/data chunk")

    (audio_format, channels, sample_rate, _byte_rate, block_align,
     bits) = struct.unpack_from("<HHIIHH", fmt, 0)
    if audio_format == 0xFFFE and len(fmt) >= 40:  # WAVE_FORMAT_EXTENSIBLE
        audio_format = struct.unpack_from("<H", fmt, 24)[0]

    frames = len(payload) // block_align if block_align else 0
    payload = payload[: frames * block_align]

    if audio_format == 1:  # integer PCM
        if bits == 8:
            x = np.frombuffer(payload, dtype=np.uint8).astype(np.float32)
            x = (x - 128.0) / 128.0
        elif bits == 16:
            x = np.frombuffer(payload, dtype="<i2").astype(np.float32) / 32768.0
        elif bits == 24:
            raw = np.frombuffer(payload, dtype=np.uint8).reshape(-1, 3)
            x = (raw[:, 0].astype(np.int32)
                 | (raw[:, 1].astype(np.int32) << 8)
                 | (raw[:, 2].astype(np.int32) << 16))
            x = np.where(x >= 1 << 23, x - (1 << 24), x).astype(np.float32) / float(1 << 23)
        elif bits == 32:
            x = np.frombuffer(payload, dtype="<i4").astype(np.float32) / 2147483648.0
        else:
            raise NotSupportedError(f"unsupported PCM bit depth {bits}")
    elif audio_format == 3:  # IEEE float
        if bits == 32:
            x = np.frombuffer(payload, dtype="<f4").astype(np.float32)
        elif bits == 64:
            x = np.frombuffer(payload, dtype="<f8").astype(np.float32)
        else:
            raise NotSupportedError(f"unsupported float bit depth {bits}")
    else:
        raise NotSupportedError(f"unsupported WAV format tag {audio_format}")

    x = x.reshape(-1, channels).T.copy()  # (channels, frames)
    return x, float(sample_rate)


def write_wav(path_or_file, data: np.ndarray, sample_rate: float,
              bits: int = 32, dither: bool = False) -> bytes | None:
    """Encode (channels, frames) f32 as WAV (float32 by default, or i16;
    `dither=True` applies TPD/stochastic dither via ops/dither.py — a
    Pallas kernel on TPU — before 16-bit quantization)."""
    raw = data
    data = np.asarray(data, dtype=np.float32)
    if data.ndim == 1:
        data = data[None, :]
    channels, frames = data.shape

    if bits == 32:
        fmt_tag = 3
        payload = data.T.reshape(-1).astype("<f4").tobytes()
    elif bits == 16:
        fmt_tag = 1
        if dither:
            from ..ops.dither import dither_to_i16

            codes = dither_to_i16(raw if getattr(raw, "ndim", 2) == 2 else data)
            payload = np.asarray(codes, "<i2").T.reshape(-1).tobytes()
        else:
            clipped = np.clip(data.T.reshape(-1), -1.0, 1.0)
            payload = (clipped * 32767.0).round().astype("<i2").tobytes()
    else:
        raise NotSupportedError(f"unsupported write bit depth {bits}")

    block_align = channels * bits // 8
    hdr = b"RIFF" + struct.pack("<I", 36 + len(payload)) + b"WAVE"
    hdr += b"fmt " + struct.pack("<IHHIIHH", 16, fmt_tag, channels,
                                 int(sample_rate),
                                 int(sample_rate) * block_align,
                                 block_align, bits)
    hdr += b"data" + struct.pack("<I", len(payload))
    blob = hdr + payload
    if path_or_file is None:
        return blob
    if hasattr(path_or_file, "write"):
        path_or_file.write(blob)
    else:
        with open(path_or_file, "wb") as f:
            f.write(blob)
    return None
