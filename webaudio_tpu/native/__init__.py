"""ctypes bindings for the native host runtime (wahost.cpp).

Builds the shared library on demand with g++ (cached next to the source);
every entry point has a numpy fallback in the pure-Python modules, so the
engine works without a C++ toolchain too.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "wahost.cpp")
_LIB = os.path.join(_HERE, "libwahost.so")

_lock = threading.Lock()
_lib = None
_unavailable = False


def _build() -> bool:
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", _SRC, "-o", _LIB],
            check=True, capture_output=True, timeout=120)
        return True
    except Exception:
        return False


def get_lib():
    """Load (building if needed) the native library, or None."""
    global _lib, _unavailable
    with _lock:
        if _lib is not None or _unavailable:
            return _lib
        if not os.path.exists(_LIB) or \
                os.path.getmtime(_LIB) < os.path.getmtime(_SRC):
            if not _build():
                _unavailable = True
                return None
        try:
            lib = ctypes.CDLL(_LIB)
        except OSError:
            _unavailable = True
            return None

        u8p = ctypes.POINTER(ctypes.c_uint8)
        f32p = ctypes.POINTER(ctypes.c_float)
        lib.wah_wav_probe.argtypes = [
            u8p, ctypes.c_uint64, ctypes.POINTER(ctypes.c_uint32),
            ctypes.POINTER(ctypes.c_uint32), ctypes.POINTER(ctypes.c_double)]
        lib.wah_wav_probe.restype = ctypes.c_int
        lib.wah_wav_decode.argtypes = [u8p, ctypes.c_uint64, f32p]
        lib.wah_wav_decode.restype = ctypes.c_int
        lib.wah_resample_linear.argtypes = [
            f32p, ctypes.c_uint32, ctypes.c_uint64, f32p, ctypes.c_uint64,
            ctypes.c_double]
        lib.wah_resample_linear.restype = None
        if hasattr(lib, "wah_flac_probe"):
            lib.wah_flac_probe.argtypes = [
                u8p, ctypes.c_uint64, ctypes.POINTER(ctypes.c_uint32),
                ctypes.POINTER(ctypes.c_uint32),
                ctypes.POINTER(ctypes.c_uint64)]
            lib.wah_flac_probe.restype = ctypes.c_int
            lib.wah_flac_decode.argtypes = [u8p, ctypes.c_uint64, f32p,
                                            ctypes.c_uint64]
            lib.wah_flac_decode.restype = ctypes.c_int64
        _lib = lib
        return _lib


def wav_decode_native(data: bytes):
    """-> ((channels, frames) f32, sample_rate) or None if unsupported."""
    lib = get_lib()
    if lib is None:
        return None
    buf = (ctypes.c_uint8 * len(data)).from_buffer_copy(data)
    ch = ctypes.c_uint32()
    frames = ctypes.c_uint32()
    rate = ctypes.c_double()
    if lib.wah_wav_probe(buf, len(data), ctypes.byref(ch),
                         ctypes.byref(frames), ctypes.byref(rate)) != 0:
        return None
    out = np.empty((ch.value, frames.value), np.float32)
    rc = lib.wah_wav_decode(
        buf, len(data), out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
    if rc != 0:
        return None
    return out, rate.value


def resample_linear_native(data: np.ndarray, ratio: float,
                           out_frames: int):
    """-> (channels, out_frames) f32 or None."""
    lib = get_lib()
    if lib is None:
        return None
    data = np.ascontiguousarray(data, np.float32)
    out = np.empty((data.shape[0], out_frames), np.float32)
    lib.wah_resample_linear(
        data.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        data.shape[0], data.shape[1],
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        out_frames, ratio)
    return out


def flac_decode_native(data: bytes):
    """-> ((channels, frames) f32, sample_rate) or None if unsupported.

    Native FLAC decode (wahost.cpp wah_flac_decode); the TPU-native analog
    of the reference's symphonia FLAC path (src/decoding.rs)."""
    lib = get_lib()
    if lib is None or not hasattr(lib, "wah_flac_probe"):
        return None
    buf = (ctypes.c_uint8 * len(data)).from_buffer_copy(data)
    ch = ctypes.c_uint32()
    rate = ctypes.c_uint32()
    total = ctypes.c_uint64()
    if lib.wah_flac_probe(buf, len(data), ctypes.byref(ch),
                          ctypes.byref(rate), ctypes.byref(total)) != 0:
        return None
    cap = total.value
    if cap == 0:
        # unknown length: bound by the worst-case bits-per-sample ratio
        cap = max(len(data) * 4, 65536)
    out = np.zeros((ch.value, cap), np.float32)
    n = lib.wah_flac_decode(
        buf, len(data), out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        cap)
    if n < 0:
        return None
    if total.value and n != total.value:
        return None  # truncated / corrupt stream
    return out[:, :n].copy() if n != cap else out, float(rate.value)


# --- compressed-codec host (wacodec.cpp over system FFmpeg libs) -----------
# The native analog of the reference's symphonia dependency
# (/root/reference/src/decoding.rs:15-54): mp3, ogg/vorbis, aac/m4a, alac,
# webm/opus and anything else libavformat demuxes.  Built as a separate
# shared object so the core wahost library never depends on libav.

_CODEC_SRC = os.path.join(_HERE, "wacodec.cpp")
_CODEC_LIB = os.path.join(_HERE, "libwacodec.so")
_codec_lib = None
_codec_unavailable = False


def _build_codec() -> bool:
    try:
        subprocess.run(
            ["g++", "-O2", "-shared", "-fPIC", _CODEC_SRC, "-o", _CODEC_LIB,
             "-lavformat", "-lavcodec", "-lavutil", "-lswresample"],
            check=True, capture_output=True, timeout=180)
        return True
    except Exception:
        return False


def get_codec_lib():
    """Load (building if needed) the codec host, or None if libav is not
    present on this machine."""
    global _codec_lib, _codec_unavailable
    with _lock:
        if _codec_lib is not None or _codec_unavailable:
            return _codec_lib
        if not os.path.exists(_CODEC_LIB) or \
                os.path.getmtime(_CODEC_LIB) < os.path.getmtime(_CODEC_SRC):
            if not _build_codec():
                _codec_unavailable = True
                return None
        try:
            lib = ctypes.CDLL(_CODEC_LIB)
        except OSError:
            _codec_unavailable = True
            return None
        u8p = ctypes.POINTER(ctypes.c_uint8)
        f32pp = ctypes.POINTER(ctypes.POINTER(ctypes.c_float))
        lib.wac_decode.argtypes = [
            u8p, ctypes.c_uint64, f32pp,
            ctypes.POINTER(ctypes.c_uint32), ctypes.POINTER(ctypes.c_uint32),
            ctypes.POINTER(ctypes.c_uint64), ctypes.c_char_p, ctypes.c_int]
        lib.wac_decode.restype = ctypes.c_int
        lib.wac_free.argtypes = [ctypes.POINTER(ctypes.c_float)]
        lib.wac_free.restype = None
        _codec_lib = lib
        return _codec_lib


def codec_decode_native(data: bytes):
    """Decode any libav-supported compressed stream.

    -> ((channels, frames) f32, sample_rate) on success,
       None if the codec host is unavailable,
       or raises ValueError with the decoder's message on a bad stream."""
    lib = get_codec_lib()
    if lib is None:
        return None
    buf = (ctypes.c_uint8 * len(data)).from_buffer_copy(data)
    out = ctypes.POINTER(ctypes.c_float)()
    ch = ctypes.c_uint32()
    rate = ctypes.c_uint32()
    frames = ctypes.c_uint64()
    err = ctypes.create_string_buffer(256)
    rc = lib.wac_decode(buf, len(data), ctypes.byref(out), ctypes.byref(ch),
                        ctypes.byref(rate), ctypes.byref(frames), err, 256)
    if rc != 0:
        raise ValueError(err.value.decode("utf-8", "replace") or
                         f"decode failed (rc={rc})")
    try:
        arr = np.ctypeslib.as_array(
            out, shape=(ch.value, frames.value)).copy()
    finally:
        lib.wac_free(out)
    return arr, float(rate.value)
