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
    n_out = int(np.ceil(1000 * ratio))
    native = resample_linear_native(x, ratio, n_out)
    assert native is not None
    # endpoint-preserving mapping (reference: buffer.rs:311-363)
    playhead = np.arange(n_out, dtype=np.float64) / (n_out - 1) * 999
    k = np.floor(playhead).astype(np.int64)
    frac = (playhead - k).astype(np.float32)
    k1 = np.minimum(k + 1, 999)
    k = np.minimum(k, 999)
    expected = x[:, k] * (1 - frac) + x[:, k1] * frac
    np.testing.assert_allclose(native, expected, atol=1e-6)


def test_decode_samples_via_native():
    from webaudio_tpu.media.decoding import decode_audio_data

    buf = decode_audio_data("/root/reference/samples/sample.wav")
    assert buf.number_of_channels == 2
    assert buf.length == 142187


def test_flac_decode_all_subframe_types():
    """Native FLAC decoder vs the spec-reference test encoder
    (tests/flac_ref.py): lossless round-trip across constant / verbatim /
    fixed(0-4) / LPC subframes, rice + rice2 + escape partitions, wasted
    bits, and all stereo decorrelation modes (wahost.cpp wah_flac_decode;
    reference decodes FLAC via symphonia, src/decoding.rs)."""
    import numpy as np
    from webaudio_tpu.native import flac_decode_native
    from flac_ref import encode_flac

    rng = np.random.RandomState(7)

    # mono 16-bit: every subframe kind + partition/escape variants
    total = 256 * 5 + 250
    s = rng.randint(-2000, 2000, total).astype(np.int64)
    s[256:512] = 123                      # constant block
    s[1024:1280] = (s[1024:1280] // 8) * 8  # wasted-bits block
    mono = s[None]
    plans = [
        (256, "independent", [dict(kind="verbatim")]),
        (256, "independent", [dict(kind="constant")]),
        (256, "independent", [dict(kind="fixed", order=0, porder=1, ks=[12])]),
        (256, "independent", [dict(kind="fixed", order=2, porder=2,
                                   ks=[3, 9, "escape:18", 5])]),
        (256, "independent", [dict(kind="fixed", order=4, wasted=3,
                                   ks=[11], method=1)]),
        (250, "independent", [dict(kind="lpc", order=8,
                                   coefs=[500, -200, 80, 60, -40, 20, 10, -5],
                                   prec=12, shift=9, porder=0, ks=[13])]),
    ]
    data = encode_flac(mono, 44100, 16, plans)
    out, rate = flac_decode_native(data)
    assert rate == 44100.0 and out.shape == (1, total)
    np.testing.assert_array_equal(
        out[0], (mono[0] / 2.0 ** 15).astype(np.float32))

    # stereo 16-bit: all decorrelation modes + independent
    total = 1024
    st = rng.randint(-3000, 3000, (2, total)).astype(np.int64)
    plans = [
        (256, "left_side", [dict(kind="verbatim"), dict(kind="fixed", order=1, ks=[6])]),
        (256, "right_side", [dict(kind="fixed", order=3, ks=[7]), dict(kind="verbatim")]),
        (256, "mid_side", [dict(kind="lpc", order=2, coefs=[900, -300],
                                prec=11, shift=9, ks=[8], method=1),
                           dict(kind="fixed", order=2, porder=1, ks=[6])]),
        (256, "independent", [dict(kind="verbatim"), dict(kind="verbatim")]),
    ]
    data = encode_flac(st, 48000, 16, plans)
    out, rate = flac_decode_native(data)
    assert rate == 48000.0 and out.shape == (2, total)
    np.testing.assert_array_equal(out, (st / 2.0 ** 15).astype(np.float32))

    # 24-bit mono
    total = 512
    s24 = rng.randint(-(1 << 22), 1 << 22, total).astype(np.int64)
    plans = [(512, "independent", [dict(kind="fixed", order=2, porder=2, ks=[14])])]
    data = encode_flac(s24[None], 96000, 24, plans)
    out, rate = flac_decode_native(data)
    assert rate == 96000.0
    np.testing.assert_array_equal(
        out[0], (s24 / 2.0 ** 23).astype(np.float32))


def test_flac_through_decode_audio_data():
    """FLAC routes through the public decodeAudioData path into an
    AudioBuffer and is playable through a graph."""
    import numpy as np
    from webaudio_tpu.media.decoding import decode_audio_data
    from flac_ref import encode_flac

    t = np.arange(1024)
    sig = (np.sin(t * 0.05) * 10000).astype(np.int64)
    data = encode_flac(sig[None], 22050, 16,
                       [(1024, "independent",
                         [dict(kind="fixed", order=2, ks=[9])])])
    buf = decode_audio_data(data)
    assert buf.sample_rate == 22050.0 and buf.length == 1024
    np.testing.assert_array_equal(
        buf.get_channel_data(0), (sig / 2.0 ** 15).astype(np.float32))


def test_flac_corrupt_stream_rejected():
    import pytest
    from webaudio_tpu.media.decoding import decode_audio_data
    from webaudio_tpu.constants import NotSupportedError
    with pytest.raises(NotSupportedError):
        decode_audio_data(b"fLaC" + b"\x00" * 64)


def test_wav_g711_mulaw_alaw():
    """G.711 u-law / A-law WAV decode vs independent scalar expanders."""
    import struct
    import numpy as np
    from webaudio_tpu.media.wav import read_wav

    def mulaw_ref(byte):
        u = ~byte & 0xFF
        sign, exp, mant = u & 0x80, (u >> 4) & 7, u & 0xF
        mag = (((mant << 3) + 0x84) << exp) - 0x84
        return -mag if sign else mag

    def alaw_ref(byte):
        a = byte ^ 0x55
        sign, exp, mant = a & 0x80, (a >> 4) & 7, a & 0xF
        mag = ((mant << 4) + 0x108) << (exp - 1) if exp else (mant << 4) + 8
        return -mag if sign else mag

    def wav_bytes(fmt_tag, payload, ch=1):
        fmt = struct.pack("<HHIIHH", fmt_tag, ch, 8000, 8000 * ch, ch, 8)
        return (b"RIFF" + struct.pack("<I", 36 + len(payload)) + b"WAVE"
                + b"fmt " + struct.pack("<I", len(fmt)) + fmt
                + b"data" + struct.pack("<I", len(payload)) + payload)

    payload = bytes(range(256))
    out, rate = read_wav(wav_bytes(7, payload))
    exp = np.array([mulaw_ref(b) for b in payload], np.float32) / 32768.0
    np.testing.assert_array_equal(out[0], exp)
    out, rate = read_wav(wav_bytes(6, payload))
    exp = np.array([alaw_ref(b) for b in payload], np.float32) / 32768.0
    np.testing.assert_array_equal(out[0], exp)
    assert rate == 8000.0


def test_wav_ima_adpcm():
    """IMA ADPCM WAV decode (vectorized) vs an independent scalar decoder,
    stereo, random nibbles."""
    import struct
    import numpy as np
    from webaudio_tpu.media.wav import read_wav, _IMA_STEPS, _IMA_INDEX

    rng = np.random.RandomState(3)
    ch, block_align, nblocks = 2, 256, 5
    payload = rng.randint(0, 256, nblocks * block_align).astype(np.uint8)
    # sanitize headers: clamp step index into range
    for b in range(nblocks):
        for c in range(ch):
            payload[b * block_align + 4 * c + 2] %= 89
    payload = payload.tobytes()

    fmt = struct.pack("<HHIIHHH", 0x11, ch, 8000, 8000, block_align, 4, 0)
    data = (b"RIFF" + struct.pack("<I", 36 + len(payload)) + b"WAVE"
            + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(payload)) + payload)
    out, rate = read_wav(data)

    # scalar reference
    spb = (block_align - 4 * ch) * 2 // ch + 1
    ref = np.zeros((ch, nblocks * spb), np.float32)
    for b in range(nblocks):
        blk = payload[b * block_align:(b + 1) * block_align]
        preds, idxs, nibs = [], [], [[] for _ in range(ch)]
        for c in range(ch):
            p = int.from_bytes(blk[4 * c:4 * c + 2], "little", signed=True)
            preds.append(p)
            idxs.append(blk[4 * c + 2])
        body = blk[4 * ch:]
        for g in range(len(body) // (4 * ch)):
            for c in range(ch):
                for byte in body[(g * ch + c) * 4:(g * ch + c) * 4 + 4]:
                    nibs[c] += [byte & 0xF, byte >> 4]
        for c in range(ch):
            pred, index = preds[c], idxs[c]
            ref[c, b * spb] = pred / 32768.0
            for t, n in enumerate(nibs[c]):
                step = int(_IMA_STEPS[index])
                diff = step >> 3
                if n & 1: diff += step >> 2
                if n & 2: diff += step >> 1
                if n & 4: diff += step
                pred = pred - diff if n & 8 else pred + diff
                pred = max(-32768, min(32767, pred))
                index = max(0, min(88, index + int(_IMA_INDEX[n & 7])))
                ref[c, b * spb + t + 1] = pred / 32768.0
    assert out.shape == ref.shape and rate == 8000.0
    np.testing.assert_array_equal(out, ref)
