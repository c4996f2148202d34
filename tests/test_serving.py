"""Batched-serving path: bounce codecs and the double-buffered stream loop.

reference has no counterpart (single-graph realtime engine); this is the
TPU-native serving story (README 'Live serving on TPU' / batched graphs).
"""

import numpy as np

import webaudio_tpu as wa
from webaudio_tpu.ops.dither import (
    dither_to_i16, ulaw_decode_u8, ulaw_encode_u8,
)
from webaudio_tpu.parallel.batch import GraphBatch

FS = 48000.0
N = 2048


def _ctx():
    ctx = wa.OfflineAudioContext(1, N, FS)
    o = ctx.create_oscillator(frequency=440.0)
    g = ctx.create_gain(gain=0.0)
    g.gain.linear_ramp_to_value_at_time(0.8, N / FS)
    o.connect(g)
    g.connect(ctx.destination)
    o.start()
    return ctx


def test_ulaw_roundtrip_snr():
    rng = np.random.default_rng(3)
    x = np.clip(rng.standard_normal((2, 8192)) * 0.3, -1, 1).astype(np.float32)
    codes = ulaw_encode_u8(x)
    assert codes.dtype == np.uint8
    y = ulaw_decode_u8(codes)
    err = y - x
    snr = 10 * np.log10(np.mean(x ** 2) / np.mean(err ** 2))
    assert snr > 30.0, snr  # preview grade; u-law at 0.3 RMS


def test_ulaw_extremes_and_monotone():
    x = np.linspace(-1, 1, 4097, dtype=np.float32)[None]
    codes = ulaw_encode_u8(x, seed=0).astype(np.int32)[0]
    assert codes.min() >= 0 and codes.max() <= 255
    # companding is monotone (dither allows +-1 code wiggle)
    assert np.all(np.diff(codes) >= -1)
    y = ulaw_decode_u8(ulaw_encode_u8(np.zeros((1, 64), np.float32)))
    assert np.abs(y).max() < 0.01


def test_render_stream_double_buffered_matches_direct():
    ctx = _ctx()
    gb = GraphBatch(ctx, batch=3)
    direct = np.asarray(gb.render_i16())
    outs = list(gb.render_stream(3, fetch="i16"))
    assert len(outs) == 3
    for o in outs:
        np.testing.assert_array_equal(o, direct)


def test_render_stream_with_updates():
    ctx = _ctx()
    g = next(n for n in ctx._nodes.values()
             if type(n).__name__ == "GainNode")
    gb = GraphBatch(ctx, batch=2)

    def updates(gb_, k):
        dense = np.full((2, N), 0.1 * (k + 1), np.float32)
        gb_.override_param(g, "gain", dense)

    outs = list(gb.render_stream(3, updates=updates, fetch="f32"))
    assert len(outs) == 3
    # batch k's output scales with the gain set before dispatch k
    np.testing.assert_allclose(outs[1], outs[0] * 2.0, atol=1e-5)
    np.testing.assert_allclose(outs[2], outs[0] * 3.0, atol=1e-5)


def test_render_u8_cpu_fallback():
    ctx = _ctx()
    gb = GraphBatch(ctx, batch=2)
    q = np.asarray(gb.render_u8())
    assert q.dtype == np.uint8
    ref = np.asarray(gb.render())
    dec = ulaw_decode_u8(q)
    # preview-grade: decoded bounce tracks the f32 render (u-law step
    # near full scale is ~0.035 in the linear domain, plus dither)
    assert np.abs(dec - ref).max() < 0.06


def test_ulaw_decode_is_unbiased_and_in_range():
    # advisor round-3: decode used (codes+0.5)/255, a +0.5-LSB bias that
    # pushed code 255 to ~1.022.  The stochastic-rounding encoder has
    # E[code] = scaled value, so codes/255 is the unbiased inverse.
    full = ulaw_decode_u8(np.array([255], np.uint8))
    assert full[0] <= 1.0
    neg = ulaw_decode_u8(np.array([0], np.uint8))
    assert neg[0] >= -1.0
    # many-seed average of encode->decode of a constant must approach it
    x = np.full((1, 4096), 0.5, np.float32)
    est = np.mean([ulaw_decode_u8(ulaw_encode_u8(x, seed=s)).mean()
                   for s in range(8)])
    assert abs(est - 0.5) < 2e-3
