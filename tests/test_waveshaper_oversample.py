"""WaveShaper oversampling oracle: alias suppression, latency, equivalence.

The reference oversamples via rubato's FFT resampler
(/root/reference/src/node/waveshaper.rs:233-348); this build uses
linear-phase windowed-sinc polyphase FIRs (ops/resample.py) — a different
kernel with the same function.  Documented deviation: the FIR chain has an
exact 48-sample (1 ms @ 48 kHz) linear-phase group delay per oversampled
render, where rubato's FFT blocks impose their own (block-sized) latency;
neither implementation compensates it.

These tests quantify the path instead of smoke-testing it:
- a 10 kHz sine through a cubic curve puts the 3rd harmonic at 30 kHz,
  which folds to 18 kHz at fs=48k without oversampling; 2x/4x must
  suppress that fold-back by >=60/80 dB relative to the un-oversampled
  render (measured: ~100/116 dB)
- the latency is exactly the analytic FIR group delay (24 up + 24 down)
- for band-limited input the oversampled output equals the plain curve
  output shifted by that latency
"""

import numpy as np

from webaudio_tpu import OfflineAudioContext

FS = 48000.0
N = 8192


def _render(oversample, x, curve):
    ctx = OfflineAudioContext(1, N, FS)
    buf = ctx.create_buffer(1, N, FS)
    buf.copy_to_channel(x.astype(np.float32), 0)
    src = ctx.create_buffer_source()
    src.buffer = buf
    sh = ctx.create_wave_shaper(oversample=oversample)
    sh.set_curve(curve)
    src.connect(sh)
    sh.connect(ctx.destination)
    src.start()
    return ctx.start_rendering_sync().get_channel_data(0)


def _band_peak(spectrum, freqs, fc, width=3):
    i = int(np.argmin(np.abs(freqs - fc)))
    return spectrum[max(i - width, 0): i + width + 1].max()


def test_alias_suppression_2x_4x():
    t = np.arange(N) / FS
    sine = 0.9 * np.sin(2 * np.pi * 10000.0 * t)
    grid = np.linspace(-1, 1, 2049)
    cubic = (grid ** 3).astype(np.float32)
    win = np.hanning(4096)

    levels = {}
    for ov in ("none", "2x", "4x"):
        out = _render(ov, sine, cubic)
        seg = out[3000:7096] * win
        spec = np.abs(np.fft.rfft(seg))
        freqs = np.fft.rfftfreq(4096, 1.0 / FS)
        fund = _band_peak(spec, freqs, 10000.0)
        alias = _band_peak(spec, freqs, 18000.0)  # folded 3rd harmonic
        levels[ov] = 20.0 * np.log10(alias / fund + 1e-15)

    # without oversampling the folded 3rd harmonic sits ~9 dB below the
    # fundamental — clearly audible aliasing
    assert levels["none"] > -20.0, levels
    # 2x/4x must bury it (measured ~-110 / -125 dB)
    assert levels["2x"] < levels["none"] - 60.0, levels
    assert levels["4x"] < levels["none"] - 80.0, levels
    assert levels["4x"] <= levels["2x"] + 1.0, levels


def test_oversample_latency_is_analytic_group_delay():
    # upsample FIR (48*f+1 taps at f*fs: 24 samples at fs) + downsample FIR
    # (same): 48 samples total, independent of factor
    x = np.zeros(N, np.float32)
    x[100] = 1.0
    identity = np.linspace(-1, 1, 1025).astype(np.float32)
    for ov in ("2x", "4x"):
        out = _render(ov, x, identity)
        assert int(np.argmax(np.abs(out))) == 100 + 48, ov
    out = _render("none", x, identity)
    assert int(np.argmax(np.abs(out))) == 100


def test_low_frequency_equivalence_after_latency():
    # a 100 Hz tone is far inside the FIR passband: the oversampled output
    # must equal the plain curve output shifted by the 48-sample latency
    t = np.arange(N) / FS
    tone = (0.8 * np.sin(2 * np.pi * 100.0 * t)).astype(np.float32)
    grid = np.linspace(-1, 1, 4097)
    curve = np.tanh(2.0 * grid).astype(np.float32)

    ref = _render("none", tone, curve)
    for ov in ("2x", "4x"):
        out = _render(ov, tone, curve)
        a = ref[1000: N - 1048]
        b = out[1048: N - 1000]
        scale = np.abs(a).max()
        np.testing.assert_allclose(b, a, atol=2e-3 * scale,
                                   err_msg=f"oversample={ov}")


def test_oversampled_hard_clip_bounded():
    # hard clipping at +-0.5 with linear-phase FIRs rings (Gibbs) but must
    # stay bounded and keep the saturated level
    t = np.arange(N) / FS
    tone = np.sin(2 * np.pi * 440.0 * t)
    grid = np.linspace(-1, 1, 513)
    clip = np.clip(grid, -0.5, 0.5).astype(np.float32)
    for ov in ("2x", "4x"):
        out = _render(ov, tone, clip)
        assert np.isfinite(out).all()
        assert 0.5 < np.abs(out).max() < 0.62, ov


def test_long_curve_gather_fallback_matches_matmul():
    # curves beyond the matmul-segment threshold switch to the gather+lerp
    # path; both must agree with a numpy gather+lerp oracle
    import jax.numpy as jnp
    from webaudio_tpu.nodes.waveshaper import (
        apply_curve, _apply_curve_gather, _SEG, _MAX_MATMUL_SEGS)

    rng = np.random.default_rng(7)
    x = rng.uniform(-1.2, 1.2, size=2048).astype(np.float32)

    def oracle(curve, x):
        n = len(curve)
        v = (n - 1) / 2.0 * (x.astype(np.float64) + 1.0)
        v = np.clip(v, 0.0, float(n - 1))
        ki = np.minimum(np.floor(v).astype(np.int64), n - 2)
        f = (v - ki).astype(np.float32)
        return (1.0 - f) * curve[ki] + f * curve[ki + 1]

    for n in (3, 257, 2049, _SEG * _MAX_MATMUL_SEGS + 1, 65536):
        grid = np.linspace(-1, 1, n)
        curve = np.tanh(3.0 * grid).astype(np.float32)
        got = np.asarray(apply_curve(jnp.asarray(curve), jnp.asarray(x)))
        np.testing.assert_allclose(got, oracle(curve, x), atol=2e-6,
                                   err_msg=f"curve len {n}")
        # gather path agrees with the matmul path on short curves too
        gat = np.asarray(_apply_curve_gather(jnp.asarray(curve),
                                             jnp.asarray(x)))
        np.testing.assert_allclose(gat, oracle(curve, x), atol=2e-6,
                                   err_msg=f"gather, curve len {n}")
