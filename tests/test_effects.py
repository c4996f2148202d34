"""Convolver, waveshaper, compressor, stereo panner, splitter/merger,
analyser, IIR, panner tests vs numpy/scipy oracles."""

import numpy as np
import pytest
from scipy.signal import lfilter

from webaudio_tpu import OfflineAudioContext
from webaudio_tpu.nodes.convolver import normalize_buffer_scale


def _ctx_with_buffer(x, fs, n_out=None, channels=1):
    n = x.shape[-1]
    ctx = OfflineAudioContext(channels, n_out or n, fs)
    buf = ctx.create_buffer(1 if x.ndim == 1 else x.shape[0], n, fs)
    if x.ndim == 1:
        buf.copy_to_channel(x, 0)
    else:
        for c in range(x.shape[0]):
            buf.copy_to_channel(x[c], c)
    src = ctx.create_buffer_source()
    src.buffer = buf
    return ctx, src


def test_convolver_identity_ir():
    fs = 48000.0
    rng = np.random.RandomState(0)
    x = rng.randn(1000).astype(np.float32)
    ctx, src = _ctx_with_buffer(x, fs, n_out=1024)
    ir = ctx.create_buffer(1, 1, fs)
    ir.copy_to_channel(np.array([1.0], np.float32), 0)
    conv = ctx.create_convolver(disable_normalization=True)
    conv.set_buffer(ir)
    src.connect(conv)
    conv.connect(ctx.destination)
    src.start()
    out = ctx.start_rendering_sync().get_channel_data(0)
    np.testing.assert_allclose(out[:1000], x, atol=1e-5)


def test_convolver_matches_numpy_convolve():
    fs = 48000.0
    rng = np.random.RandomState(1)
    x = rng.randn(4000).astype(np.float32) * 0.5
    h = (rng.randn(2500) * np.exp(-np.arange(2500) / 500)).astype(np.float32)
    ctx, src = _ctx_with_buffer(x, fs, n_out=8192)
    ir = ctx.create_buffer(1, 2500, fs)
    ir.copy_to_channel(h, 0)
    conv = ctx.create_convolver(disable_normalization=True)
    conv.set_buffer(ir)
    src.connect(conv)
    conv.connect(ctx.destination)
    src.start()
    out = ctx.start_rendering_sync().get_channel_data(0)
    full = np.convolve(x.astype(np.float64), h.astype(np.float64))
    expected = np.zeros(8192)
    expected[:len(full)] = full
    np.testing.assert_allclose(out, expected, atol=2e-4 * np.abs(expected).max())


def test_convolver_normalization_scale():
    fs = 44100.0
    ctx = OfflineAudioContext(1, 128, fs)
    ir = ctx.create_buffer(1, 100, fs)
    ir.copy_to_channel(np.ones(100, np.float32) * 0.5, 0)
    scale = normalize_buffer_scale(ir)
    # power = 0.5, scale = 1/0.5 * 0.00125 * (44100/44100)
    assert scale == pytest.approx(0.0025, rel=1e-5)


def test_waveshaper_curve():
    fs = 48000.0
    n = 256
    x = np.linspace(-1.5, 1.5, n).astype(np.float32)
    ctx, src = _ctx_with_buffer(x, fs)
    shaper = ctx.create_wave_shaper()
    shaper.set_curve([-1.0, 0.0, 1.0])  # identity inside [-1, 1], clamps outside
    src.connect(shaper)
    shaper.connect(ctx.destination)
    src.start()
    out = ctx.start_rendering_sync().get_channel_data(0)
    np.testing.assert_allclose(out, np.clip(x, -1, 1), atol=1e-6)


def test_waveshaper_oversample_reduces_aliasing():
    fs = 48000.0
    n = 8192
    t = np.arange(n, dtype=np.float64)
    x = np.sin(2 * np.pi * 5000 * t / fs).astype(np.float32)

    def render(oversample):
        ctx, src = _ctx_with_buffer(x, fs)
        shaper = ctx.create_wave_shaper(oversample=oversample)
        curve = np.tanh(np.linspace(-3, 3, 1024) * 3).astype(np.float32)
        shaper.set_curve(curve)
        src.connect(shaper)
        shaper.connect(ctx.destination)
        src.start()
        return ctx.start_rendering_sync().get_channel_data(0)

    none = render("none")
    x4 = render("4x")
    # aliased components land at non-harmonic bins; measure energy at an
    # alias frequency of the 5th harmonic (25 kHz folds to 23 kHz)
    spec_n = np.abs(np.fft.rfft(none[2048:6144] * np.hanning(4096)))
    spec_4 = np.abs(np.fft.rfft(x4[2048:6144] * np.hanning(4096)))
    freqs = np.fft.rfftfreq(4096, 1 / fs)
    alias_band = (freqs > 22000) & (freqs < 24000)
    assert spec_4[alias_band].max() < spec_n[alias_band].max() * 0.2


def test_compressor_reduces_gain():
    fs = 48000.0
    n = 48000
    x = np.ones(n, np.float32) * 1.0  # 0 dBFS constant
    ctx, src = _ctx_with_buffer(x, fs)
    comp = ctx.create_dynamics_compressor(threshold=-24.0, knee=0.0, ratio=12.0)
    src.connect(comp)
    comp.connect(ctx.destination)
    src.start()
    out = ctx.start_rendering_sync().get_channel_data(0)
    # steady state: input 0dB, threshold -24, ratio 12 -> attenuation 22dB,
    # makeup gain = ((10^(22/20))^0.6) in dB = 13.2dB -> total -8.8dB
    steady = out[-100:].mean()
    expected = 10 ** ((-22.0 + 0.6 * 22.0) / 20.0)
    assert steady == pytest.approx(expected, rel=0.01)
    assert comp.reduction == pytest.approx(-22.0 + 0.6 * 22.0, abs=0.2)


def test_compressor_lookahead_delay():
    # output is delayed by ceil(fs*0.006/128) render quanta — the ~6 ms
    # lookahead rounded up to quantum granularity, matching the reference's
    # ring of quanta (dynamics_compressor.rs:251-254, test at :524-562)
    fs = 48000.0
    n = 1024
    quanta = int(np.ceil(fs * 0.006 / 128))  # 3 at 48 kHz
    x = np.zeros(n, np.float32)
    x[0] = 0.01  # low level: no compression, only makeup gain & delay
    ctx, src = _ctx_with_buffer(x, fs)
    comp = ctx.create_dynamics_compressor()
    src.connect(comp)
    comp.connect(ctx.destination)
    src.start()
    out = ctx.start_rendering_sync().get_channel_data(0)
    assert np.all(out[: quanta * 128] == 0.0)
    assert out[quanta * 128] != 0.0


def test_stereo_panner_hard_left_right():
    fs = 48000.0
    for pan, active, silent in ((-1.0, 0, 1), (1.0, 1, 0)):
        ctx = OfflineAudioContext(2, 128, fs)
        src = ctx.create_constant_source(offset=1.0)
        p = ctx.create_stereo_panner(pan=pan)
        src.connect(p)
        p.connect(ctx.destination)
        src.start()
        buf = ctx.start_rendering_sync()
        np.testing.assert_allclose(buf.get_channel_data(active), 1.0, atol=1e-6)
        np.testing.assert_allclose(buf.get_channel_data(silent), 0.0, atol=1e-6)


def test_stereo_panner_center_mono():
    fs = 48000.0
    ctx = OfflineAudioContext(2, 128, fs)
    src = ctx.create_constant_source(offset=1.0)
    p = ctx.create_stereo_panner()
    src.connect(p)
    p.connect(ctx.destination)
    src.start()
    buf = ctx.start_rendering_sync()
    v = np.cos(np.pi / 4)
    np.testing.assert_allclose(buf.get_channel_data(0), v, atol=1e-6)
    np.testing.assert_allclose(buf.get_channel_data(1), v, atol=1e-6)


def test_splitter_merger_swap():
    fs = 48000.0
    ctx = OfflineAudioContext(2, 128, fs)
    # stereo source with distinct channels via merger of two constants
    c1 = ctx.create_constant_source(offset=0.25)
    c2 = ctx.create_constant_source(offset=0.75)
    merge_in = ctx.create_channel_merger(2)
    c1.connect(merge_in, 0, 0)
    c2.connect(merge_in, 0, 1)
    split = ctx.create_channel_splitter(2)
    merge_in.connect(split)
    merge_out = ctx.create_channel_merger(2)
    split.connect(merge_out, 0, 1)  # swap channels
    split.connect(merge_out, 1, 0)
    merge_out.connect(ctx.destination)
    c1.start()
    c2.start()
    buf = ctx.start_rendering_sync()
    np.testing.assert_allclose(buf.get_channel_data(0), 0.75, atol=0)
    np.testing.assert_allclose(buf.get_channel_data(1), 0.25, atol=0)


def test_iir_matches_scipy():
    fs = 48000.0
    rng = np.random.RandomState(7)
    x = rng.randn(4096).astype(np.float32) * 0.4
    b = [0.2, 0.3, 0.1]
    a = [1.0, -0.5, 0.2, -0.05]
    ctx, src = _ctx_with_buffer(x, fs)
    f = ctx.create_iir_filter(feedforward=b, feedback=a)
    src.connect(f)
    f.connect(ctx.destination)
    src.start()
    out = ctx.start_rendering_sync().get_channel_data(0)
    expected = lfilter(b, a, x.astype(np.float64))
    np.testing.assert_allclose(out, expected, atol=2e-5)


def test_analyser_time_and_frequency():
    fs = 48000.0
    n = 4096
    t = np.arange(n, dtype=np.float64)
    x = np.sin(2 * np.pi * 1500 * t / fs).astype(np.float32)
    ctx, src = _ctx_with_buffer(x, fs)
    an = ctx.create_analyser(fft_size=2048)
    src.connect(an)
    an.connect(ctx.destination)
    src.start()
    ctx.start_rendering_sync()
    td = np.zeros(2048, np.float32)
    an.get_float_time_domain_data(td)
    np.testing.assert_allclose(td, x[-2048:], atol=1e-6)
    fd = np.zeros(an.frequency_bin_count, np.float32)
    an.get_float_frequency_data(fd)
    peak_bin = int(np.argmax(fd))
    assert abs(peak_bin * fs / 2048 - 1500) < fs / 2048 * 1.5


def test_panner_equal_power_left():
    fs = 48000.0
    ctx = OfflineAudioContext(2, 128, fs)
    src = ctx.create_constant_source(offset=1.0)
    p = ctx.create_panner(position_x=-1.0, ref_distance=1.0,
                          distance_model="inverse")
    src.connect(p)
    p.connect(ctx.destination)
    src.start()
    buf = ctx.start_rendering_sync()
    # source hard left of default listener: left ear full, right silent
    assert buf.get_channel_data(0)[64] > 0.9
    assert abs(buf.get_channel_data(1)[64]) < 1e-6


def test_panner_distance_attenuation():
    fs = 48000.0

    def level(z):
        ctx = OfflineAudioContext(2, 128, fs)
        src = ctx.create_constant_source(offset=1.0)
        p = ctx.create_panner(position_z=z, distance_model="inverse",
                              ref_distance=1.0)
        src.connect(p)
        p.connect(ctx.destination)
        src.start()
        buf = ctx.start_rendering_sync()
        out = buf.to_array()
        return np.sqrt((out[:, 64] ** 2).sum())

    near = level(-1.0)
    far = level(-10.0)
    # inverse model: gain(10) = 1/(1 + (10-1)) = 0.1 of gain(1)
    assert near == pytest.approx(far * 10.0, rel=0.05)


def test_listener_position_moves_image():
    fs = 48000.0
    ctx = OfflineAudioContext(2, 128, fs)
    src = ctx.create_constant_source(offset=1.0)
    p = ctx.create_panner(position_x=0.0, position_z=-1.0)
    ctx.listener.position_x.set_value(5.0)  # listener to the right -> source left
    src.connect(p)
    p.connect(ctx.destination)
    src.start()
    buf = ctx.start_rendering_sync()
    assert buf.get_channel_data(0)[64] > buf.get_channel_data(1)[64]


def test_listener_param_audio_input_ordering():
    # regression: audio driving a listener param must be ordered before the
    # panner that subscribes to it, regardless of node creation order
    fs = 48000.0
    ctx = OfflineAudioContext(2, 128, fs)
    src = ctx.create_constant_source(offset=1.0)
    p = ctx.create_panner(position_z=-1.0)
    src.connect(p)
    p.connect(ctx.destination)
    src.start()
    # created AFTER the panner: would be topologically late without the
    # foreign-param ordering edges
    mover = ctx.create_constant_source(offset=5.0)
    g = ctx.create_gain()
    mover.connect(g)
    g.connect(ctx.listener.position_x)
    mover.start()
    out = ctx.start_rendering_sync().to_array()
    # listener far right of the source -> image hard left
    assert out[0, 64] > out[1, 64] * 5


def test_detector_fixed_point_matches_sequential():
    """The TPU detector (branch-pattern fixed point + associative scan,
    dynamics_compressor._detector_fixed_point) must match the reference's
    per-sample recurrence; the maps are continuous at their breakpoints so
    the iteration converges to the exact forward solution (differences are
    f32-sequential rounding, bounded ~3e-5 relative over fuzz)."""
    import jax.numpy as jnp
    from webaudio_tpu.nodes.dynamics_compressor import (
        _detector_fixed_point, _detector_sequential)

    rng = np.random.RandomState(7)
    fs = 44100.0
    for kind in range(6):
        B = [128, 1000, 4096, 20000, 48000, 513][kind]
        if kind % 3 == 0:
            x = np.abs(rng.randn(B)).astype(np.float32) * 30
        elif kind % 3 == 1:
            x = np.zeros(B, np.float32)
            x[B // 4: B // 2] = 25.0
        else:
            t = np.arange(B)
            x = (20 * np.abs(np.sin(2 * np.pi * t / 997))
                 + rng.randn(B)).astype(np.float32)
        a = np.float32(np.exp(-1 / (rng.uniform(0.0005, 0.05) * fs)))
        r = np.float32(np.exp(-1 / (rng.uniform(0.01, 1.0) * fs)))
        at = jnp.full((B,), a)
        rt = jnp.full((B,), r)
        y0 = jnp.float32(rng.uniform(0, 10))
        ref = np.asarray(_detector_sequential(y0, jnp.asarray(x), at, rt))
        fp = np.asarray(_detector_fixed_point(y0, jnp.asarray(x), at, rt))
        scale = max(np.abs(ref).max(), 1e-6)
        assert np.abs(ref - fp).max() / scale < 1e-4, (kind, B)


def test_detector_chunked_matches_sequential():
    """The constant-tau chunked MXU detector (dynamics_compressor.
    _detector_fixed_point_chunked) must match the per-sample recurrence to
    the same 1e-4 relative tolerance as the generic fixed point."""
    import jax.numpy as jnp
    from webaudio_tpu.nodes.dynamics_compressor import (
        _detector_fixed_point_chunked, _detector_sequential, chunked_taus_ok)

    rng = np.random.RandomState(11)
    fs = 48000.0
    for kind in range(8):
        B = [128, 513, 4096, 16384, 1000, 131072, 20000, 129][kind]
        if kind % 3 == 0:
            x = np.abs(rng.randn(B)).astype(np.float32) * 30
        elif kind % 3 == 1:
            x = np.zeros(B, np.float32)
            x[B // 4: B // 2] = 25.0
        else:
            t = np.arange(B)
            x = (20 * np.abs(np.sin(2 * np.pi * t / 997))
                 + rng.randn(B)).astype(np.float32)
        a = float(np.exp(-1 / (rng.uniform(0.001, 0.05) * fs)))
        r = float(np.exp(-1 / (rng.uniform(0.01, 1.0) * fs)))
        assert chunked_taus_ok(a, r)
        at = jnp.full((B,), np.float32(a))
        rt = jnp.full((B,), np.float32(r))
        y0 = jnp.float32(rng.uniform(0, 10))
        ref = np.asarray(_detector_sequential(y0, jnp.asarray(x), at, rt))
        ch = np.asarray(_detector_fixed_point_chunked(
            y0, jnp.asarray(x), a, r))
        scale = max(np.abs(ref).max(), 1e-6)
        assert np.abs(ref - ch).max() / scale < 1e-4, (kind, B)
    # range guard: sub-chunk-collapse taus must be rejected
    assert not chunked_taus_ok(0.0, 0.99)
    assert not chunked_taus_ok(0.5, 0.99)


def test_compressor_kernel_uses_chunked_detector():
    """End-to-end: a compressor with constant k-rate params renders through
    the chunked detector and matches the WEBAUDIO_DETECTOR=seq render."""
    import os
    from webaudio_tpu import OfflineAudioContext

    def render(mode):
        os.environ["WEBAUDIO_DETECTOR"] = mode
        try:
            fs = 48000.0
            n = 8192
            ctx = OfflineAudioContext(2, n, fs)
            buf = ctx.create_buffer(2, n, fs)
            rng = np.random.RandomState(3)
            for c in range(2):
                buf.copy_to_channel(
                    (rng.randn(n) * 0.5).astype(np.float32), c)
            src = ctx.create_buffer_source()
            src.buffer = buf
            comp = ctx.create_dynamics_compressor(threshold=-20.0, ratio=6.0)
            src.connect(comp)
            comp.connect(ctx.destination)
            src.start()
            from webaudio_tpu.graph import compiler as C

            cg = C.compile_graph(dict(ctx._nodes), list(ctx._edges),
                                 ctx.sample_rate, ctx.length,
                                 ctx._destination.node_id)
            kern = next(k for k in cg.kernels.values()
                        if type(k).__name__ == "_CompressorKernel")
            assert kern.const_taus is not None
            return ctx.start_rendering_sync().to_array()
        finally:
            os.environ.pop("WEBAUDIO_DETECTOR", None)

    seq = render("seq")
    ch = render("chunked")
    scale = max(float(np.abs(seq).max()), 1e-9)
    np.testing.assert_allclose(ch, seq, atol=2e-4 * scale)
