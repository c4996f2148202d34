"""Time-axis sharded rendering vs sequential rendering (8 virtual devices)."""

import numpy as np
import pytest

from webaudio_tpu import OfflineAudioContext
from webaudio_tpu.parallel.segments import (
    render_time_sharded, NotTimeShardableError,
)


def _build(fs=48000.0, seconds=2.0):
    ctx = OfflineAudioContext(2, int(fs * seconds), fs)
    osc = ctx.create_oscillator(type="sawtooth", frequency=220.0)
    filt = ctx.create_biquad_filter(type="lowpass", frequency=3000.0, q=4.0)
    # buffer source mixed in (closed-form playhead)
    buf = ctx.create_buffer(1, 3000, fs)
    buf.copy_to_channel(
        np.sin(np.arange(3000) * 0.02).astype(np.float32), 0)
    src = ctx.create_buffer_source(loop=True)
    src.buffer = buf
    src.start(0.25)
    g = ctx.create_gain(gain=0.5)
    osc.connect(filt)
    filt.connect(ctx.destination)
    src.connect(g)
    g.connect(ctx.destination)
    osc.start()
    return ctx


def test_time_sharded_matches_sequential():
    seq = _build().start_rendering_sync().to_array()
    sharded = render_time_sharded(_build())
    assert sharded.shape == seq.shape
    scale = np.abs(seq).max()
    np.testing.assert_allclose(sharded, seq, atol=5e-5 * scale)


def test_time_sharded_with_reverb():
    fs = 44100.0
    def build():
        ctx = OfflineAudioContext(2, int(fs * 2), fs)
        osc = ctx.create_oscillator(frequency=440.0)
        verb = ctx.create_convolver(disable_normalization=True)
        rng = np.random.RandomState(0)
        ir = ctx.create_buffer(1, 8000, fs)
        ir.copy_to_channel(
            (rng.randn(8000) * np.exp(-np.arange(8000) / 2000) * 0.05
             ).astype(np.float32), 0)
        verb.set_buffer(ir)
        osc.connect(verb)
        verb.connect(ctx.destination)
        osc.start()
        return ctx

    seq = build().start_rendering_sync().to_array()
    sharded = render_time_sharded(build())
    scale = np.abs(seq).max()
    np.testing.assert_allclose(sharded, seq, atol=1e-4 * scale)


def test_unbounded_state_refuses():
    fs = 48000.0
    ctx = OfflineAudioContext(1, int(fs), fs)
    osc = ctx.create_oscillator()
    comp = ctx.create_dynamics_compressor()  # nonlinear IIR detector
    osc.connect(comp)
    comp.connect(ctx.destination)
    osc.start()
    with pytest.raises(NotTimeShardableError):
        render_time_sharded(ctx)


def test_graph_batch_per_instance_buffers():
    """Corpus batch-processing: each instance plays its own buffer."""
    from webaudio_tpu import OfflineAudioContext
    from webaudio_tpu.parallel.batch import GraphBatch
    import numpy as np

    fs = 48000.0
    n = 512
    ctx = OfflineAudioContext(1, n, fs)
    base = ctx.create_buffer(1, n, fs)
    base.copy_to_channel(np.ones(n, np.float32), 0)
    src = ctx.create_buffer_source()
    src.buffer = base
    src.connect(ctx.destination)
    src.start()

    batch = 4
    gb = GraphBatch(ctx, batch=batch)
    corpus = np.stack([np.full((1, n), float(i + 1), np.float32)
                       for i in range(batch)])
    gb.override_buffer(src, corpus)
    out = np.asarray(gb.render())[:, :, :n]
    for i in range(batch):
        np.testing.assert_allclose(out[i, 0], float(i + 1), atol=1e-6)
