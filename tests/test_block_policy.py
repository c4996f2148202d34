"""Block-size policy + hot-path formulation equivalences.

The compiler picks block sizes by a padded-total + per-step-overhead
score filtered to partition-capable pow2 content (graph/compiler.py);
results must be invariant to the choice, and the slice/gather delay
formulations must agree.
"""

import os

import numpy as np

import webaudio_tpu as wa
from webaudio_tpu.graph import compiler as C


def _compile(ctx, **kw):
    return C.compile_graph(dict(ctx._nodes), list(ctx._edges),
                           ctx.sample_rate, ctx.length,
                           ctx._destination.node_id, **kw)


def _filter_graph(total_q, fs=48000.0):
    ctx = wa.OfflineAudioContext(2, total_q * 128, fs)
    src = ctx.create_buffer_source(loop=True)
    b = ctx.create_buffer(2, 1000, fs)
    b.copy_to_channel(np.sin(np.arange(1000) * 0.1).astype(np.float32), 0)
    b.copy_to_channel(np.cos(np.arange(1000) * 0.1).astype(np.float32), 1)
    src.buffer = b
    f = ctx.create_biquad_filter(type="lowpass", frequency=2000.0)
    src.connect(f)
    f.connect(ctx.destination)
    src.start()
    return ctx


def test_partitioned_graphs_prefer_pow2_rich_blocks():
    # 10 s @ 48 kHz: 2 big steps beat 30 small ones
    assert _compile(_filter_graph(3750)).block_frames == 2048 * 128
    # 2 s (the batched-graph shape): minimal padding wins
    assert _compile(_filter_graph(750)).block_frames == 128 * 128


def test_cycle_blocks_prefer_pow2_when_partitioned():
    fs = 44100.0
    ctx = wa.OfflineAudioContext(2, int(fs * 2.0), fs)
    src = ctx.create_oscillator(frequency=220.0)
    f = ctx.create_biquad_filter(type="lowpass", frequency=4000.0)
    d = ctx.create_delay(max_delay_time=1.0)
    d.delay_time.value = 0.31          # caps blocks at 106 quanta
    fb = ctx.create_gain(gain=0.4)
    src.connect(f)
    f.connect(ctx.destination)
    f.connect(d)
    d.connect(fb)
    fb.connect(d)
    fb.connect(ctx.destination)
    src.start()
    cg = _compile(ctx)
    q = cg.block_frames // 128
    # round 4: the two-rate compiler widens the OUTER block beyond the
    # delay bound (the cycle steps at the delay-bounded inner rate inside
    # an inner scan); the partitioned-FFT constraint becomes "the outer
    # block keeps >= 4096 samples of pow2 content" and the inner block is
    # a pow2 multiple-of-64 quanta
    content = cg.block_frames & -cg.block_frames
    assert content >= 4096, (q, content)
    assert q % 64 == 0, q                    # outer = m x pow2 inner (64)
    # with two-rate disabled the old single-rate invariant holds: pow2
    # block at the delay bound
    os.environ["WEBAUDIO_TWO_RATE"] = "0"
    try:
        cg1 = _compile(ctx)
        q1 = cg1.block_frames // 128
        assert q1 & (q1 - 1) == 0 and q1 >= 32, q1   # pow2 (64), not 104
    finally:
        os.environ.pop("WEBAUDIO_TWO_RATE", None)


def test_render_invariant_to_block_choice():
    """The same graph rendered with forced small blocks and with the
    policy's large blocks must agree to f32 noise (partition sizes and
    scan step counts differ end to end)."""
    def render(qpb):
        fs = 48000.0
        ctx = wa.OfflineAudioContext(2, int(fs * 1.2), fs)
        src = ctx.create_buffer_source(loop=True)
        b = ctx.create_buffer(2, 3001, fs)
        rng = np.random.RandomState(0)
        for c in range(2):
            b.copy_to_channel(rng.randn(3001).astype(np.float32) * 0.3, c)
        src.buffer = b
        f = ctx.create_biquad_filter(type="lowpass", frequency=3000.0, q=2.0)
        g = ctx.create_gain(gain=0.0)
        g.gain.linear_ramp_to_value_at_time(1.0, 1.0)
        src.connect(f)
        f.connect(g)
        g.connect(ctx.destination)
        src.start()
        cg = _compile(ctx, quanta_per_block=qpb)
        out, _ = C.render_compiled(cg, ctx._nodes, ctx.length)
        return np.asarray(out)[:, :ctx.length]

    a = render(8)
    b = render(None if False else 128)
    scale = max(np.abs(a).max(), 1e-9)
    np.testing.assert_allclose(a, b, atol=2e-5 * scale)


def test_constant_delay_slice_matches_arate_gather():
    """A scalar constant delay (slice path) must match the same delay
    expressed as a-rate automation (gather path) sample-for-sample."""
    def render(automated):
        fs = 48000.0
        ctx = wa.OfflineAudioContext(1, 8192, fs)
        src = ctx.create_buffer_source()
        b = ctx.create_buffer(1, 2048, fs)
        b.copy_to_channel(
            np.random.RandomState(3).randn(2048).astype(np.float32) * 0.4, 0)
        src.buffer = b
        d = ctx.create_delay(max_delay_time=0.1)
        if automated:
            # constant-valued a-rate timeline forces the dense path
            d.delay_time.set_value_at_time(0.013, 0.0)
            d.delay_time.linear_ramp_to_value_at_time(0.013, 8192 / fs)
        else:
            d.delay_time.value = 0.013
        src.connect(d)
        d.connect(ctx.destination)
        src.start()
        return ctx.start_rendering_sync().get_channel_data(0)

    a = render(False)
    b = render(True)
    scale = max(np.abs(a).max(), 1e-9)
    np.testing.assert_allclose(a, b, atol=2e-6 * scale)
