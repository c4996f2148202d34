"""Mixed-topology batching (SURVEY §7 build-plan item 8).

`MixedGraphBatch` buckets a heterogeneous corpus of contexts by structural
graph hash, compiles once per bucket, and renders each bucket as one
vmapped batch.  Oracle: every context rendered individually through
`start_rendering_sync` must match its batched lane.
"""

import numpy as np
import pytest

import webaudio_tpu as wa
from webaudio_tpu.parallel.batch import GraphBatch, MixedGraphBatch

FS = 48000.0
N = 4 * 1024


def _osc_ctx(freq, ramp_to):
    ctx = wa.OfflineAudioContext(1, N, FS)
    o = ctx.create_oscillator(frequency=freq)
    g = ctx.create_gain(gain=0.0)
    g.gain.linear_ramp_to_value_at_time(ramp_to, N / FS)
    o.connect(g)
    g.connect(ctx.destination)
    o.start()
    return ctx


def _filter_ctx(f0, f1):
    ctx = wa.OfflineAudioContext(1, N, FS)
    o = ctx.create_oscillator(type="sawtooth", frequency=110.0)
    f = ctx.create_biquad_filter(type="lowpass", q=2.0)
    f.frequency.set_value_at_time(f0, 0.0)
    f.frequency.exponential_ramp_to_value_at_time(f1, N / FS)
    o.connect(f)
    f.connect(ctx.destination)
    o.start()
    return ctx


def _delay_ctx(dt):
    ctx = wa.OfflineAudioContext(2, N, FS)
    src = ctx.create_constant_source(offset=1.0)
    src.start()
    src.stop(0.002)
    d = ctx.create_delay(max_delay_time=0.05)
    d.delay_time.value = dt
    d.delay_time.set_value_at_time(dt, 0.0)  # dense row for bucketing
    src.connect(d)
    d.connect(ctx.destination)
    src.connect(ctx.destination)
    return ctx


def test_three_topologies_one_call():
    # 2x osc+gain (same topology, different automation), 2x filter sweep,
    # 1x delay graph — three buckets, five instances, one call
    def corpus():
        return [
            _osc_ctx(220.0, 1.0),
            _filter_ctx(200.0, 8000.0),
            _delay_ctx(0.01),
            _osc_ctx(220.0, 0.5),   # same constants, different dense ramp
            _filter_ctx(500.0, 2000.0),
        ]

    ctxs = corpus()
    refs = corpus()

    mb = GraphBatch.from_contexts(ctxs)
    assert isinstance(mb, MixedGraphBatch)
    assert mb.num_buckets == 3
    outs = mb.render()
    assert len(outs) == 5
    for i, (out, ref_ctx) in enumerate(zip(outs, refs)):
        ref = ref_ctx.start_rendering_sync().to_array()
        assert out.shape == ref.shape, i
        np.testing.assert_allclose(out, ref, atol=2e-5,
                                   err_msg=f"context {i}")
    # lanes in the same bucket must differ (different automation)
    assert np.abs(outs[0] - outs[3]).max() > 1e-3
    assert np.abs(outs[1] - outs[4]).max() > 1e-3


def test_baked_constant_split():
    # identical structure but a different CONSTANT param value must land
    # in different buckets (constants are baked into the closure)
    a = wa.OfflineAudioContext(1, N, FS)
    oa = a.create_oscillator(frequency=220.0)
    oa.connect(a.destination)
    oa.start()
    b = wa.OfflineAudioContext(1, N, FS)
    ob = b.create_oscillator(frequency=330.0)
    ob.connect(b.destination)
    ob.start()
    mb = MixedGraphBatch([a, b])
    assert mb.num_buckets == 2
    outs = mb.render()
    ra = _single(lambda c: c.create_oscillator(frequency=220.0))
    rb = _single(lambda c: c.create_oscillator(frequency=330.0))
    np.testing.assert_allclose(outs[0], ra, atol=2e-5)
    np.testing.assert_allclose(outs[1], rb, atol=2e-5)


def _single(make_src):
    ctx = wa.OfflineAudioContext(1, N, FS)
    src = make_src(ctx)
    src.connect(ctx.destination)
    src.start()
    return ctx.start_rendering_sync().to_array()


def test_per_instance_buffers_share_one_compile():
    # same topology, different audio buffers (same shape): one bucket,
    # buffer contents stacked per instance through the resource path
    def make(seed):
        rng = np.random.default_rng(seed)
        ctx = wa.OfflineAudioContext(1, N, FS)
        buf = ctx.create_buffer(1, 2048, FS)
        buf.copy_to_channel(
            rng.standard_normal(2048).astype(np.float32) * 0.5, 0)
        src = ctx.create_buffer_source(loop=True)
        src.buffer = buf
        src.start()
        g = ctx.create_gain(gain=0.0)
        g.gain.linear_ramp_to_value_at_time(1.0, N / FS)
        src.connect(g)
        g.connect(ctx.destination)
        return ctx

    ctxs = [make(s) for s in (1, 2, 3)]
    refs = [make(s).start_rendering_sync().to_array() for s in (1, 2, 3)]
    mb = MixedGraphBatch(ctxs)
    assert mb.num_buckets == 1
    outs = mb.render()
    for i in range(3):
        np.testing.assert_allclose(outs[i], refs[i], atol=2e-5,
                                   err_msg=f"instance {i}")


def test_mixed_lengths_bucket_apart():
    a = _osc_ctx(220.0, 1.0)
    c = wa.OfflineAudioContext(1, 2 * N, FS)
    o = c.create_oscillator(frequency=220.0)
    g = c.create_gain(gain=0.0)
    g.gain.linear_ramp_to_value_at_time(1.0, 2 * N / FS)
    o.connect(g)
    g.connect(c.destination)
    o.start()
    mb = MixedGraphBatch([a, c])
    assert mb.num_buckets == 2
    outs = mb.render()
    assert outs[0].shape == (1, N)
    assert outs[1].shape == (1, 2 * N)


def test_sharded_buckets_on_mesh():
    # buckets whose size divides the mesh shard; odd buckets fall back to
    # unsharded rendering — outputs identical either way
    import jax
    from jax.sharding import Mesh

    devs = np.array(jax.devices()[:4])
    if len(devs) < 4:
        pytest.skip("needs 4 virtual devices")
    mesh = Mesh(devs, ("graphs",))
    # one bucket of 4 (same constants, per-instance dense ramps) -> sharded;
    # plus a bucket of 1 -> falls back to unsharded
    ctxs = [_osc_ctx(220.0, 0.25 * (i + 1)) for i in range(4)]
    ctxs.append(_filter_ctx(300.0, 3000.0))
    mb = MixedGraphBatch(ctxs, mesh=mesh)
    assert mb.num_buckets == 2
    outs = mb.render()
    ref = _osc_ctx(220.0, 0.25).start_rendering_sync().to_array()
    np.testing.assert_allclose(outs[0], ref, atol=2e-5)


def test_cyclic_same_block_different_lengths_bucket_apart():
    # advisor round-3 repro: a delay-feedback graph's block size is bounded
    # by the delay, so 2 s and 4 s renders both pick the same block —
    # without the length in the fingerprint they bucketed together and the
    # longer context silently came back truncated to the leader's length
    def make(n):
        ctx = wa.OfflineAudioContext(1, n, FS)
        src = ctx.create_constant_source(offset=1.0)
        src.start()
        src.stop(0.002)
        d = ctx.create_delay(max_delay_time=0.05)
        d.delay_time.value = 0.008
        g = ctx.create_gain(gain=0.5)
        src.connect(d)
        d.connect(g)
        g.connect(d)      # feedback cycle: delay bounds the block
        g.connect(ctx.destination)
        return ctx

    a, b = make(96000), make(192000)
    mb = MixedGraphBatch([a, b])
    outs = mb.render()
    assert outs[0].shape == (1, 96000)
    assert outs[1].shape == (1, 192000)
    ra = make(96000).start_rendering_sync().to_array()
    rb = make(192000).start_rendering_sync().to_array()
    np.testing.assert_allclose(outs[0], ra, atol=2e-5)
    np.testing.assert_allclose(outs[1], rb, atol=2e-5)


def test_fused_banks_with_different_offsets_render_their_own_audio(
        monkeypatch):
    # advisor round-3 repro: 33 fused buffer sources sharing ONE
    # AudioBuffer, per-voice start offsets differing between two contexts.
    # The offsets used to be baked into the leader's trace as constants, so
    # the second context returned the leader's audio.
    monkeypatch.setenv("WEBAUDIO_FUSE_THRESHOLD", "32")
    rng = np.random.default_rng(7)
    data = (rng.standard_normal(8192) * 0.3).astype(np.float32)
    n = 2048

    def make(offset_step):
        ctx = wa.OfflineAudioContext(1, n, FS)
        buf = ctx.create_buffer(1, 8192, FS)
        buf.copy_to_channel(data, 0)
        for i in range(33):
            src = ctx.create_buffer_source()
            src.buffer = buf
            src.connect(ctx.destination)
            src.start(0.0, offset=i * offset_step)
        return ctx

    a, b = make(0.001), make(0.003)
    ra = make(0.001).start_rendering_sync().to_array()
    rb = make(0.003).start_rendering_sync().to_array()
    assert np.max(np.abs(ra - rb)) > 1e-3  # genuinely different programs
    mb = MixedGraphBatch([a, b])
    outs = mb.render()
    np.testing.assert_allclose(outs[0], ra, atol=2e-5)
    np.testing.assert_allclose(outs[1], rb, atol=2e-5)


def test_worklet_processor_options_do_not_bleed_across_lanes():
    # advisor round-3: same worklet class, different processor_options ->
    # either different buckets or per-member states; each lane must render
    # with its own options
    from webaudio_tpu.worklet import AudioWorkletProcessor

    class ScaleProcessor(AudioWorkletProcessor):
        def __init__(self, options=None, port=None):
            self.scale = float((options or {}).get("scale", 1.0))

        @staticmethod
        def parameter_descriptors():
            return []

        def init_state(self, rc):
            return {}

        def process(self, scope, state, inputs, params):
            import jax.numpy as jnp

            x = inputs[0] if inputs else jnp.zeros((1, scope.frames))
            return state, [x * self.scale]

    def make(scale):
        ctx = wa.OfflineAudioContext(1, N, FS)
        src = ctx.create_constant_source(offset=1.0)
        src.start()
        w = wa.AudioWorkletNode(ctx, ScaleProcessor,
                                processor_options={"scale": scale})
        src.connect(w)
        w.connect(ctx.destination)
        return ctx

    a, b = make(0.25), make(0.75)
    mb = MixedGraphBatch([a, b])
    outs = mb.render()
    np.testing.assert_allclose(np.median(outs[0]), 0.25, atol=1e-6)
    np.testing.assert_allclose(np.median(outs[1]), 0.75, atol=1e-6)
