"""Automatic source-chain fusion (graph/fusion.py): fused output must match
the unfused graph bit-near-exactly across subframe variants, and the
surrounding machinery (GraphBatch param override, checkpoints) must keep
working on fused topologies."""

import os

import numpy as np
import pytest


def _build(n_osc=48, seconds=0.25, dense_freq=False, typ="sawtooth",
           chain=True, fs=48000.0):
    from webaudio_tpu import OfflineAudioContext

    ctx = OfflineAudioContext(2, int(fs * seconds), fs)
    rng = np.random.RandomState(42)
    mix = ctx.create_gain(gain=1.0 / n_osc)
    mix.connect(ctx.destination)
    for i in range(n_osc):
        o = ctx.create_oscillator(type=typ,
                                  frequency=float(80 + rng.rand() * 2000),
                                  detune=float(rng.randn() * 15))
        if dense_freq and i % 3 == 0:
            o.frequency.linear_ramp_to_value_at_time(float(200 + i), 0.2)
        t0 = float(rng.rand() * 0.1)
        if chain:
            env = ctx.create_gain(gain=0.0)
            env.gain.set_value_at_time(0.0, t0)
            env.gain.linear_ramp_to_value_at_time(1.0, t0 + 0.02)
            env.gain.set_target_at_time(0.6, t0 + 0.02, 0.05)
            o.connect(env)
            env.connect(mix)
        else:
            o.connect(mix)
        o.start(t0)
        if i % 7 == 0:
            o.stop(t0 + 0.15)
    return ctx


def _render(threshold, **kwargs):
    old = os.environ.get("WEBAUDIO_FUSE_THRESHOLD")
    os.environ["WEBAUDIO_FUSE_THRESHOLD"] = str(threshold)
    try:
        return _build(**kwargs).start_rendering_sync().to_array()
    finally:
        if old is None:
            os.environ.pop("WEBAUDIO_FUSE_THRESHOLD", None)
        else:
            os.environ["WEBAUDIO_FUSE_THRESHOLD"] = old


@pytest.mark.parametrize("kwargs", [
    dict(),                                   # const-freq chains (closed form)
    dict(dense_freq=True),                    # automated freqs (cumsum path)
    dict(typ="square", chain=False),          # plain bank, no gain stage
    dict(typ="sine"),
])
def test_fused_matches_unfused(kwargs):
    ref = _render(0, **kwargs)
    fused = _render(8, **kwargs)
    scale = max(float(np.abs(ref).max()), 1e-9)
    np.testing.assert_allclose(fused, ref, atol=2e-5 * scale)


def test_fusion_actually_fuses():
    from webaudio_tpu.graph import compiler as C

    os.environ["WEBAUDIO_FUSE_THRESHOLD"] = "8"
    try:
        ctx = _build(n_osc=24)
        cg = C.compile_graph(dict(ctx._nodes), list(ctx._edges),
                             ctx.sample_rate, ctx.length,
                             ctx._destination.node_id)
    finally:
        os.environ.pop("WEBAUDIO_FUSE_THRESHOLD", None)
    # dest + mix + one fused bank
    assert len(cg.kernels) == 3
    assert any(nid < 0 for nid in cg.kernels)
    assert len(cg.param_alias) == 24 * 3


def test_graph_batch_override_param_through_fusion():
    """override_param on a fused-away envelope gain remaps to the fused
    node's packed row via cg.param_alias."""
    from webaudio_tpu import OfflineAudioContext
    from webaudio_tpu.parallel.batch import GraphBatch

    fs = 48000.0
    n = 2048
    os.environ["WEBAUDIO_FUSE_THRESHOLD"] = "8"
    try:
        ctx = OfflineAudioContext(1, n, fs)
        mix = ctx.create_gain(gain=1.0)
        mix.connect(ctx.destination)
        envs = []
        for i in range(8):
            o = ctx.create_oscillator(frequency=440.0)
            env = ctx.create_gain(gain=0.0)
            env.gain.set_value_at_time(0.001 * (i + 1), 0.0)
            env.gain.linear_ramp_to_value_at_time(0.001 * (i + 1), 1.0)  # dense
            o.connect(env)
            env.connect(mix)
            o.start()
            envs.append(env)
        batch = 3
        gb = GraphBatch(ctx, batch=batch)
        # instance b mutes everything except env 0, with gain b+1
        dense = np.zeros((batch, n), np.float32)
        for b in range(batch):
            dense[b] = float(b + 1)
        gb.override_param(envs[0], "gain", dense)
        for env in envs[1:]:
            gb.override_param(env, "gain",
                              np.zeros((batch, n), np.float32))
        out = np.asarray(gb.render())[:, :, :n]
        # each instance = sine * (b+1); ratios between instances exact
        ref = out[0]
        for b in range(1, batch):
            np.testing.assert_allclose(out[b], ref * (b + 1), atol=1e-5)
    finally:
        os.environ.pop("WEBAUDIO_FUSE_THRESHOLD", None)


def test_checkpoint_with_fused_graph():
    from webaudio_tpu.checkpoint import RenderSession
    import tempfile

    os.environ["WEBAUDIO_FUSE_THRESHOLD"] = "8"
    try:
        seconds = 12288 / 48000.0  # 24 x 512-frame blocks exactly
        one = _build(n_osc=16, seconds=seconds).start_rendering_sync().to_array()
        sess = RenderSession(_build(n_osc=16, seconds=seconds),
                             quanta_per_block=4)
        a = np.asarray(sess.step(6144))
        with tempfile.TemporaryDirectory() as td:
            sess.save(td + "/ck.npz")
            sess2 = RenderSession(_build(n_osc=16, seconds=seconds),
                                  quanta_per_block=4)
            sess2.restore(td + "/ck.npz")
            b = np.asarray(sess2.step(6144))
        got = np.concatenate([a, b], axis=-1)
        scale = max(float(np.abs(one).max()), 1e-9)
        np.testing.assert_allclose(got, one, atol=2e-5 * scale)
    finally:
        os.environ.pop("WEBAUDIO_FUSE_THRESHOLD", None)


def test_online_context_with_fused_graph():
    """Live AudioContext streaming with a fused bank: per-chunk dense rows
    come from cg.param_objects (fused aliases are not in ctx._nodes)."""
    import time
    from webaudio_tpu import AudioContext

    os.environ["WEBAUDIO_FUSE_THRESHOLD"] = "8"
    try:
        captured = []
        ctx = AudioContext(sample_rate=48000.0,
                           sink_id=lambda chunk, ts: captured.append(
                               np.asarray(chunk)))
        ctx.set_realtime_pacing(False)
        mix = ctx.create_gain(gain=1.0 / 8)
        mix.connect(ctx.destination)
        for i in range(8):
            o = ctx.create_oscillator(frequency=220.0 * (i + 1) / 4)
            env = ctx.create_gain(gain=0.0)
            env.gain.set_value_at_time(1.0, 0.0)
            env.gain.linear_ramp_to_value_at_time(0.5, 2.0)  # dense row
            o.connect(env)
            env.connect(mix)
            o.start()
        deadline = time.time() + 20.0
        while sum(c.shape[-1] for c in captured) < 24000 and \
                time.time() < deadline:
            time.sleep(0.05)
        ctx.close_sync()
        out = np.concatenate(captured, axis=-1)
        assert out.shape[-1] >= 24000
        # envelopes are live: audible, not silent (the silent-zero failure
        # mode this guards against), amplitude in a sane range
        rms = float(np.sqrt((out[..., 2048:24000] ** 2).mean()))
        assert 0.1 < rms < 1.5, rms
    finally:
        os.environ.pop("WEBAUDIO_FUSE_THRESHOLD", None)


def test_fused_custom_wave_and_constant_sources():
    """Custom PeriodicWave oscillators fuse with stacked per-voice tables;
    constant-source chains fuse as offset x gain banks."""
    from webaudio_tpu import OfflineAudioContext

    def build():
        fs = 48000.0
        ctx = OfflineAudioContext(1, 4096, fs)
        mix = ctx.create_gain(gain=0.05)
        mix.connect(ctx.destination)
        rng = np.random.RandomState(5)
        for i in range(10):
            pw = ctx.create_periodic_wave(
                real=np.array([0, 1, 0.5 * (i + 1) / 10], np.float32),
                imag=np.array([0, 0.3, 0.1 * i], np.float32))
            o = ctx.create_oscillator(frequency=float(100 + 60 * i))
            o.set_periodic_wave(pw)
            o.connect(mix)
            o.start(float(rng.rand() * 0.01))
        for i in range(10):
            c = ctx.create_constant_source(offset=0.1 * (i + 1))
            env = ctx.create_gain(gain=0.0)
            env.gain.set_value_at_time(0.0, 0.0)
            env.gain.linear_ramp_to_value_at_time(0.02 * (i + 1), 0.05)
            c.connect(env)
            env.connect(mix)
            c.start(float(i) * 0.002)
            c.stop(0.06 + float(i) * 0.002)
        return ctx

    os.environ["WEBAUDIO_FUSE_THRESHOLD"] = "0"
    ref = build().start_rendering_sync().to_array()
    os.environ["WEBAUDIO_FUSE_THRESHOLD"] = "8"
    try:
        fused = build().start_rendering_sync().to_array()
        from webaudio_tpu.graph import compiler as C
        ctx = build()
        cg = C.compile_graph(dict(ctx._nodes), list(ctx._edges),
                             ctx.sample_rate, ctx.length,
                             ctx._destination.node_id)
        # dest + mix + 2 fused banks (custom oscs, const sources)
        assert len(cg.kernels) == 4, len(cg.kernels)
    finally:
        os.environ.pop("WEBAUDIO_FUSE_THRESHOLD", None)
    scale = max(float(np.abs(ref).max()), 1e-9)
    np.testing.assert_allclose(fused, ref, atol=2e-5 * scale)


@pytest.mark.parametrize("seed", range(10))
def test_fusion_random_topologies(seed):
    """Random graph soups: fusion (threshold 2, aggressive) must never
    change the rendered output, whatever the topology — chains sharing
    gains, fan-outs, param connections, mixed types, stopped voices."""
    from webaudio_tpu import OfflineAudioContext

    def build(threshold):
        os.environ["WEBAUDIO_FUSE_THRESHOLD"] = str(threshold)
        rng = np.random.RandomState(seed)
        fs = 48000.0
        ctx = OfflineAudioContext(1, 2048, fs)
        mixes = [ctx.create_gain(gain=0.1) for _ in range(3)]
        for m in mixes:
            m.connect(ctx.destination)
        oscs = []
        for i in range(rng.randint(4, 14)):
            kind = rng.randint(0, 3)
            if kind == 0:
                o = ctx.create_oscillator(
                    type=["sine", "square", "sawtooth"][rng.randint(3)],
                    frequency=float(100 + rng.rand() * 1000))
            elif kind == 1:
                o = ctx.create_constant_source(offset=float(rng.randn()))
            else:
                o = ctx.create_oscillator(frequency=float(200 + i))
            oscs.append(o)
            shape = rng.randint(0, 6)
            if shape == 0:          # direct to one mix
                o.connect(mixes[rng.randint(3)])
            elif shape == 1:        # chain through own gain
                g = ctx.create_gain(gain=float(rng.rand()))
                if rng.rand() < 0.5:
                    g.gain.linear_ramp_to_value_at_time(0.2, 0.04)
                o.connect(g)
                g.connect(mixes[rng.randint(3)])
            elif shape == 2:        # fan-out to two mixes
                o.connect(mixes[0])
                o.connect(mixes[1])
            elif shape == 4:        # subtractive chain through a filter
                f = ctx.create_biquad_filter(
                    frequency=float(300 + rng.rand() * 3000),
                    q=float(0.5 + rng.rand() * 6))
                g = ctx.create_gain(gain=float(rng.rand()))
                o.connect(f)
                f.connect(g)
                g.connect(mixes[rng.randint(3)])
            elif shape == 5:        # drive -> pan spread chain
                ws = ctx.create_wave_shaper()
                ws.set_curve(np.tanh(np.linspace(
                    -2, 2, [64, 256][rng.randint(2)])).astype(np.float32))
                p = ctx.create_stereo_panner(
                    pan=float(rng.uniform(-1, 1)))
                o.connect(ws)
                ws.connect(p)
                p.connect(mixes[rng.randint(3)])
            else:                   # gain modulates a mix's gain param
                g = ctx.create_gain(gain=0.2)
                o.connect(g)
                g.connect(mixes[2].params["gain"])
            t0 = float(rng.rand() * 0.01)
            o.start(t0)
            if rng.rand() < 0.3:
                o.stop(t0 + float(rng.rand() * 0.03))
        return ctx

    try:
        ref = build(0).start_rendering_sync().to_array()
        fused = build(2).start_rendering_sync().to_array()
    finally:
        os.environ.pop("WEBAUDIO_FUSE_THRESHOLD", None)
    scale = max(float(np.abs(ref).max()), 1e-9)
    np.testing.assert_allclose(fused, ref, atol=3e-5 * scale,
                               err_msg=f"fusion changed output (seed {seed})")


def test_fused_buffer_source_grains():
    """Granular synthesis: many non-looping grains of one sample buffer,
    each through its own envelope, fuse into one bank — exact vs unfused."""
    from webaudio_tpu import OfflineAudioContext

    def build():
        fs = 44100.0
        ctx = OfflineAudioContext(2, int(fs * 0.8), fs)
        rng = np.random.RandomState(11)
        sample = ctx.create_buffer(2, 8000, 22050.0)  # needs resample-rate
        for c in range(2):
            sample.copy_to_channel(
                (rng.randn(8000) * 0.2).astype(np.float32), c)
        for i in range(20):
            when = i * 0.03
            src = ctx.create_buffer_source(
                playback_rate=float(0.8 + 0.02 * i),
                detune=float((i - 10) * 5))
            src.buffer = sample
            env = ctx.create_gain(gain=0.0)
            env.gain.set_value_at_time(0.0, when)
            env.gain.linear_ramp_to_value_at_time(0.4, when + 0.04)
            env.gain.linear_ramp_to_value_at_time(0.0, when + 0.09)
            src.connect(env)
            env.connect(ctx.destination)
            src.start(when, float(0.05 + 0.01 * i), 0.09)
        return ctx

    os.environ["WEBAUDIO_FUSE_THRESHOLD"] = "0"
    ref = build().start_rendering_sync().to_array()
    os.environ["WEBAUDIO_FUSE_THRESHOLD"] = "8"
    try:
        fused = build().start_rendering_sync().to_array()
        from webaudio_tpu.graph import compiler as C
        ctx = build()
        cg = C.compile_graph(dict(ctx._nodes), list(ctx._edges),
                             ctx.sample_rate, ctx.length,
                             ctx._destination.node_id)
        assert len(cg.kernels) == 2  # dest + grain bank
    finally:
        os.environ.pop("WEBAUDIO_FUSE_THRESHOLD", None)
    scale = max(float(np.abs(ref).max()), 1e-9)
    np.testing.assert_allclose(fused, ref, atol=2e-5 * scale)


def test_looping_or_automated_buffer_sources_not_fused():
    from webaudio_tpu import OfflineAudioContext
    from webaudio_tpu.graph import compiler as C

    os.environ["WEBAUDIO_FUSE_THRESHOLD"] = "4"
    try:
        fs = 48000.0
        ctx = OfflineAudioContext(1, 2048, fs)
        sample = ctx.create_buffer(1, 1000, fs)
        sample.copy_to_channel(np.ones(1000, np.float32), 0)
        for i in range(6):
            src = ctx.create_buffer_source(loop=(i % 2 == 0))
            src.buffer = sample
            if i % 2 == 1:
                src.playback_rate.linear_ramp_to_value_at_time(2.0, 0.02)
            src.connect(ctx.destination)
            src.start()
        cg = C.compile_graph(dict(ctx._nodes), list(ctx._edges),
                             ctx.sample_rate, ctx.length,
                             ctx._destination.node_id)
        # nothing fusable: loops and automated rates are excluded
        assert not any(nid < 0 for nid in cg.kernels)
    finally:
        os.environ.pop("WEBAUDIO_FUSE_THRESHOLD", None)


def test_explicit_channel_gain_not_fused():
    """A gain with an explicit channel count up-mixes inside the chain
    and must not fuse (channel propagation would change)."""
    from webaudio_tpu import OfflineAudioContext
    from webaudio_tpu.graph import compiler as C

    os.environ["WEBAUDIO_FUSE_THRESHOLD"] = "4"
    try:
        def build():
            ctx = OfflineAudioContext(2, 1024, 48000.0)
            for i in range(6):
                o = ctx.create_oscillator(frequency=200.0 + i)
                g = ctx.create_gain(gain=0.1)
                g.channel_count = 2
                g.channel_count_mode = "explicit"
                o.connect(g)
                g.connect(ctx.destination)
                o.start()
            return ctx
        ctx = build()
        cg = C.compile_graph(dict(ctx._nodes), list(ctx._edges),
                             ctx.sample_rate, ctx.length,
                             ctx._destination.node_id)
        # the chains must NOT fuse through the explicit gains; the bare
        # oscillators may fuse as a direct group targeting the gains —
        # what matters is every gain kernel survives
        from webaudio_tpu.nodes.gain import GainNode
        gain_ids = [nid for nid, n in ctx._nodes.items()
                    if isinstance(n, GainNode)]
        assert all(g in cg.kernels for g in gain_ids)
        out_f = build().start_rendering_sync().to_array()
        os.environ["WEBAUDIO_FUSE_THRESHOLD"] = "0"
        out_u = build().start_rendering_sync().to_array()
        np.testing.assert_allclose(out_f, out_u, atol=1e-6)
    finally:
        os.environ.pop("WEBAUDIO_FUSE_THRESHOLD", None)


def test_fused_subtractive_synth_chains():
    """osc -> biquad(const coefs) -> gain envelope -> mix chains fuse into
    one bank with a per-voice partitioned-convolution filter stage."""
    from webaudio_tpu import OfflineAudioContext
    from webaudio_tpu.graph import compiler as C

    def build():
        fs = 48000.0
        ctx = OfflineAudioContext(1, int(fs * 0.4), fs)
        rng = np.random.RandomState(3)
        mix = ctx.create_gain(gain=1.0 / 12)
        mix.connect(ctx.destination)
        for i in range(12):
            o = ctx.create_oscillator(type="sawtooth",
                                      frequency=float(80 + 50 * i))
            f = ctx.create_biquad_filter(
                type=["lowpass", "bandpass", "highpass"][i % 3],
                frequency=float(400 + 200 * i), q=float(1 + i % 5))
            env = ctx.create_gain(gain=0.0)
            t0 = i * 0.02
            env.gain.set_value_at_time(0.0, t0)
            env.gain.linear_ramp_to_value_at_time(1.0, t0 + 0.03)
            o.connect(f)
            f.connect(env)
            env.connect(mix)
            o.start(t0)
        return ctx

    os.environ["WEBAUDIO_FUSE_THRESHOLD"] = "0"
    ref = build().start_rendering_sync().to_array()
    os.environ["WEBAUDIO_FUSE_THRESHOLD"] = "8"
    try:
        fused = build().start_rendering_sync().to_array()
        ctx = build()
        cg = C.compile_graph(dict(ctx._nodes), list(ctx._edges),
                             ctx.sample_rate, ctx.length,
                             ctx._destination.node_id)
        assert len(cg.kernels) == 3  # dest + mix + fused bank
    finally:
        os.environ.pop("WEBAUDIO_FUSE_THRESHOLD", None)
    scale = max(float(np.abs(ref).max()), 1e-9)
    np.testing.assert_allclose(fused, ref, atol=2e-5 * scale)


def test_automated_filter_chain_not_fused():
    from webaudio_tpu import OfflineAudioContext
    from webaudio_tpu.graph import compiler as C

    os.environ["WEBAUDIO_FUSE_THRESHOLD"] = "4"
    try:
        ctx = OfflineAudioContext(1, 1024, 48000.0)
        for i in range(6):
            o = ctx.create_oscillator(frequency=300.0 + i)
            f = ctx.create_biquad_filter(frequency=1000.0)
            f.frequency.linear_ramp_to_value_at_time(4000.0, 0.02)
            o.connect(f)
            f.connect(ctx.destination)
            o.start()
        cg = C.compile_graph(dict(ctx._nodes), list(ctx._edges),
                             ctx.sample_rate, ctx.length,
                             ctx._destination.node_id)
        # the filters stay standalone; the oscillators can't fuse either
        # (each targets a different filter)
        from webaudio_tpu.nodes.biquad_filter import BiquadFilterNode
        fids = [nid for nid, n in ctx._nodes.items()
                if isinstance(n, BiquadFilterNode)]
        assert all(f in cg.kernels for f in fids)
    finally:
        os.environ.pop("WEBAUDIO_FUSE_THRESHOLD", None)


def test_fused_panned_voice_spread():
    """osc -> gain -> stereo panner (const pan) chains fuse with per-voice
    equal-power spread into a (2, B) bank output."""
    from webaudio_tpu import OfflineAudioContext
    from webaudio_tpu.graph import compiler as C

    def build():
        fs = 48000.0
        ctx = OfflineAudioContext(2, 2048, fs)
        rng = np.random.RandomState(4)
        for i in range(10):
            o = ctx.create_oscillator(frequency=float(220 + 30 * i))
            env = ctx.create_gain(gain=float(0.05 + 0.01 * i))
            p = ctx.create_stereo_panner(pan=float(-1 + 2 * i / 9))
            o.connect(env)
            env.connect(p)
            p.connect(ctx.destination)
            o.start(float(rng.rand() * 0.005))
        return ctx

    os.environ["WEBAUDIO_FUSE_THRESHOLD"] = "0"
    ref = build().start_rendering_sync().to_array()
    os.environ["WEBAUDIO_FUSE_THRESHOLD"] = "8"
    try:
        fused = build().start_rendering_sync().to_array()
        ctx = build()
        cg = C.compile_graph(dict(ctx._nodes), list(ctx._edges),
                             ctx.sample_rate, ctx.length,
                             ctx._destination.node_id)
        assert len(cg.kernels) == 2  # dest + fused spread bank
    finally:
        os.environ.pop("WEBAUDIO_FUSE_THRESHOLD", None)
    scale = max(float(np.abs(ref).max()), 1e-9)
    np.testing.assert_allclose(fused, ref, atol=2e-5 * scale)
    # spread is real: channels differ
    assert float(np.abs(fused[0] - fused[1]).max()) > 0.01


def test_fused_waveshaper_voices():
    """osc -> waveshaper (no oversample) -> gain chains fuse with stacked
    per-voice curves."""
    from webaudio_tpu import OfflineAudioContext
    from webaudio_tpu.graph import compiler as C

    def build():
        fs = 48000.0
        ctx = OfflineAudioContext(1, 2048, fs)
        mix = ctx.create_gain(gain=0.1)
        mix.connect(ctx.destination)
        for i in range(8):
            o = ctx.create_oscillator(frequency=float(200 + 40 * i))
            ws = ctx.create_wave_shaper()
            drive = 1.0 + i
            ws.set_curve(np.tanh(
                np.linspace(-drive, drive, 128)).astype(np.float32))
            g = ctx.create_gain(gain=0.2)
            o.connect(ws)
            ws.connect(g)
            g.connect(mix)
            o.start()
        return ctx

    os.environ["WEBAUDIO_FUSE_THRESHOLD"] = "0"
    ref = build().start_rendering_sync().to_array()
    os.environ["WEBAUDIO_FUSE_THRESHOLD"] = "4"
    try:
        fused = build().start_rendering_sync().to_array()
        ctx = build()
        cg = C.compile_graph(dict(ctx._nodes), list(ctx._edges),
                             ctx.sample_rate, ctx.length,
                             ctx._destination.node_id)
        assert len(cg.kernels) == 3  # dest + mix + fused bank
    finally:
        os.environ.pop("WEBAUDIO_FUSE_THRESHOLD", None)
    scale = max(float(np.abs(ref).max()), 1e-9)
    np.testing.assert_allclose(fused, ref, atol=2e-5 * scale)


def test_oversampled_waveshaper_not_fused():
    from webaudio_tpu import OfflineAudioContext
    from webaudio_tpu.graph import compiler as C
    from webaudio_tpu.nodes.waveshaper import WaveShaperNode

    os.environ["WEBAUDIO_FUSE_THRESHOLD"] = "4"
    try:
        ctx = OfflineAudioContext(1, 1024, 48000.0)
        for i in range(6):
            o = ctx.create_oscillator(frequency=440.0 + i)
            ws = ctx.create_wave_shaper(oversample="4x")
            ws.set_curve(np.tanh(np.linspace(-2, 2, 64)).astype(np.float32))
            o.connect(ws)
            ws.connect(ctx.destination)
            o.start()
        cg = C.compile_graph(dict(ctx._nodes), list(ctx._edges),
                             ctx.sample_rate, ctx.length,
                             ctx._destination.node_id)
        ws_ids = [nid for nid, n in ctx._nodes.items()
                  if isinstance(n, WaveShaperNode)]
        assert all(w in cg.kernels for w in ws_ids)
    finally:
        os.environ.pop("WEBAUDIO_FUSE_THRESHOLD", None)


def test_fused_filter_bank_time_sharded():
    """ADVICE r1 (high): a fused bank with a biquad stage carries
    (kparts+1)*partition frames of FDL history; tail_frames()==0 gave
    time-sharded renders cold filter state at shard boundaries."""
    from webaudio_tpu import OfflineAudioContext
    from webaudio_tpu.parallel.segments import render_time_sharded

    def build():
        fs = 48000.0
        ctx = OfflineAudioContext(1, int(fs * 1.0), fs)
        mix = ctx.create_gain(gain=1.0 / 40)
        mix.connect(ctx.destination)
        for i in range(40):
            o = ctx.create_oscillator(type="sawtooth",
                                      frequency=float(80 + 37 * i))
            f = ctx.create_biquad_filter(
                type="lowpass", frequency=float(500 + 150 * i),
                q=float(1 + i % 4))
            g = ctx.create_gain(gain=0.8)
            o.connect(f)
            f.connect(g)
            g.connect(mix)
            o.start()
        return ctx

    os.environ["WEBAUDIO_FUSE_THRESHOLD"] = "8"
    try:
        from webaudio_tpu.graph import compiler as C
        ctx = build()
        cg = C.compile_graph(dict(ctx._nodes), list(ctx._edges),
                             ctx.sample_rate, ctx.length,
                             ctx._destination.node_id)
        assert len(cg.kernels) == 3  # dest + mix + fused bank
        seq = build().start_rendering_sync().to_array()
        sharded = render_time_sharded(build())
    finally:
        os.environ.pop("WEBAUDIO_FUSE_THRESHOLD", None)
    scale = max(float(np.abs(seq).max()), 1e-9)
    np.testing.assert_allclose(sharded, seq, atol=5e-5 * scale)


def test_explicit_channel_panner_not_fused():
    """ADVICE r1 (medium): a stereo panner with channel_count_mode
    'explicit' and count 2 up-mixes the mono chain and takes the stereo
    pan path; it must not fuse into the mono equal-power bank."""
    from webaudio_tpu import OfflineAudioContext
    from webaudio_tpu.graph import compiler as C
    from webaudio_tpu.nodes.stereo_panner import StereoPannerNode

    def build():
        ctx = OfflineAudioContext(2, 2048, 48000.0)
        for i in range(8):
            o = ctx.create_oscillator(frequency=float(200 + 25 * i))
            p = ctx.create_stereo_panner(pan=float(-1 + 2 * i / 7))
            p.channel_count = 2
            p.channel_count_mode = "explicit"
            o.connect(p)
            p.connect(ctx.destination)
            o.start()
        return ctx

    os.environ["WEBAUDIO_FUSE_THRESHOLD"] = "4"
    try:
        ctx = build()
        cg = C.compile_graph(dict(ctx._nodes), list(ctx._edges),
                             ctx.sample_rate, ctx.length,
                             ctx._destination.node_id)
        pids = [nid for nid, n in ctx._nodes.items()
                if isinstance(n, StereoPannerNode)]
        assert all(p in cg.kernels for p in pids)
        fused = build().start_rendering_sync().to_array()
        os.environ["WEBAUDIO_FUSE_THRESHOLD"] = "0"
        ref = build().start_rendering_sync().to_array()
    finally:
        os.environ.pop("WEBAUDIO_FUSE_THRESHOLD", None)
    scale = max(float(np.abs(ref).max()), 1e-9)
    np.testing.assert_allclose(fused, ref, atol=2e-5 * scale)


def test_grain_lane_packing_matches_vb_path():
    """Lane-packed grain rendering (K concurrency lanes instead of (V, B))
    must match the dense path: per-quantum grain resolution + rebased f32
    playheads reproduce the masked sum within f32 noise."""
    from webaudio_tpu import OfflineAudioContext
    from webaudio_tpu.graph import compiler as C

    fs = 44100.0

    def build():
        ctx = OfflineAudioContext(2, int(fs * 2.0), fs)
        n = 8000
        sample = ctx.create_buffer(1, n, fs)
        sample.copy_to_channel(
            (np.random.RandomState(0).randn(n) * 0.3).astype(np.float32), 0)
        rng = np.random.RandomState(5)
        for i in range(64):
            when = i * 1.8 / 64 + rng.rand() * 0.004
            src = ctx.create_buffer_source(
                playback_rate=float(0.8 + 0.4 * rng.rand()))
            src.buffer = sample
            env = ctx.create_gain(gain=0.0)
            env.gain.set_value_at_time(0.0, when)
            env.gain.linear_ramp_to_value_at_time(0.5, when + 0.01)
            env.gain.linear_ramp_to_value_at_time(0.0, when + 0.02)
            src.connect(env)
            env.connect(ctx.destination)
            src.start(when, float(rng.rand() * 0.1), 0.02)
        return ctx

    os.environ["WEBAUDIO_FUSE_THRESHOLD"] = "8"
    os.environ["WEBAUDIO_GRAIN_LANES"] = "1"
    try:
        ctx = build()
        cg = C.compile_graph(dict(ctx._nodes), list(ctx._edges),
                             ctx.sample_rate, ctx.length,
                             ctx._destination.node_id)
        kern = [k for k in cg.kernels.values()
                if type(k).__name__ == "_FusedVoicesKernel"][0]
        assert kern.use_lanes and kern.K < kern.V / 4
        lanes = build().start_rendering_sync().to_array()
        os.environ["WEBAUDIO_GRAIN_LANES"] = "0"
        dense = build().start_rendering_sync().to_array()
        os.environ["WEBAUDIO_FUSE_THRESHOLD"] = "0"
        unfused = build().start_rendering_sync().to_array()
    finally:
        os.environ.pop("WEBAUDIO_FUSE_THRESHOLD", None)
        os.environ.pop("WEBAUDIO_GRAIN_LANES", None)
    # the rebased f32 within-quantum playhead carries ~1e-5-sample jitter,
    # which on white-noise-like grains maps to ~1e-4-relative amplitude
    scale = max(float(np.abs(unfused).max()), 1e-9)
    np.testing.assert_allclose(lanes, dense, atol=1e-4 * scale)
    np.testing.assert_allclose(lanes, unfused, atol=1e-4 * scale)


def test_grain_window_read_matches_gather():
    """The windowed two-hot grain read (fusion._windowed_fetch) must match
    the pair-gather formulation to FMA-association tolerance (~1 ulp)."""
    import os

    fs, seconds = 44100.0, 1.0
    rng0 = np.random.RandomState(7)
    grains = [(i * (seconds - 0.2) / 40,
               0.3 + 0.5 * (i / 40) + rng0.rand() * 0.05,
               float(0.9 + 0.2 * rng0.rand())) for i in range(40)]

    def render(mode):
        from webaudio_tpu import OfflineAudioContext

        os.environ["WEBAUDIO_GRAIN_READ"] = mode
        try:
            ctx = OfflineAudioContext(2, int(fs * seconds), fs)
            sample = ctx.decode_audio_data_sync(
                "/root/reference/samples/sample.wav")
            for when, offset, rate in grains:
                src = ctx.create_buffer_source(playback_rate=rate)
                src.buffer = sample
                env = ctx.create_gain(gain=0.0)
                env.gain.set_value_at_time(0.0, when)
                env.gain.linear_ramp_to_value_at_time(0.4, when + 0.045)
                env.gain.linear_ramp_to_value_at_time(0.0, when + 0.09)
                src.connect(env)
                env.connect(ctx.destination)
                src.start(when, offset, 0.09)
            from webaudio_tpu.graph import compiler as C

            cg = C.compile_graph(dict(ctx._nodes), list(ctx._edges),
                                 ctx.sample_rate, ctx.length,
                                 ctx._destination.node_id)
            fused = [k for k in cg.kernels.values()
                     if type(k).__name__.startswith("_FusedVoices")]
            assert fused and fused[0].use_lanes
            active = fused[0].win_W
            return ctx.start_rendering_sync().to_array(), active
        finally:
            os.environ.pop("WEBAUDIO_GRAIN_READ", None)

    got_g, act_g = render("gather")
    assert act_g == 0
    for mode in ("window", "grouped"):
        got_w, act_w = render(mode)
        assert act_w > 0, mode  # path actually exercised
        assert np.abs(got_w).max() > 0.01
        np.testing.assert_allclose(got_w, got_g, atol=2e-6, err_msg=mode)
    # the Pallas packed select computes the same two f32 products per
    # sample (bit-exact at op level — test_grain_read), but in situ XLA
    # fuses the envelope multiply into the XLA select's reduce with FMA
    # contraction, so renders differ by ~1 ulp of association
    got_t, act_t = render("grouped_t")
    got_pl, act_pl = render("grouped_pl")
    assert act_t > 0 and act_pl > 0
    np.testing.assert_allclose(got_pl, got_t, atol=5e-7)


def test_compact_env_matches_dense_rows():
    """Grain-bank envelopes compile to compact analytic segment tables
    (fusion._build_compact_env); output must match the dense-row path to
    f32 rounding, and batching overrides of compacted envelopes raise."""
    import numpy as np

    def build(compact):
        from webaudio_tpu import OfflineAudioContext

        os.environ["WEBAUDIO_COMPACT_ENV"] = compact
        fs, seconds = 44100.0, 1.0
        ctx = OfflineAudioContext(2, int(fs * seconds), fs)
        sample = ctx.decode_audio_data_sync(
            "/root/reference/samples/sample.wav")
        rng = np.random.RandomState(4)
        for i in range(40):
            when = i * (seconds - 0.2) / 40
            src = ctx.create_buffer_source(
                playback_rate=float(0.9 + 0.2 * rng.rand()))
            src.buffer = sample
            env = ctx.create_gain(gain=0.0)
            env.gain.set_value_at_time(0.0, when)
            env.gain.linear_ramp_to_value_at_time(0.4, when + 0.045)
            env.gain.linear_ramp_to_value_at_time(0.0, when + 0.09)
            src.connect(env)
            env.connect(ctx.destination)
            src.start(when, 0.3 + 0.8 * (i / 40), 0.09)
        return ctx

    try:
        ctx = build("0")
        dense = ctx.start_rendering_sync().to_array()
        ctx = build("1")   # opt-in (default stays on the row-gather path)
        from webaudio_tpu.graph import compiler as C

        cg = C.compile_graph(dict(ctx._nodes), list(ctx._edges),
                             ctx.sample_rate, ctx.length,
                             ctx._destination.node_id)
        fused = [k for k in cg.kernels.values()
                 if type(k).__name__.startswith("_FusedVoices")]
        assert fused and fused[0].compact_env is not None
        compact = ctx.start_rendering_sync().to_array()
        assert np.abs(dense).max() > 0.01
        np.testing.assert_allclose(compact, dense, atol=2e-6)

        # overriding a compacted envelope raises with guidance
        from webaudio_tpu.parallel.batch import GraphBatch

        ctx2 = build("1")
        env0 = next(n for n in ctx2._nodes.values()
                    if type(n).__name__ == "GainNode")
        gb = GraphBatch(ctx2, batch=2)
        with pytest.raises(ValueError, match="WEBAUDIO_COMPACT_ENV"):
            gb.override_param(env0, "gain",
                              np.zeros((2, ctx2.length), np.float32))
    finally:
        os.environ.pop("WEBAUDIO_COMPACT_ENV", None)


def _grain_ctx(n_grains=48, seconds=1.0, seed=3, ramp=0.4):
    """A fused grain bank at lane-env density (short enveloped grains)."""
    from webaudio_tpu import OfflineAudioContext

    fs = 44100.0
    ctx = OfflineAudioContext(2, int(fs * seconds), fs)
    sample = ctx.decode_audio_data_sync(
        "/root/reference/samples/sample.wav")
    rng = np.random.RandomState(seed)
    for i in range(n_grains):
        when = i * (seconds - 0.2) / n_grains
        src = ctx.create_buffer_source(
            playback_rate=float(0.9 + 0.2 * rng.rand()))
        src.buffer = sample
        env = ctx.create_gain(gain=0.0)
        env.gain.set_value_at_time(0.0, when)
        env.gain.linear_ramp_to_value_at_time(ramp, when + 0.045)
        env.gain.linear_ramp_to_value_at_time(0.0, when + 0.09)
        src.connect(env)
        env.connect(ctx.destination)
        src.start(when, 0.3 + 0.8 * (i / n_grains), 0.09)
    return ctx


def test_lane_env_matches_voice_rows():
    """Per-lane spliced envelopes (_LaneEnvParam) must match the per-voice
    dense-row path exactly (grain spans within a lane are disjoint)."""
    try:
        os.environ["WEBAUDIO_GRAIN_LANES"] = "0"
        dense = _grain_ctx().start_rendering_sync().to_array()
    finally:
        os.environ.pop("WEBAUDIO_GRAIN_LANES", None)
    ctx = _grain_ctx()
    from webaudio_tpu.graph import compiler as C

    cg = C.compile_graph(dict(ctx._nodes), list(ctx._edges),
                         ctx.sample_rate, ctx.length,
                         ctx._destination.node_id)
    fused = [k for k in cg.kernels.values()
             if type(k).__name__.startswith("_FusedVoices")]
    assert fused and fused[0].lane_env and fused[0].use_lanes
    # K lane rows in xs, not V voice rows
    assert len(cg.dense_params) == fused[0].K
    got = ctx.start_rendering_sync().to_array()
    assert np.abs(dense).max() > 0.01
    np.testing.assert_allclose(got, dense, atol=2e-6)


def test_lane_env_checkpoint_resume(tmp_path):
    """RenderSession streams lane-env rows via compile_for_render with a
    mid-render start_frame; resumed output must match one-shot."""
    from webaudio_tpu.checkpoint import RenderSession

    full = _grain_ctx().start_rendering_sync().to_array()
    n = _grain_ctx().length

    ctx2 = _grain_ctx()
    s = RenderSession(ctx2, quanta_per_block=32)
    half = (n // 2) // 4096 * 4096
    first = s.step(half)
    ck = str(tmp_path / "lane.npz")
    s.save(ck)
    ctx3 = _grain_ctx()
    s2 = RenderSession(ctx3, quanta_per_block=32)
    s2.restore(ck)
    second = s2.step((n - half) // 4096 * 4096)
    got = np.concatenate([first, second], axis=1)
    np.testing.assert_allclose(got, full[:, :got.shape[1]], atol=5e-6)


def test_lane_env_mixed_batch_and_override_error():
    from webaudio_tpu.parallel.batch import GraphBatch, MixedGraphBatch

    a, b = _grain_ctx(seed=3), _grain_ctx(seed=3, ramp=0.7)
    ra = _grain_ctx(seed=3).start_rendering_sync().to_array()
    rb = _grain_ctx(seed=3, ramp=0.7).start_rendering_sync().to_array()
    mb = MixedGraphBatch([a, b])
    outs = mb.render()
    np.testing.assert_allclose(outs[0], ra, atol=2e-5)
    np.testing.assert_allclose(outs[1], rb, atol=2e-5)

    ctx = _grain_ctx()
    env0 = next(n_ for n_ in ctx._nodes.values()
                if type(n_).__name__ == "GainNode")
    gb = GraphBatch(ctx, batch=2)
    with pytest.raises(ValueError, match="WEBAUDIO_GRAIN_LANES"):
        gb.override_param(env0, "gain",
                          np.zeros((2, ctx.length), np.float32))
