"""Two-rate compiler: cycle subgraphs step at the delay-bounded rate
inside an inner scan while the acyclic majority runs large blocks.

The reference splits DelayNode into writer/reader vertices precisely so
the rest of the graph is cycle-free (delay.rs:376-684, graph.rs:418-487);
the two-rate compiler exploits that split instead of just replicating it.
Oracle: single-rate delay-bounded stepping (WEBAUDIO_TWO_RATE=0), itself
proven bit-identical to one-quantum stepping.
"""

import os

import numpy as np
import pytest

import webaudio_tpu as wa
from webaudio_tpu.graph import compiler as C


def _compile(ctx, **kw):
    return C.compile_graph(dict(ctx._nodes), list(ctx._edges),
                           ctx.sample_rate, ctx.length,
                           ctx._destination.node_id, **kw)


def _delay_net(seconds=2.0, fs=48000.0, automate_fb=False, drive_delay=False):
    ctx = wa.OfflineAudioContext(2, int(fs * seconds), fs)
    o = ctx.create_oscillator(frequency=330.0)
    o.start()
    o.stop(0.25)
    d = ctx.create_delay(max_delay_time=0.5)
    d.delay_time.value = 0.2
    fb = ctx.create_gain(gain=0.6)
    if automate_fb:
        fb.gain.set_value_at_time(0.7, 0.0)
        fb.gain.linear_ramp_to_value_at_time(0.2, seconds)
    o.connect(d)
    d.connect(fb)
    fb.connect(d)
    fb.connect(ctx.destination)
    o.connect(ctx.destination)
    if drive_delay:
        lfo = ctx.create_constant_source(offset=0.01)
        lfo.start()
        lfo.connect(d.delay_time)
    return ctx


def _reverb(seconds=2.0):
    fs = 44100.0
    ctx = wa.OfflineAudioContext(2, int(fs * seconds), fs)
    dry = ctx.decode_audio_data_sync("/root/reference/samples/sample.wav")
    ir = ctx.decode_audio_data_sync(
        "/root/reference/samples/parking-garage-response.wav")
    src = ctx.create_buffer_source(loop=True)
    src.buffer = dry
    src.start()
    verb = ctx.create_convolver()
    verb.set_buffer(ir)
    src.connect(verb)
    verb.connect(ctx.destination)
    d = ctx.create_delay(max_delay_time=1.0)
    d.delay_time.value = 0.31
    fb = ctx.create_gain(gain=0.4)
    src.connect(d)
    d.connect(fb)
    fb.connect(d)
    fb.connect(ctx.destination)
    return ctx


def _single_rate(mk):
    os.environ["WEBAUDIO_TWO_RATE"] = "0"
    try:
        return mk().start_rendering_sync().to_array()
    finally:
        os.environ.pop("WEBAUDIO_TWO_RATE", None)


def test_delay_cycle_two_rate_bit_exact():
    ref = _single_rate(_delay_net)
    ctx = _delay_net()
    cg = _compile(ctx)
    # the acyclic part must run blocks LARGER than the delay bound
    d_frames = int(0.2 * 48000)
    assert cg.block_frames > d_frames, "two-rate did not widen the block"
    got = ctx.start_rendering_sync().to_array()
    assert np.abs(ref).max() > 0.1
    np.testing.assert_array_equal(got, ref)


def test_delay_cycle_two_rate_matches_one_quantum_stepping():
    os.environ["WEBAUDIO_CYCLE_BLOCKS"] = "1"
    try:
        ref = _delay_net().start_rendering_sync().to_array()
    finally:
        os.environ.pop("WEBAUDIO_CYCLE_BLOCKS", None)
    got = _delay_net().start_rendering_sync().to_array()
    np.testing.assert_array_equal(got, ref)


def test_automated_in_cycle_param_slices_per_substep():
    # dense automation rows of a group member (fb.gain) slice per inner
    # sub-step; values must match single-rate exactly
    ref = _single_rate(lambda: _delay_net(automate_fb=True))
    got = _delay_net(automate_fb=True).start_rendering_sync().to_array()
    assert np.abs(ref).max() > 0.1
    np.testing.assert_array_equal(got, ref)


def test_reverb_two_rate_runs_big_blocks():
    ref = _single_rate(_reverb)
    ctx = _reverb()
    cg = _compile(ctx)
    assert cg.block_frames // 128 > 64          # acyclic part widened
    got = ctx.start_rendering_sync().to_array()
    assert np.abs(ref).max() > 0.1
    # convolver FFT partition grows with the block: f32 rounding only
    np.testing.assert_allclose(got, ref, atol=3e-6)


def test_audio_driven_delay_falls_back_single_rate():
    # an audio-driven delay_time pins the cycle to one-quantum stepping;
    # two-rate must not engage (no constant bound exists)
    ctx = _delay_net(drive_delay=True)
    cg = _compile(ctx)
    assert cg.block_frames == 128
    out = ctx.start_rendering_sync().to_array()
    assert np.isfinite(out).all()


def test_two_rate_graph_batch_lane_matches_own_render():
    from webaudio_tpu.parallel.batch import MixedGraphBatch

    a = _delay_net(automate_fb=True)
    b = _delay_net()
    ra = _delay_net(automate_fb=True).start_rendering_sync().to_array()
    rb = _delay_net().start_rendering_sync().to_array()
    mb = MixedGraphBatch([a, b])
    outs = mb.render()
    np.testing.assert_allclose(outs[0], ra, atol=2e-5)
    np.testing.assert_allclose(outs[1], rb, atol=2e-5)


def test_two_rate_checkpoint_resume(tmp_path):
    from webaudio_tpu.checkpoint import RenderSession

    full = _delay_net().start_rendering_sync().to_array()
    n = _delay_net().length

    ctx2 = _delay_net()
    s = RenderSession(ctx2)
    B = s._qpb * 128 if hasattr(s, "_qpb") and s._qpb else 128
    step = (n // 2) // B * B
    if step == 0:
        pytest.skip("render too short for session stepping")
    first = s.step(step)
    ck = str(tmp_path / "tr.npz")
    s.save(ck)
    ctx3 = _delay_net()
    s2 = RenderSession(ctx3)
    s2.restore(ck)
    second = s2.step((n - step) // B * B)
    got = np.concatenate([first, second], axis=1)
    np.testing.assert_allclose(got, full[:, :got.shape[1]], atol=5e-6)
