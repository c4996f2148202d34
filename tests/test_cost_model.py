"""Cheap TPU-free regression gating: XLA's own cost model as a fixture.

Each representative case compiles on CPU and its (flops, bytes-accessed)
estimate is compared against `tests/cost_model_fixtures.json`.  A kernel
regression that doubles traffic or FLOPs fails here without a TPU session
(the tunneled TPU's 37-104% run-to-run spread makes wall-clock gating
blind below ~1.5x; the cost model is deterministic).

Regenerate fixtures after an INTENDED kernel/block-policy change:

    python tests/test_cost_model.py --update
"""

import json
import os
import sys

import numpy as np
import pytest

FIXTURES = os.path.join(os.path.dirname(__file__),
                        "cost_model_fixtures.json")
TOL = 0.15   # deterministic per JAX version; catches any >=1.2x regression


def _ctx_buffer_biquad():
    import webaudio_tpu as wa

    fs = 44100.0
    ctx = wa.OfflineAudioContext(2, int(fs), fs)
    buf = ctx.create_buffer(2, 8192, fs)
    rng = np.random.default_rng(0)
    for c in range(2):
        buf.copy_to_channel(
            rng.standard_normal(8192).astype(np.float32) * 0.4, c)
    src = ctx.create_buffer_source(loop=True)
    src.buffer = buf
    src.start()
    f = ctx.create_biquad_filter(type="lowpass", q=8.0)
    f.frequency.set_value_at_time(200.0, 0.0)
    f.frequency.exponential_ramp_to_value_at_time(8000.0, 1.0)
    src.connect(f)
    f.connect(ctx.destination)
    return ctx


def _ctx_osc_bank():
    import webaudio_tpu as wa

    fs = 44100.0
    ctx = wa.OfflineAudioContext(1, int(fs), fs)
    for i in range(64):
        o = ctx.create_oscillator(frequency=55.0 * (1 + i % 32))
        g = ctx.create_gain(gain=0.0)
        g.gain.set_value_at_time(0.0, 0.0)
        g.gain.linear_ramp_to_value_at_time(1.0 / 64, 0.5)
        g.gain.linear_ramp_to_value_at_time(0.0, 1.0)
        o.connect(g)
        g.connect(ctx.destination)
        o.start()
    return ctx


def _ctx_granular():
    import webaudio_tpu as wa

    fs = 44100.0
    ctx = wa.OfflineAudioContext(2, int(fs), fs)
    sample = ctx.decode_audio_data_sync(
        "/root/reference/samples/sample.wav")
    rng = np.random.RandomState(1)
    for i in range(64):
        when = i * 0.8 / 64
        src = ctx.create_buffer_source(
            playback_rate=float(0.9 + 0.2 * rng.rand()))
        src.buffer = sample
        env = ctx.create_gain(gain=0.0)
        env.gain.set_value_at_time(0.0, when)
        env.gain.linear_ramp_to_value_at_time(0.4, when + 0.045)
        env.gain.linear_ramp_to_value_at_time(0.0, when + 0.09)
        src.connect(env)
        env.connect(ctx.destination)
        src.start(when, 0.3 + 0.8 * (i / 64), 0.09)
    return ctx


def _ctx_mastering():
    import webaudio_tpu as wa

    fs = 44100.0
    ctx = wa.OfflineAudioContext(2, int(fs), fs)
    o = ctx.create_oscillator(type="sawtooth", frequency=110.0)
    o.start()
    n = 2048
    x = np.linspace(-1, 1, n, dtype=np.float32)
    curve = np.tanh(3.0 * x).astype(np.float32)
    sh = ctx.create_wave_shaper(curve=curve, oversample="4x")
    comp = ctx.create_dynamics_compressor()
    o.connect(sh)
    sh.connect(comp)
    comp.connect(ctx.destination)
    return ctx


def _ctx_delay_net():
    import webaudio_tpu as wa

    fs = 48000.0
    ctx = wa.OfflineAudioContext(2, int(fs), fs)
    o = ctx.create_oscillator(frequency=330.0)
    o.start()
    o.stop(0.25)
    d = ctx.create_delay(max_delay_time=0.5)
    d.delay_time.value = 0.2
    fb = ctx.create_gain(gain=0.6)
    o.connect(d)
    d.connect(fb)
    fb.connect(d)
    fb.connect(ctx.destination)
    o.connect(ctx.destination)
    return ctx


def _ctx_conv_reverb():
    import webaudio_tpu as wa

    fs = 44100.0
    ctx = wa.OfflineAudioContext(2, int(fs * 2), fs)
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


CASES = {
    "buffer_biquad": _ctx_buffer_biquad,
    "osc_bank_64": _ctx_osc_bank,
    "granular_64": _ctx_granular,
    "mastering": _ctx_mastering,
    "delay_net": _ctx_delay_net,
    "conv_reverb_2s": _ctx_conv_reverb,
}


def _measure(name):
    from webaudio_tpu.graph import compiler as C

    ctx = CASES[name]()
    cg = C.compile_graph(dict(ctx._nodes), list(ctx._edges),
                         ctx.sample_rate, ctx.length,
                         ctx._destination.node_id)
    comp = cg.jit_scan.lower(*C.render_args(cg, ctx.length)).compile()
    ca = comp.cost_analysis()
    if isinstance(ca, list):
        ca = ca[0]
    return {"flops": float(ca.get("flops", 0.0)),
            "bytes": float(ca.get("bytes accessed", 0.0)),
            "block_frames": cg.block_frames}


@pytest.mark.parametrize("name", sorted(CASES))
def test_cost_model_within_fixture(name):
    if not os.path.exists(FIXTURES):
        pytest.skip("no fixtures committed; run --update")
    fixture = json.load(open(FIXTURES)).get(name)
    if fixture is None:
        pytest.skip(f"no fixture for {name}; run --update")
    got = _measure(name)
    assert got["block_frames"] == fixture["block_frames"], (
        f"{name}: block policy changed "
        f"{fixture['block_frames']} -> {got['block_frames']} — if intended, "
        f"regenerate with `python tests/test_cost_model.py --update`")
    for key in ("flops", "bytes"):
        ref = fixture[key]
        if ref <= 0:
            continue
        ratio = got[key] / ref
        assert (1 - TOL) <= ratio <= (1 + TOL), (
            f"{name}: {key} changed {ratio:.2f}x vs fixture "
            f"({ref:.3g} -> {got[key]:.3g}) — if intended, regenerate with "
            f"`python tests/test_cost_model.py --update`")


if __name__ == "__main__":
    if "--update" in sys.argv:
        os.environ.setdefault("JAX_PLATFORMS", "cpu")
        import jax

        jax.config.update("jax_platforms", "cpu")
        sys.path.insert(0, os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))))
        out = {}
        for name in sorted(CASES):
            out[name] = _measure(name)
            print(name, out[name])
        json.dump(out, open(FIXTURES, "w"), indent=1)
        print("wrote", FIXTURES)
    else:
        print(__doc__)
