"""Golden-fixture regression corpus: canonical graphs rendered and compared
against committed fixtures, guarding future kernel/compiler refactors.

Regenerate with:  python tests/test_goldens.py --regen
"""

import os
import sys

import numpy as np
import pytest

FIXTURES = os.path.join(os.path.dirname(__file__), "goldens.npz")


def _build_cases():
    from webaudio_tpu import OfflineAudioContext

    fs = 48000.0
    cases = {}

    ctx = OfflineAudioContext(1, 2048, fs)
    osc = ctx.create_oscillator(type="square", frequency=441.0)
    osc.connect(ctx.destination)
    osc.start(0.5 / fs)
    cases["square_osc"] = ctx

    ctx = OfflineAudioContext(2, 2048, fs)
    src = ctx.create_constant_source(offset=1.0)
    g = ctx.create_gain()
    g.gain.set_value_at_time(0.0, 0.0)
    g.gain.set_target_at_time(1.0, 256 / fs, 0.005)
    pan = ctx.create_stereo_panner()
    pan.pan.linear_ramp_to_value_at_time(1.0, 2048 / fs)
    src.connect(g)
    g.connect(pan)
    pan.connect(ctx.destination)
    src.start()
    cases["env_pan"] = ctx

    ctx = OfflineAudioContext(1, 2048, fs)
    rng = np.random.RandomState(0)
    buf = ctx.create_buffer(1, 1500, fs)
    buf.copy_to_channel(rng.randn(1500).astype(np.float32) * 0.3, 0)
    s = ctx.create_buffer_source(playback_rate=0.73, loop=True)
    s.buffer = buf
    f = ctx.create_biquad_filter(type="bandpass", frequency=2000.0, q=5.0)
    s.connect(f)
    f.connect(ctx.destination)
    s.start(0.0, 0.002)
    cases["resampled_bandpass"] = ctx

    ctx = OfflineAudioContext(1, 2048, fs)
    imp = ctx.create_buffer(1, 8, fs)
    imp.copy_to_channel(np.array([1, 0, 0, 0, 0, 0, 0, 0], np.float32), 0)
    s = ctx.create_buffer_source()
    s.buffer = imp
    d = ctx.create_delay(max_delay_time=0.01)
    d.delay_time.set_value_at_time(10.5 / fs, 0.0)
    d.delay_time.linear_ramp_to_value_at_time(40.25 / fs, 2048 / fs)
    fb = ctx.create_gain(gain=0.6)
    s.connect(d)
    d.connect(fb)
    fb.connect(d)
    d.connect(ctx.destination)
    s.start()
    cases["modulated_feedback_delay"] = ctx

    ctx = OfflineAudioContext(2, 2048, fs)
    o = ctx.create_oscillator(type="triangle", frequency=220.0)
    p = ctx.create_panner(panning_model="HRTF", position_x=1.0, position_z=-1.0)
    o.connect(p)
    p.connect(ctx.destination)
    o.start()
    cases["hrtf_static"] = ctx

    ctx = OfflineAudioContext(1, 2048, fs)
    o = ctx.create_oscillator(type="sawtooth", frequency=300.0)
    c = ctx.create_dynamics_compressor(threshold=-30.0, ratio=8.0, knee=6.0)
    ws = ctx.create_wave_shaper()
    ws.set_curve(np.tanh(np.linspace(-2, 2, 256)).astype(np.float32))
    o.connect(ws)
    ws.connect(c)
    c.connect(ctx.destination)
    o.start()
    cases["shaped_compressed"] = ctx

    return cases


def _render_all():
    return {name: ctx.start_rendering_sync().to_array()
            for name, ctx in _build_cases().items()}


@pytest.mark.skipif(not os.path.exists(FIXTURES),
                    reason="golden fixtures not generated")
def test_goldens():
    rendered = _render_all()
    with np.load(FIXTURES) as z:
        for name, out in rendered.items():
            ref = z[name]
            scale = max(np.abs(ref).max(), 1e-6)
            np.testing.assert_allclose(
                out, ref, atol=1e-5 * scale,
                err_msg=f"golden mismatch: {name}")


if __name__ == "__main__":
    if "--regen" in sys.argv:
        np.savez_compressed(FIXTURES, **_render_all())
        print(f"wrote {FIXTURES}")
