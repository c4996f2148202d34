"""64-voice wavetable synth: each voice has its own harmonic recipe and
envelope; the compiler auto-fuses all chains into one (V, B) bank kernel
(graph/fusion.py — set WEBAUDIO_FUSE_THRESHOLD=0 to compare unfused)."""
import _common  # noqa: F401
import numpy as np
import webaudio_tpu as wa
from webaudio_tpu.media.wav import write_wav
from webaudio_tpu.diagnostics import collect_diagnostics

fs = 48000.0
ctx = wa.OfflineAudioContext(2, int(fs * 4), fs)
mix = ctx.create_gain(gain=1.0 / 24)
pan = ctx.create_stereo_panner()
pan.pan.linear_ramp_to_value_at_time(0.6, 4.0)
mix.connect(pan)
pan.connect(ctx.destination)

rng = np.random.RandomState(7)
scale = [0, 3, 5, 7, 10, 12, 15, 17]  # minor pentatonic-ish
for i in range(64):
    nh = 2 + i % 7
    imag = np.concatenate([[0.0], 1.0 / np.arange(1, nh + 1) ** 1.2])
    pw = ctx.create_periodic_wave(real=np.zeros(nh + 1, np.float32),
                                  imag=imag.astype(np.float32))
    note = 110.0 * 2 ** (scale[i % len(scale)] / 12.0 + (i // 16))
    o = ctx.create_oscillator(frequency=float(note),
                              detune=float(rng.randn() * 4))
    o.set_periodic_wave(pw)
    env = ctx.create_gain(gain=0.0)
    t0 = (i % 16) * 0.22
    env.gain.set_value_at_time(0.0, t0)
    env.gain.linear_ramp_to_value_at_time(0.8, t0 + 0.02)
    env.gain.linear_ramp_to_value_at_time(0.0, t0 + 0.5)
    o.connect(env)
    env.connect(mix)
    o.start(t0)

print("fusion preview:", collect_diagnostics(ctx)["fusion"])
out = ctx.start_rendering_sync()
write_wav("/tmp/wavetable_synth.wav", out.to_array(), fs)
print("wrote /tmp/wavetable_synth.wav", out)
