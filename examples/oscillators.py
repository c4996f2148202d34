"""All oscillator types incl. a custom PeriodicWave (reference:
examples/oscillators.rs): one second of each waveform back-to-back."""
import _common  # noqa: F401
import numpy as np
import webaudio_tpu as wa
from webaudio_tpu.media.wav import write_wav

fs = 44100.0
types = ["sine", "square", "sawtooth", "triangle"]
ctx = wa.OfflineAudioContext(1, int(fs * (len(types) + 1)), fs)

for i, typ in enumerate(types):
    osc = ctx.create_oscillator(type=typ, frequency=220.0)
    g = ctx.create_gain(gain=0.5)
    osc.connect(g)
    g.connect(ctx.destination)
    osc.start(float(i))
    osc.stop(float(i) + 0.9)

# custom wave: odd harmonics at 1/n (approximates a square)
n_h = 8
real = np.zeros(n_h + 1, np.float32)
imag = np.zeros(n_h + 1, np.float32)
imag[1::2] = 1.0 / np.arange(1, n_h + 1)[::2]
wave = ctx.create_periodic_wave(real=real, imag=imag)
osc = ctx.create_oscillator(frequency=220.0)
osc.set_periodic_wave(wave)
g = ctx.create_gain(gain=0.5)
osc.connect(g)
g.connect(ctx.destination)
osc.start(float(len(types)))
osc.stop(float(len(types)) + 0.9)

out = ctx.start_rendering_sync()
write_wav("/tmp/oscillators.wav", out.to_array(), fs)
print("wrote /tmp/oscillators.wav", out)
