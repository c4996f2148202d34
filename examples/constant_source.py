"""ConstantSourceNode as a shared control signal (reference:
examples/constant_source.rs).

One ConstantSourceNode drives the gain params of several oscillators at
once — automate the constant's offset and every voice follows.
"""
import _common  # noqa: F401
import numpy as np
import webaudio_tpu as wa
from webaudio_tpu.media.wav import write_wav

fs = 44100.0
ctx = wa.OfflineAudioContext(2, int(fs * 4.0), fs)

# the shared volume control: tremolo plus a slow fade-out
master = ctx.create_constant_source(offset=0.0)
master.offset.set_value_at_time(0.5, 0.0)
master.offset.linear_ramp_to_value_at_time(0.5, 3.0)
master.offset.linear_ramp_to_value_at_time(0.0, 4.0)
master.start()

for freq in (261.63, 329.63, 392.0):        # C major triad
    osc = ctx.create_oscillator(frequency=freq)
    amp = ctx.create_gain(gain=0.0)          # base gain 0; control adds onto it
    master.connect(amp.gain)                 # audio-rate param input
    osc.connect(amp)
    amp.connect(ctx.destination)
    osc.start()

out = ctx.start_rendering_sync()
write_wav("/tmp/constant_source.wav", out.to_array(), fs)
arr = out.to_array()
print(f"peak at 1s: {np.abs(arr[:, int(fs)]).max():.3f}, "
      f"peak at 3.9s: {np.abs(arr[:, int(fs*3.9)]).max():.3f}")
print("wrote /tmp/constant_source.wav")
