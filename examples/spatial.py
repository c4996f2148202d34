"""HRTF spatialization with a moving source
(reference: examples/spatial.rs)."""
import _common  # noqa: F401
import numpy as np
import webaudio_tpu as wa
from webaudio_tpu.media.wav import write_wav

fs = 44100.0
seconds = 4.0
ctx = wa.OfflineAudioContext(2, int(fs * seconds), fs)

osc = ctx.create_oscillator(type="triangle", frequency=440.0)
panner = ctx.create_panner(panning_model="HRTF")
for t in np.linspace(0, seconds, 80):
    ang = 2 * np.pi * t / seconds
    panner.position_x.linear_ramp_to_value_at_time(float(2 * np.sin(ang)), float(t))
    panner.position_z.linear_ramp_to_value_at_time(float(-2 * np.cos(ang)), float(t))
osc.connect(panner)
panner.connect(ctx.destination)
osc.start()

out = ctx.start_rendering_sync()
write_wav("/tmp/spatial.wav", out.to_array(), fs)
print("wrote /tmp/spatial.wav", out)
