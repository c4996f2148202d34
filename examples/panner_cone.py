"""Directional source with a cone (reference: examples/panner_cone.rs):
a source rotating its orientation in front of the listener, so the output
level follows the cone's inner/outer gain profile."""
import _common  # noqa: F401
import numpy as np
import webaudio_tpu as wa
from webaudio_tpu.media.wav import write_wav

fs = 48000.0
seconds = 4.0
ctx = wa.OfflineAudioContext(2, int(fs * seconds), fs)
osc = ctx.create_oscillator(frequency=440.0)
p = ctx.create_panner(position_z=-1.0, cone_inner_angle=30.0,
                      cone_outer_angle=120.0, cone_outer_gain=0.1)
# rotate the source's orientation a full turn
steps = 64
for i in range(steps + 1):
    t = seconds * i / steps
    ang = 2 * np.pi * i / steps
    p.orientation_x.linear_ramp_to_value_at_time(float(np.sin(ang)), t)
    p.orientation_z.linear_ramp_to_value_at_time(float(np.cos(ang)), t)
osc.connect(p)
p.connect(ctx.destination)
osc.start()
out = ctx.start_rendering_sync()
arr = out.to_array()
# report the level every half second: loud when pointing at the listener
for t in np.arange(0.25, seconds, 0.5):
    i = int(t * fs)
    rms = float(np.sqrt((arr[:, i - 2000: i + 2000] ** 2).mean()))
    print(f"t={t:4.2f}s  rms={rms:.3f}")
write_wav("/tmp/panner_cone.wav", arr, fs)
print("wrote /tmp/panner_cone.wav")
