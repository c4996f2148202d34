"""StereoPannerNode sweep (reference: examples/stereo_panner.rs).

Pans a tone hard left -> hard right with a-rate automation and verifies
the equal-power law: at pan=0 both channels carry cos(pi/4) of the input.
"""
import _common  # noqa: F401
import numpy as np
import webaudio_tpu as wa
from webaudio_tpu.media.wav import write_wav

fs = 44100.0
seconds = 4.0
ctx = wa.OfflineAudioContext(2, int(fs * seconds), fs)

osc = ctx.create_oscillator(frequency=330.0)
pan = ctx.create_stereo_panner(pan=-1.0)
pan.pan.set_value_at_time(-1.0, 0.0)
pan.pan.linear_ramp_to_value_at_time(1.0, seconds)

osc.connect(pan)
pan.connect(ctx.destination)
osc.start()

out = ctx.start_rendering_sync()
arr = out.to_array()
write_wav("/tmp/stereo_panner.wav", arr, fs)


def level(ch, t):
    i = int(t * fs)
    return float(np.abs(arr[ch, i:i + 2048]).max())


print(f"t=0.1s (hard left):  L={level(0,0.1):.3f} R={level(1,0.1):.3f}")
print(f"t=2.0s (center):     L={level(0,2.0):.3f} R={level(1,2.0):.3f} "
      f"(equal-power center = {np.cos(np.pi/4):.3f})")
print(f"t=3.9s (hard right): L={level(0,3.9):.3f} R={level(1,3.9):.3f}")
print("wrote /tmp/stereo_panner.wav")
