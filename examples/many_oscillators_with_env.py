"""Trigger many enveloped oscillators (reference:
examples/many_oscillators_with_env.rs — sine + attack/decay envelope every
50 ms).

Each voice is osc -> gain with a 10 ms linear attack and a 2 s exponential
release; the chains auto-fuse into one voice bank with packed per-voice
envelope automation rows.
"""
import _common  # noqa: F401
import numpy as np
import webaudio_tpu as wa
from webaudio_tpu.media.wav import write_wav

fs = 44100.0
seconds = 7.0
ctx = wa.OfflineAudioContext(2, int(fs * seconds), fs)

rng = np.random.RandomState(1)
for i in range(100):
    now = i * 0.05
    osc = ctx.create_oscillator(frequency=float(rng.randint(100, 3000)))
    env = ctx.create_gain(gain=0.0)
    env.gain.set_value_at_time(0.0, now)
    env.gain.linear_ramp_to_value_at_time(0.1, now + 0.01)
    env.gain.exponential_ramp_to_value_at_time(0.0001, now + 2.0)
    osc.connect(env)
    env.connect(ctx.destination)
    osc.start(now)
    osc.stop(now + 2.0)

out = ctx.start_rendering_sync()
write_wav("/tmp/many_oscillators_with_env.wav", out.to_array(), fs)
arr = out.to_array()
print(f"peak {np.abs(arr).max():.3f}, tail level (last 0.5s) "
      f"{np.abs(arr[:, -int(0.5*fs):]).max():.5f}")
print("wrote /tmp/many_oscillators_with_env.wav", out)
