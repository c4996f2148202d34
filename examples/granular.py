"""Granular synthesis scrub (reference: examples/granular.rs):
many short enveloped grains from one source file."""
import _common  # noqa: F401
import numpy as np
import webaudio_tpu as wa
from webaudio_tpu.media.wav import write_wav

fs = 44100.0
ctx = wa.OfflineAudioContext(2, int(fs * 3), fs)
sample = ctx.decode_audio_data_sync("/root/reference/samples/sample.wav")

rng = np.random.RandomState(1)
grain_dur = 0.09
for i in range(40):
    when = i * 0.07
    offset = 0.5 + 1.5 * (i / 40.0) + rng.rand() * 0.05  # scrub playhead
    src = ctx.create_buffer_source()
    src.buffer = sample
    env = ctx.create_gain(gain=0.0)
    env.gain.set_value_at_time(0.0, when)
    env.gain.linear_ramp_to_value_at_time(0.4, when + grain_dur / 2)
    env.gain.linear_ramp_to_value_at_time(0.0, when + grain_dur)
    src.connect(env)
    env.connect(ctx.destination)
    src.start(when, offset, grain_dur)

out = ctx.start_rendering_sync()
write_wav("/tmp/granular.wav", out.to_array(), fs)
print("wrote /tmp/granular.wav", out)
