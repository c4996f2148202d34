"""Feedback delay network (reference: examples/feedback_delay.rs)."""
import _common  # noqa: F401
import numpy as np
import webaudio_tpu as wa
from webaudio_tpu.media.wav import write_wav

fs = 44100.0
ctx = wa.OfflineAudioContext(2, int(fs * 4), fs)

# percussive source: short enveloped noise bursts via buffer source
rng = np.random.RandomState(0)
n = int(fs * 0.08)
burst = (rng.randn(n) * np.exp(-np.arange(n) / (0.01 * fs))).astype(np.float32)
buf = ctx.create_buffer(1, n, fs)
buf.copy_to_channel(burst, 0)
for when in (0.0, 1.0, 2.0):
    src = ctx.create_buffer_source()
    src.buffer = buf
    src.connect(ctx.destination)
    delay = ctx.create_delay(max_delay_time=1.0)
    delay.delay_time.value = 0.3
    fb = ctx.create_gain(gain=0.55)
    src.connect(delay)
    delay.connect(fb)
    fb.connect(delay)            # feedback loop (cycle broken by the delay)
    fb.connect(ctx.destination)
    src.start(when)

out = ctx.start_rendering_sync()
write_wav("/tmp/feedback_delay.wav", out.to_array(), fs)
print("wrote /tmp/feedback_delay.wav", out)
