"""Feedback cycles and cycle muting (reference: graph cycle handling,
src/render/graph.rs): a legal cycle through a DelayNode keeps ringing; an
illegal delay-free cycle is muted instead of dead-locking."""
import _common  # noqa: F401
import numpy as np
import webaudio_tpu as wa
from webaudio_tpu.media.wav import write_wav

fs = 48000.0

# legal cycle: source -> delay -> gain -> back into delay (echo tail)
ctx = wa.OfflineAudioContext(1, int(fs * 2.0), fs)
n = int(fs * 0.05)
burst = ctx.create_buffer(1, n, fs)
burst.copy_to_channel(
    (np.random.RandomState(0).randn(n) *
     np.exp(-np.arange(n) / (0.005 * fs))).astype(np.float32), 0)
src = ctx.create_buffer_source()
src.buffer = burst
delay = ctx.create_delay(1.0)
delay.delay_time.value = 0.25
fb = ctx.create_gain(gain=0.6)
src.connect(delay)
delay.connect(fb)
fb.connect(delay)
fb.connect(ctx.destination)
src.start()
out = ctx.start_rendering_sync().get_channel_data(0)
for k in range(4):
    i = int((0.25 * (k + 1)) * fs)
    print(f"echo {k}: level {np.abs(out[i:i+n]).max():.3f}")
write_wav("/tmp/cycles_echo.wav", out[None, :], fs)

# illegal delay-free cycle: gain feeding itself — the engine mutes it
ctx2 = wa.OfflineAudioContext(1, 1024, fs)
osc = ctx2.create_oscillator()
bad = ctx2.create_gain(gain=0.9)
osc.connect(bad)
bad.connect(bad)          # direct feedback, no delay
bad.connect(ctx2.destination)
osc.start()
out2 = ctx2.start_rendering_sync().get_channel_data(0)
print("delay-free cycle muted:", bool(np.all(out2 == 0.0)))
print("wrote /tmp/cycles_echo.wav")
