"""Programmatic AudioBuffer construction (reference: examples/audio_buffer.rs).

Builds a buffer by hand (sine + decaying noise), then plays it straight and
pitched via playback_rate, mirroring the reference's two-part demo.
"""
import _common  # noqa: F401
import numpy as np
import webaudio_tpu as wa
from webaudio_tpu.media.wav import write_wav

fs = 44100.0
ctx = wa.OfflineAudioContext(1, int(fs * 4.0), fs)

# hand-filled AudioBuffer: 440 Hz tone with a touch of noise, 2 s
buf = ctx.create_buffer(1, int(fs * 2.0), fs)
t = np.arange(buf.length) / fs
rng = np.random.RandomState(0)
samples = (np.sin(2 * np.pi * 440.0 * t) * 0.5
           + rng.randn(buf.length) * 0.02 * np.exp(-t * 3)).astype(np.float32)
buf.copy_to_channel(samples, 0)

# play it as-is at t=0
src1 = ctx.create_buffer_source()
src1.buffer = buf
src1.connect(ctx.destination)
src1.start(0.0)

# and again at half speed (one octave down) at t=2
src2 = ctx.create_buffer_source(playback_rate=0.5)
src2.buffer = buf
src2.connect(ctx.destination)
src2.start(2.0)

out = ctx.start_rendering_sync()
write_wav("/tmp/audio_buffer.wav", out.to_array(), fs)
print(f"buffer: {buf.number_of_channels} ch x {buf.length} frames @ "
      f"{buf.sample_rate:.0f} Hz ({buf.duration:.2f} s)")
print("wrote /tmp/audio_buffer.wav", out)
