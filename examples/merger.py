"""ChannelMerger: build a stereo stream from two mono sources (reference:
examples/merger.rs) — a tone on the left, noise on the right."""
import _common  # noqa: F401
import numpy as np
import webaudio_tpu as wa
from webaudio_tpu.media.wav import write_wav

fs = 48000.0
ctx = wa.OfflineAudioContext(2, int(fs * 2.0), fs)

merger = ctx.create_channel_merger(2)
merger.connect(ctx.destination)

tone = ctx.create_oscillator(frequency=440.0)
tone.connect(merger, 0, 0)          # left
tone.start()

n = ctx.length
noise_buf = ctx.create_buffer(1, n, fs)
noise_buf.copy_to_channel(
    (np.random.RandomState(0).randn(n) * 0.2).astype(np.float32), 0)
noise = ctx.create_buffer_source()
noise.buffer = noise_buf
noise.connect(merger, 0, 1)         # right
noise.start()

out = ctx.start_rendering_sync()
arr = out.to_array()
print(f"left rms {np.sqrt((arr[0]**2).mean()):.3f} (tone), "
      f"right rms {np.sqrt((arr[1]**2).mean()):.3f} (noise)")
write_wav("/tmp/merger.wav", arr, fs)
print("wrote /tmp/merger.wav")
