"""Streaming decode: bounded-memory chunk iteration and disk playback.

reference: src/decoding.rs MediaDecoder (chunk iterator over any Read
stream) and media_element.rs (creek disk streaming).  The rebuild
streams through the native codec host (wacodec.cpp over libavformat):
`MediaDecoder` yields AudioBuffer chunks with memory bounded by the
chunk size, and `MediaElement` plays from disk through a small rolling
window with live seek/loop/rate controls.
"""
import _common  # noqa: F401
import numpy as np
import webaudio_tpu as wa

SRC = "/root/reference/samples/sample.mp3"

# 1) chunked decode of a compressed stream (never fully resident)
md = wa.MediaDecoder(SRC, chunk_frames=4096)
total = 0
peak = 0.0
for i, chunk in enumerate(md):
    total += chunk.length
    peak = max(peak, float(np.abs(chunk.to_array()).max()))
print(f"decoded {total} frames at {md.sample_rate:.0f} Hz in "
      f"{i + 1} chunks of <=4096, peak {peak:.3f}")

# 2) disk-streaming MediaElement into an offline render
fs = 44100.0
el = wa.MediaElement(SRC)
print(f"MediaElement streaming={el.streaming} duration={el.duration:.2f}s")
el.play()
el.playback_rate = 1.25

ctx = wa.OfflineAudioContext(el.number_of_channels, int(fs * 1.0), fs)
from webaudio_tpu.nodes.media_nodes import MediaElementAudioSourceNode

node = MediaElementAudioSourceNode(ctx, el)
gain = ctx.create_gain(gain=0.8)
node.connect(gain)
gain.connect(ctx.destination)
out = ctx.start_rendering_sync()
print(f"rendered 1 s at 1.25x: rms="
      f"{float(np.sqrt((out.to_array() ** 2).mean())):.4f}, "
      f"element now at t={el.current_time:.2f}s "
      f"(window held ~{el._win.shape[1]} source frames)")
el.close()
