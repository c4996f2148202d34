"""Microphone capture -> processing -> render (reference:
examples/microphone.rs).  TPU hosts have no sound hardware, so the
MediaDevices layer exposes a virtual microphone (SURVEY §2.1); the API
shape is identical to the reference's cpal-backed path."""
import _common  # noqa: F401
import numpy as np
import webaudio_tpu as wa
from webaudio_tpu.media.devices import (enumerate_devices_sync,
                                        get_user_media_sync)
from webaudio_tpu.media.wav import write_wav

for dev in enumerate_devices_sync():
    print(f"{dev.kind:12s} {dev.device_id[:8]}  {dev.label}")

stream = get_user_media_sync()

ctx = wa.AudioContext(sample_rate=48000.0, sink_id="none",
                      render_size_hint=8192)
mic = ctx.create_media_stream_source(stream)
g = ctx.create_gain(gain=0.8)
dest = ctx.create_media_stream_destination()
mic.connect(g)
g.connect(dest)
mic.connect(ctx.destination)

import time
time.sleep(0.6)  # let the paced render loop pull some audio

track = dest.stream.get_tracks()[0]
chunks = []
while True:
    c = track.next_chunk(timeout=0.2)
    if c is None:
        break
    chunks.append(c.to_array())
ctx.close().result()

if chunks:
    cap = np.concatenate(chunks, axis=1)
    write_wav("/tmp/mic_capture.wav", cap, 48000.0)
    print(f"captured {cap.shape[1]} frames from the virtual mic -> "
          "/tmp/mic_capture.wav")
else:
    print("captured no audio (render loop did not tick)")
print("AudioContext state after close:", ctx.state)
