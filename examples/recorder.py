"""MediaRecorder: capture a graph's output into a WAV blob (reference:
examples/recorder.rs)."""
import _common  # noqa: F401
import time

import webaudio_tpu as wa

ctx = wa.AudioContext(sample_rate=48000.0, sink_id="none",
                      render_size_hint=8192)
osc = ctx.create_oscillator(frequency=440.0)
g = ctx.create_gain(gain=0.3)
dest = ctx.create_media_stream_destination()
osc.connect(g)
g.connect(dest)
osc.start()

from webaudio_tpu.media.recorder import MediaRecorder

rec = MediaRecorder(dest.stream)
blobs = []
rec.set_ondataavailable(lambda ev: blobs.append(ev.blob))
rec.start()
# wait until the paced render loop has actually produced some audio
# (under heavy host load the first callbacks can lag)
deadline = time.time() + 10.0
while ctx.current_time < 0.3 and time.time() < deadline:
    time.sleep(0.05)
rec.stop()
ctx.close().result()

data = b"".join(blobs)
path = "/tmp/recorded.wav"
with open(path, "wb") as f:
    f.write(data)
print(f"recorded {len(data)} bytes -> {path}")

# decode what we recorded to prove the round trip
buf = ctx.decode_audio_data_sync(path)
print("round trip:", buf)
