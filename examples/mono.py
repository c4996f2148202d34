"""Change the destination channel count live (reference:
examples/mono.rs — stereo -> mono -> stereo while playing).

Captures the online render through a callback sink so the channel-count
switch is observable in the produced audio.
"""
import _common  # noqa: F401
import time

import numpy as np
import webaudio_tpu as wa

chunks = []
ctx = wa.AudioContext(sample_rate=48000.0,
                      sink_id=lambda chunk, ts: chunks.append(chunk.copy()),
                      render_size_hint=4096)
osc = ctx.create_oscillator(frequency=220.0)
pan = ctx.create_stereo_panner(pan=0.9)     # hard-right so mono is audible
osc.connect(pan)
pan.connect(ctx.destination)
osc.start()

print("stereo")
time.sleep(0.4)
ctx.destination.set_channel_count(1)
print("mono")
time.sleep(0.4)
ctx.destination.set_channel_count(2)
print("stereo")
time.sleep(0.4)
ctx.close_sync()

# inspect the captured chunks: in the mono phase both backend channels
# carry the same signal (mono upmixed to the stereo sink)
diffs = [float(np.abs(c[0] - c[1]).max()) if c.shape[0] >= 2 else 0.0
         for c in chunks]
print(f"captured {len(chunks)} chunks; inter-channel difference per chunk:")
print("  " + " ".join(f"{d:.2f}" for d in diffs))
