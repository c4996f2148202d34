"""AudioBufferSource ended events (reference:
examples/audio_buffer_source_events.rs).

Schedules three buffer sources with different stop conditions and shows
each one's `onended` callback firing with the context time it ended at.
"""
import _common  # noqa: F401
import numpy as np
import webaudio_tpu as wa

fs = 44100.0
ctx = wa.OfflineAudioContext(1, int(fs * 4.0), fs)

buf = ctx.create_buffer(1, int(fs * 1.0), fs)
buf.copy_to_channel(
    (np.sin(2 * np.pi * 330.0 * np.arange(buf.length) / fs) * 0.4
     ).astype(np.float32), 0)

ended = []


def make(name, **start_kw):
    src = ctx.create_buffer_source()
    src.buffer = buf
    src.connect(ctx.destination)
    src.set_onended(lambda *a, n=name: ended.append(n))
    return src


# plays to the natural end of its 1 s buffer
s1 = make("full-buffer")
s1.start(0.0)

# explicitly stopped after 0.5 s
s2 = make("stopped-early")
s2.start(1.5)
s2.stop(2.0)

# duration-limited start
s3 = make("duration-limited")
s3.start(2.5, 0.0, 0.25)

ctx.start_rendering_sync()
for name in ended:
    print(f"onended fired: {name}")
assert len(ended) == 3, ended
print("all three sources reported ended")
