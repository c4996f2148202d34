"""Output device selection and live hot-swap (reference:
examples/sink_id.rs).

Enumerates output sinks, starts a beep on the null sink, then hot-swaps
the live context to a WAV-file sink and back — the graph (and its state)
migrates across backends, the analog of the reference's CloseAndRecycle
migration (online.rs:365-453).
"""
import _common  # noqa: F401
import os
import time

import webaudio_tpu as wa
from webaudio_tpu.media.devices import (MediaDeviceInfoKind,
                                        enumerate_devices_sync)

outputs = [d for d in enumerate_devices_sync()
           if d.kind == MediaDeviceInfoKind.AUDIO_OUTPUT]
for d in outputs:
    print(f"output device {d.device_id[:8]}  {d.label}")

events = []
ctx = wa.AudioContext(sample_rate=48000.0, sink_id="none")
ctx.set_onsinkchange(lambda *a: events.append(ctx.sink_id))

osc = ctx.create_oscillator(frequency=440.0)
gain = ctx.create_gain(gain=0.3)
osc.connect(gain)
gain.connect(ctx.destination)
osc.start()

print(f"playing on sink {ctx.sink_id!r}")
time.sleep(0.3)

path = "/tmp/sink_id_capture.wav"
ctx.set_sink_id_sync(f"file:{path}")
print(f"hot-swapped to sink {ctx.sink_id!r}")
time.sleep(0.4)

ctx.set_sink_id_sync("none")
print(f"hot-swapped back to {ctx.sink_id!r}")
time.sleep(0.2)
ctx.close_sync()

print(f"sinkchange events fired: {len(events)}")
print(f"captured file exists: {os.path.exists(path)} ({path})")
