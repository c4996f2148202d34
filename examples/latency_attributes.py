"""Context latency attributes (reference: examples/latency_attributes.rs).

Builds online contexts with each latency hint and prints base latency,
output latency, and current time as the paced render loop runs.
"""
import _common  # noqa: F401
import time

import webaudio_tpu as wa

for hint in ("interactive", "balanced", "playback"):
    ctx = wa.AudioContext(latency_hint=hint, sample_rate=48000.0,
                          sink_id="none")
    osc = ctx.create_oscillator(frequency=200.0)
    gain = ctx.create_gain(gain=0.2)
    osc.connect(gain)
    gain.connect(ctx.destination)
    osc.start()
    time.sleep(0.25)
    print(f"latency_hint={hint:12s} base_latency={ctx.base_latency*1e3:6.2f} ms"
          f"  output_latency={ctx.output_latency*1e3:6.2f} ms"
          f"  current_time={ctx.current_time:.3f} s")
    ctx.close_sync()

# custom numeric hint: seconds of desired latency
ctx = wa.AudioContext(latency_hint=0.1, sample_rate=48000.0, sink_id="none")
print(f"latency_hint=0.1s        base_latency={ctx.base_latency*1e3:6.2f} ms")
ctx.close_sync()
