"""Round-trip latency estimation (reference:
examples/roundtrip_latency_test.rs).

The reference plays impulses out of the speaker and correlates the
microphone signal to estimate output+input latency (with a 17 ms feedback
delay line as the loopback emulator for testing).  TPU hosts have no
sound hardware, so this port reproduces the *test mode*: a known
17 ms DelayNode stands in for the physical loopback, impulses go through
it, and the measured inter-impulse arrival offset recovers the delay.
"""
import _common  # noqa: F401
import numpy as np
import webaudio_tpu as wa

fs = 48000.0
emulated_loopback_s = 0.017
impulse_period_s = 0.5
n_impulses = 6

ctx = wa.OfflineAudioContext(1, int(fs * (n_impulses + 1) * impulse_period_s),
                             fs)

# impulse train source
impulse = ctx.create_buffer(1, 8, fs)
impulse.copy_to_channel(np.array([1, 0, 0, 0, 0, 0, 0, 0], np.float32), 0)
for i in range(n_impulses):
    src = ctx.create_buffer_source()
    src.buffer = impulse
    # the "speaker -> cable -> mic" path: a 17 ms delay line
    loop = ctx.create_delay(max_delay_time=0.1)
    loop.delay_time.value = emulated_loopback_s
    src.connect(loop)
    loop.connect(ctx.destination)
    src.start(i * impulse_period_s)

out = ctx.start_rendering_sync().to_array()[0]

# detect arrival sample of each impulse and compare to its send time
arrivals = np.flatnonzero(np.abs(out) > 0.5)
latencies = []
for i in range(n_impulses):
    sent = int(i * impulse_period_s * fs)
    got = arrivals[np.searchsorted(arrivals, sent)]
    latencies.append((got - sent) / fs)

lat = float(np.mean(latencies))
print(f"measured round-trip latency: {lat*1e3:.3f} ms "
      f"(emulated loopback {emulated_loopback_s*1e3:.1f} ms)")
print(f"per-impulse: {[f'{v*1e3:.3f}' for v in latencies]} ms")
assert abs(lat - emulated_loopback_s) < 0.001, "latency estimate off"
print("estimate matches the emulated loopback within 1 ms")
