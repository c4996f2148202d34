"""Mixed-topology corpus rendering: bucketed compile cache.

TPU-native extension (SURVEY build-plan item 8, no reference
counterpart): `GraphBatch.from_contexts` takes a heterogeneous list of
contexts, buckets them by structural graph hash, compiles each bucket
ONCE, and renders every instance vmapped — per-instance variation rides
dense automation and per-instance buffers.
"""
import _common  # noqa: F401
import numpy as np
import webaudio_tpu as wa

fs = 48000.0
n = int(fs * 0.5)


def synth(i):
    ctx = wa.OfflineAudioContext(1, n, fs)
    o = ctx.create_oscillator(type="sawtooth", frequency=110.0)
    o.frequency.linear_ramp_to_value_at_time(110.0 + 15.0 * i, n / fs)
    env = ctx.create_gain(gain=0.0)
    env.gain.linear_ramp_to_value_at_time(0.8, 0.02 + 0.001 * i)
    env.gain.set_target_at_time(0.0, 0.3, 0.05)
    o.connect(env)
    env.connect(ctx.destination)
    o.start()
    return ctx


def filtered_noise(i):
    rng = np.random.default_rng(i)
    ctx = wa.OfflineAudioContext(1, n, fs)
    buf = ctx.create_buffer(1, 4096, fs)
    buf.copy_to_channel(rng.standard_normal(4096).astype(np.float32) * 0.3, 0)
    src = ctx.create_buffer_source(loop=True)
    src.buffer = buf
    src.start()
    f = ctx.create_biquad_filter(type="bandpass", q=8.0)
    f.frequency.set_value_at_time(300.0, 0.0)
    f.frequency.exponential_ramp_to_value_at_time(300.0 * (i + 2), n / fs)
    src.connect(f)
    f.connect(ctx.destination)
    return ctx


corpus = [synth(i) for i in range(6)] + [filtered_noise(i) for i in range(6)]
mb = wa.GraphBatch.from_contexts(corpus)
print(f"{len(corpus)} graphs -> {mb.num_buckets} buckets "
      f"(one XLA compile per bucket)")
outs = mb.render()
for i, out in enumerate(outs):
    kind = "synth" if i < 6 else "noise"
    print(f"  graph {i:2d} ({kind}): shape {out.shape}, "
          f"rms {float(np.sqrt((out ** 2).mean())):.4f}")
