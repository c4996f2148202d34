"""TPU-native extension: render a batch of graph instances in one XLA
computation, sharded over the device mesh (no reference counterpart —
this is the engine's scale axis)."""
import _common  # noqa: F401
import numpy as np
import webaudio_tpu as wa
from webaudio_tpu.parallel.batch import GraphBatch

fs = 48000.0
seconds = 1.0
ctx = wa.OfflineAudioContext(2, int(fs * seconds), fs)
osc = ctx.create_oscillator(type="sawtooth", frequency=110.0)
filt = ctx.create_biquad_filter(type="lowpass", q=5.0)
filt.frequency.set_value_at_time(300.0, 0.0)
filt.frequency.exponential_ramp_to_value_at_time(6000.0, seconds)
osc.connect(filt)
filt.connect(ctx.destination)
osc.start()

batch = GraphBatch(ctx, batch=64)
base = np.geomspace(300.0, 6000.0, ctx.length, dtype=np.float32)
depths = np.linspace(0.25, 2.0, 64, dtype=np.float32)
batch.override_param(filt, "frequency", depths[:, None] * base[None, :])
out = np.asarray(batch.render())
print("rendered batch:", out.shape)  # (64, 2, 48000)
