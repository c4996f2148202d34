"""Custom AudioWorklet processor compiled into the graph
(reference: examples/worklet.rs)."""
import _common  # noqa: F401
import numpy as np
import jax.numpy as jnp
import webaudio_tpu as wa
from webaudio_tpu.param import AudioParamDescriptor, AutomationRate
from webaudio_tpu.media.wav import write_wav


class WhiteNoiseProcessor(wa.AudioWorkletProcessor):
    """Deterministic per-sample noise from a counter-based hash."""

    @classmethod
    def parameter_descriptors(cls):
        return [AudioParamDescriptor(
            name="amplitude", automation_rate=AutomationRate.A,
            default_value=0.25, min_value=0.0, max_value=1.0)]

    def process(self, scope, state, inputs, params):
        # stateless counter-based PRNG (threefry-lite): hash the sample index
        x = scope.t_idx.astype(jnp.uint32)
        x = (x ^ jnp.uint32(61)) ^ (x >> 16)
        x = x * jnp.uint32(9)
        x = x ^ (x >> 4)
        x = x * jnp.uint32(0x27d4eb2d)
        x = x ^ (x >> 15)
        noise = x.astype(jnp.float32) / jnp.float32(2**32) * 2.0 - 1.0
        return state, [(noise * params["amplitude"])[None, :]]


fs = 44100.0
ctx = wa.OfflineAudioContext(1, int(fs * 2), fs)
noise = ctx.create_audio_worklet(WhiteNoiseProcessor)
noise.parameters["amplitude"].set_value_at_time(0.8, 0.0)
noise.parameters["amplitude"].exponential_ramp_to_value_at_time(0.01, 2.0)
lp = ctx.create_biquad_filter(type="lowpass", frequency=1200.0)
noise.connect(lp)
lp.connect(ctx.destination)

out = ctx.start_rendering_sync()
write_wav("/tmp/worklet.wav", out.to_array(), fs)
print("wrote /tmp/worklet.wav", out)
