"""AudioWorklet bitcrusher (reference: examples/worklet_bitcrusher.rs).

The reference crushes per sample with a mutable phase + sample-and-hold.
Here the same recurrence is expressed with parallel prefix ops — cumsum
for the phase, cummax for "index of the most recent trigger" — so the
user processor stays one fused tensor program, no per-sample Python.
"""
import _common  # noqa: F401
import numpy as np
import jax.numpy as jnp
import jax
import webaudio_tpu as wa
from webaudio_tpu.param import AudioParamDescriptor, AutomationRate
from webaudio_tpu.media.wav import write_wav


class BitCrusherProcessor(wa.AudioWorkletProcessor):
    @classmethod
    def parameter_descriptors(cls):
        return [
            AudioParamDescriptor(name="bit_depth",
                                 automation_rate=AutomationRate.A,
                                 default_value=12.0, min_value=1.0,
                                 max_value=16.0),
            AudioParamDescriptor(name="frequency_reduction",
                                 automation_rate=AutomationRate.A,
                                 default_value=0.5, min_value=0.0,
                                 max_value=1.0),
        ]

    def init_state(self, render_ctx):
        return {"phase": jnp.zeros((), jnp.float32),
                "held": jnp.zeros((max(1, render_ctx.input_channel_counts[0]),),
                                  jnp.float32)}

    def process(self, scope, state, inputs, params):
        x = inputs[0]                                     # (C, B)
        B = x.shape[1]
        depth = jnp.broadcast_to(params["bit_depth"], (B,))
        fred = jnp.broadcast_to(params["frequency_reduction"], (B,))

        step = jnp.power(0.5, depth)                      # quantization step
        quant = step * jnp.floor(x / step + 0.5)          # (C, B)

        # phase accumulation with subtract-1-on-trigger == ceil arithmetic
        P = state["phase"] + jnp.cumsum(fred)
        trig = P > (1.0 + jnp.maximum(0.0, jnp.ceil(
            jnp.concatenate([state["phase"][None], P[:-1]]) - 1.0)))
        phase_out = P[-1] - jnp.maximum(0.0, jnp.ceil(P[-1] - 1.0))

        # sample-and-hold: take the quantized value at the latest trigger
        idx = jnp.where(trig, jnp.arange(B), -1)
        last_idx = jax.lax.cummax(idx)
        held0 = state["held"][:, None]                    # value before block
        out = jnp.where(last_idx[None, :] >= 0,
                        jnp.take(quant, jnp.maximum(last_idx, 0), axis=1),
                        held0)
        new_held = out[:, -1]
        return {"phase": phase_out, "held": new_held}, [out]


fs = 44100.0
ctx = wa.OfflineAudioContext(2, int(fs * 6.0), fs)
clip = ctx.decode_audio_data_sync("/root/reference/samples/sample.wav")
src = ctx.create_buffer_source(loop=True)
src.buffer = clip

crusher = ctx.create_audio_worklet(BitCrusherProcessor)
crusher.parameters["bit_depth"].set_value_at_time(12.0, 0.0)
crusher.parameters["bit_depth"].linear_ramp_to_value_at_time(2.0, 5.0)
crusher.parameters["frequency_reduction"].set_value_at_time(1.0, 0.0)
crusher.parameters["frequency_reduction"].linear_ramp_to_value_at_time(
    0.05, 6.0)

src.connect(crusher)
crusher.connect(ctx.destination)
src.start()

out = ctx.start_rendering_sync()
write_wav("/tmp/worklet_bitcrusher.wav", out.to_array(), fs)
print("wrote /tmp/worklet_bitcrusher.wav", out)
