"""Worklet MessagePort control (reference: examples/worklet_message_port.rs).

A noise-generator worklet switches between white and red (integrated)
noise when the control side posts a message through the node's port —
the same bidirectional MessagePort pairing as the reference
(src/message_port.rs).
"""
import _common  # noqa: F401
import numpy as np
import jax.numpy as jnp
import webaudio_tpu as wa
from webaudio_tpu.media.wav import write_wav


class NoiseProcessor(wa.AudioWorkletProcessor):
    """port messages: 'white' | 'red' select the noise color."""

    def __init__(self, options=None, port=None):
        super().__init__(options, port)
        self.color = "white"
        if port is not None:
            port.set_onmessage(self._on_message)

    def _on_message(self, msg):
        self.color = msg
        print(f"  processor received color change -> {msg!r}")

    def init_state(self, render_ctx):
        return {"last": jnp.zeros((), jnp.float32)}

    def process(self, scope, state, inputs, params):
        # counter-hashed white noise (deterministic, stateless)
        n = scope.t_idx.astype(jnp.uint32)
        h = (n ^ jnp.uint32(0x9E3779B9)) * jnp.uint32(0x85EBCA6B)
        h = (h ^ (h >> 13)) * jnp.uint32(0xC2B2AE35)
        white = ((h ^ (h >> 16)).astype(jnp.float32) / 2**32 - 0.5) * 0.5
        if self.color == "red":
            # leaky integration of white noise, carried across blocks
            ext = jnp.concatenate([state["last"][None], white])
            red = jnp.cumsum(ext)[1:] * 0.04
            red = red - jnp.mean(red)
            return {"last": red[-1] / 0.04}, [red[None, :]]
        return state, [white[None, :]]


fs = 44100.0
ctx = wa.AudioContext(sample_rate=fs, sink_id="none", render_size_hint=4096)
node = ctx.create_audio_worklet(NoiseProcessor, number_of_inputs=0,
                                output_channel_count=[1])
node.connect(ctx.destination)

import time

print("white noise...")
time.sleep(0.4)
node.port.post_message("red")     # graph re-traces with the new color
print("red noise...")
time.sleep(0.4)
node.port.post_message("white")
print("white again...")
time.sleep(0.3)
ctx.close_sync()
print("done (processor switched colors via MessagePort)")
