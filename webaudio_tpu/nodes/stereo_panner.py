"""StereoPannerNode: equal-power stereo positioning.

reference: src/node/stereo_panner.rs:60-305.  gains:
left = sin((1-x)·π/2), right = sin(x·π/2); mono input maps x=(pan+1)/2,
stereo input splits by pan sign — all branchless `where` selects here.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..constants import NotSupportedError
from ..graph.compiler import Kernel
from ..ops.mixing import ChannelCountMode
from ..param import AudioParamDescriptor, AutomationRate
from .audio_node import AudioNode, AudioNodeOptions, ChannelConfig


class _StereoPannerKernel(Kernel):
    def __init__(self, mono_input: bool):
        self.mono_input = mono_input

    def tail_frames(self):
        return 0

    def process(self, scope, state, inputs, params):
        x_in = inputs[0]
        pan = params["pan"]
        half_pi = np.float32(np.pi / 2.0)
        if self.mono_input:
            x = (pan + 1.0) * 0.5
            gl = jnp.sin((1.0 - x) * half_pi)
            gr = jnp.sin(x * half_pi)
            mono = x_in[0]
            out = jnp.stack([mono * gl, mono * gr])
        else:
            l, r = x_in[0], x_in[1]
            x = jnp.where(pan <= 0.0, pan + 1.0, pan)
            gl = jnp.sin((1.0 - x) * half_pi)
            gr = jnp.sin(x * half_pi)
            left = jnp.where(pan <= 0.0, r * gl + l, l * gl)
            right = jnp.where(pan <= 0.0, r * gr, l * gr + r)
            out = jnp.stack([left, right])
        return state, [out.astype(jnp.float32)]


class StereoPannerNode(AudioNode):
    _number_of_inputs = 1
    _number_of_outputs = 1

    def __init__(self, context, pan: float = 0.0, **options):
        cfg = ChannelConfig(count=2, mode=ChannelCountMode.CLAMPED_MAX)
        super().__init__(context,
                         options=AudioNodeOptions(**options) if options else None,
                         channel_config=cfg)
        self.pan = self._register_param(
            "pan", AudioParamDescriptor(
                name="pan", automation_rate=AutomationRate.A,
                default_value=0.0, min_value=-1.0, max_value=1.0))
        if pan != 0.0:
            self.pan.set_value(pan)

    def _validate_channel_count(self, count: int):
        if count > 2:
            raise NotSupportedError(
                "StereoPannerNode channel count cannot be greater than two")

    def _validate_channel_count_mode(self, mode: ChannelCountMode):
        if mode == ChannelCountMode.MAX:
            raise NotSupportedError(
                "StereoPannerNode channel count mode cannot be set to max")

    def output_channel_count(self, input_counts):
        return [2]

    def make_kernel(self, render_ctx):
        return _StereoPannerKernel(
            mono_input=render_ctx.input_channel_counts[0] == 1)
