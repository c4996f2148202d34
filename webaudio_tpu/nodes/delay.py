"""DelayNode: fractional delay line, the graph's cycle breaker.

reference: src/node/delay.rs.  The reference splits the node into a
DelayWriter and DelayReader sharing a ring buffer of render quanta
(delay.rs:376-684); when the node sits in a cycle the writer->reader edge is
dropped and the delay clamps to >= one render quantum (delay.rs:535-542,
699-703).

TPU design: the ring is a `(channels, R)` tensor carried in the scan state,
with R a block multiple >= max_delay + block.  The writer is one
`dynamic_update_slice` per block; the reader is a vectorized fractional
gather at per-sample positions `t - delay*fs` (the reference's per-sample
PlaybackInfo loop, delay.rs:560-688, collapses into one gather + lerp).
"""

from __future__ import annotations

import math

import numpy as np
import jax.numpy as jnp
import jax

from ..constants import RENDER_QUANTUM_SIZE, NotSupportedError
from ..graph.compiler import Kernel
from ..param import AudioParamDescriptor, AutomationRate
from .audio_node import AudioNode, AudioNodeOptions


class _DelayKernel(Kernel):
    def __init__(self, channels: int, ring_frames: int, block: int,
                 sample_rate: float, in_cycle: bool):
        self.channels = channels
        self.R = ring_frames
        self.block = block
        self.sample_rate = sample_rate
        self.in_cycle = in_cycle

    def tail_frames(self):
        return None if self.in_cycle else self.R

    def init_state(self):
        return {"ring": jnp.zeros((self.channels, self.R), jnp.float32)}

    # --- writer (reference: delay.rs:430-466) --------------------------
    def process_writer(self, scope, state, inputs, params):
        x = inputs[0]
        # mix to the ring's channel count happens in fan-in already
        pos = jnp.mod(scope.frame0, self.R).astype(jnp.int32)
        ring = jax.lax.dynamic_update_slice(
            state["ring"], x, (jnp.int32(0), pos))
        return {"ring": ring}

    # --- reader (reference: delay.rs:516-688) ---------------------------
    def process_reader(self, scope, state, params):
        ring = state["ring"]
        # () or (B,) seconds, clamped to max.  All playhead math is f64, as
        # in the reference (delay.rs:688-706): an f32 clamp of the quantum
        # duration would put the read position ~1e-6 samples off an exact
        # integer delay and leak interpolation error into sample-accurate
        # echoes (delay.rs test_min_delay_when_in_loop asserts abs <= 0).
        delay = params["delay_time"].astype(jnp.float64)
        if self.in_cycle:
            quantum_duration = RENDER_QUANTUM_SIZE / self.sample_rate
            delay = jnp.maximum(delay, quantum_duration)
        # continuous global read position per sample: t - delay*fs.
        B = scope.frames
        if delay.ndim == 0:
            # scalar delay: f64 only on the scalar, vector math stays int/f32
            num = delay * self.sample_rate
            n_int = jnp.floor(num)
            k0 = (num - n_int).astype(jnp.float32)          # fractional part
            exact = k0 == 0.0
            # delay*fs integer => k0 == 0 => read exactly at t - n
            start = (scope.frame0 - n_int.astype(jnp.int32) - 1
                     + jnp.where(exact, jnp.int32(1), jnp.int32(0)))
            ks = jnp.where(exact, jnp.float32(0.0), 1.0 - k0)  # scalar lerp
            # consecutive read positions: TWO contiguous dynamic slices on a
            # wrap-extended ring instead of a (C, B) gather (gathers run at
            # ~7 ns/row on TPU; the constant-delay read is the hot op of
            # every feedback-delay network)
            ext = jnp.concatenate([ring, ring[:, : B + 1]], axis=1)
            sm = jnp.mod(start, self.R)
            a = jax.lax.dynamic_slice(ext, (jnp.int32(0), sm),
                                      (self.channels, B))
            b = jax.lax.dynamic_slice(ext, (jnp.int32(0), sm + 1),
                                      (self.channels, B))
            out = (1.0 - ks) * a + ks * b
            # reads from before the first written sample are silent
            prev_i = start + jnp.arange(B, dtype=jnp.int32)
            out = jnp.where((prev_i >= 0)[None, :], out,
                            jnp.where((prev_i + 1 >= 0)[None, :], ks * b, 0.0))
            return state, [out.astype(jnp.float32)]
        t = scope.t_idx.astype(jnp.float64)
        pos = t - delay.astype(jnp.float64) * self.sample_rate
        prev = jnp.floor(pos)
        k = (pos - prev).astype(jnp.float32)
        prev_i = prev.astype(jnp.int32)
        next_i = prev_i + 1
        # ring addressing: R >= max_delay + block makes the mapping unique;
        # positions before stream start read the zero-initialized region
        prev_m = jnp.mod(prev_i, self.R)
        next_m = jnp.mod(next_i, self.R)
        a = ring[:, prev_m]       # (C, B)
        b = ring[:, next_m]
        out = (1.0 - k) * a + k * b
        # reads from before the first written sample are silent
        valid = prev_i >= 0
        out = jnp.where(valid[None, :], out, jnp.where((next_i >= 0)[None, :], k * b, 0.0))
        return state, [out.astype(jnp.float32)]

    def process(self, scope, state, inputs, params):  # pragma: no cover
        raise AssertionError("DelayNode always runs as writer/reader pair")


class DelayNode(AudioNode):
    _number_of_inputs = 1
    _number_of_outputs = 1
    is_cycle_breaker = True

    def __init__(self, context, max_delay_time: float = 1.0,
                 delay_time: float = 0.0, **options):
        if not (0.0 < max_delay_time < 180.0):
            raise NotSupportedError(
                "maxDelayTime MUST be greater than zero and less than three minutes")
        self._max_delay_time = float(max_delay_time)
        super().__init__(context,
                         options=AudioNodeOptions(**options) if options else None)
        self.delay_time = self._register_param(
            "delay_time",
            AudioParamDescriptor(
                name="delay_time", automation_rate=AutomationRate.A,
                default_value=0.0, min_value=0.0, max_value=self._max_delay_time))
        if delay_time != 0.0:
            self.delay_time.set_value(delay_time)

    @property
    def max_delay_time(self) -> float:
        return self._max_delay_time

    def make_kernel(self, render_ctx):
        B = render_ctx.block_frames
        max_frames = int(math.ceil(self._max_delay_time * render_ctx.sample_rate))
        # unique mod-R addressing requires R >= max_delay + B (+1 sample for
        # the lerp neighbor), rounded up to a block multiple
        R = (-(-(max_frames + B + 1) // B)) * B
        c = max(1, render_ctx.input_channel_counts[0])
        return _DelayKernel(c, R, B, render_ctx.sample_rate,
                            in_cycle=render_ctx.in_cycle)
