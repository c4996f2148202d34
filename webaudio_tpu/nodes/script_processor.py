"""ScriptProcessorNode (deprecated API): host-callback block processing.

reference: src/node/script_processor.rs.  Buffers `buffer_size` frames,
emits an AudioProcessingEvent whose handler fills the output buffer, played
back with a fixed two-buffer latency (script_processor.rs:190-275).

TPU mapping: the user handler is host Python, so it runs inside the
compiled scan via `jax.pure_callback` — semantically exact, but each
buffer crosses the host boundary (this API is deprecated for good reason;
prefer AudioWorkletNode, which compiles user code into the graph).  Graphs
containing this node constrain the block size to a power of two so buffers
align with scan steps.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..constants import IndexSizeError, NotSupportedError
from ..graph.compiler import Kernel
from ..ops.mixing import ChannelCountMode, ChannelInterpretation
from .audio_node import AudioNode, ChannelConfig

#: Backends whose PJRT client cannot run host callbacks.  The tunneled
#: axon backend is the known case — probed live in benches/run_tpu_r4.py
#: (script_processor_probe), which fails with "UNIMPLEMENTED: axon_pjrt
#: does not support host send/recv callbacks (jax io_callback /
#: pure_callback / debug.callback)".  Rendering would only fail later,
#: deep inside the compiled scan, so fail fast at compile instead.
#: WEBAUDIO_SCRIPT_PROCESSOR=force overrides (e.g. a future axon that
#: grows callback support).
_NO_HOST_CALLBACK_PLATFORMS = ("axon",)


def _check_backend_supports_callbacks():
    import os

    if os.environ.get("WEBAUDIO_SCRIPT_PROCESSOR") == "force":
        return
    platform = jax.devices()[0].platform
    if platform in _NO_HOST_CALLBACK_PLATFORMS:
        raise NotSupportedError(
            f"ScriptProcessorNode needs jax.pure_callback, which the "
            f"'{platform}' backend does not support (axon_pjrt has no host "
            f"send/recv callbacks). Use AudioWorkletNode instead — worklet "
            f"processors compile into the render graph and run on-device. "
            f"Set WEBAUDIO_SCRIPT_PROCESSOR=force to attempt anyway.")


class AudioProcessingEvent:
    """reference: src/events.rs:62-72."""

    def __init__(self, input_buffer: np.ndarray, output_buffer: np.ndarray,
                 playback_time: float):
        self.input_buffer = input_buffer      # (C_in, buffer_size)
        self.output_buffer = output_buffer    # (C_out, buffer_size), mutable
        self.playback_time = playback_time


class _ScriptProcessorKernel(Kernel):
    def __init__(self, node, rc):
        self.node = node
        self.bufsize = node.buffer_size
        self.cin = max(1, node._n_in)
        self.cout = max(1, node._n_out)
        self.sample_rate = rc.sample_rate
        self.block = rc.block_frames

    def init_state(self):
        n = self.bufsize
        return {
            "inbuf": jnp.zeros((self.cin, n), jnp.float32),
            # two-buffer latency: the previous *processed* output plus the
            # one currently being played (reference: script_processor.rs:190)
            "outbuf": jnp.zeros((self.cout, 2 * n), jnp.float32),
        }

    def _host_process(self, chunk: np.ndarray, playback_time: np.ndarray):
        out = np.zeros((self.cout, self.bufsize), np.float32)
        handler = self.node._onaudioprocess
        if handler is not None:
            ev = AudioProcessingEvent(np.asarray(chunk), out,
                                      float(playback_time))
            handler(ev)
            out = ev.output_buffer
        return np.asarray(out, np.float32)

    def process(self, scope, state, inputs, params):
        x = inputs[0]
        B = x.shape[1]
        n = self.bufsize
        ext_in = jnp.concatenate([state["inbuf"], x], axis=1)
        outq = state["outbuf"]

        if B >= n:
            # blocks are buffer-aligned: every buffer completes within this
            # block, so process the block's own chunks; the two-buffer
            # latency comes from the carried output queue
            assert B % n == 0, "block must align with buffer_size"
            chunks = B // n
            produced = []
            for c in range(chunks):
                chunk = x[:, c * n: (c + 1) * n]
                t = (scope.frame0 + c * n).astype(jnp.float64) / self.sample_rate
                processed = jax.pure_callback(
                    self._host_process,
                    jax.ShapeDtypeStruct((self.cout, n), jnp.float32),
                    chunk, t, vmap_method="sequential")
                produced.append(processed)
            stream = jnp.concatenate([outq] + produced, axis=1)
            out = stream[:, :B]
            new_out = stream[:, B:]
            new_in = state["inbuf"]
        else:
            # B < n: accumulate; process when a buffer boundary is crossed.
            # Block sizes and buffer sizes are both powers of two here, so a
            # boundary falls exactly at a block edge.
            assert n % B == 0
            blocks_per_buf = n // B
            # position within the buffer cycle
            phase = jnp.mod(scope.frame0 // B, blocks_per_buf)
            at_boundary = phase == blocks_per_buf - 1

            def do_process(ext_in):
                chunk = ext_in[:, -n:]
                t = (scope.frame0 + B - n).astype(jnp.float64) / self.sample_rate
                return jax.pure_callback(
                    self._host_process,
                    jax.ShapeDtypeStruct((self.cout, n), jnp.float32),
                    chunk, t, vmap_method="sequential")

            # play from the current (pre-shift) queue head
            offset = (phase * B).astype(jnp.int32)
            out = jax.lax.dynamic_slice(
                outq, (jnp.int32(0), offset), (self.cout, B))
            # at the cycle boundary, process the completed input buffer and
            # rotate the queue: [playing | next] -> [next | processed]
            processed = jax.lax.cond(
                at_boundary, do_process,
                lambda _: jnp.zeros((self.cout, n), jnp.float32), ext_in)
            new_out = jnp.where(at_boundary,
                                jnp.concatenate([outq[:, n:], processed], axis=1),
                                outq)
            new_in = ext_in[:, B:]

        return {"inbuf": new_in, "outbuf": new_out}, [out.astype(jnp.float32)]


class ScriptProcessorNode(AudioNode):
    _number_of_inputs = 1
    _number_of_outputs = 1

    def __init__(self, context, buffer_size: int = 0,
                 number_of_input_channels: int = 2,
                 number_of_output_channels: int = 2):
        if buffer_size == 0:
            buffer_size = 1024
        if buffer_size not in (256, 512, 1024, 2048, 4096, 8192, 16384):
            raise IndexSizeError(
                "buffer_size must be one of 256..16384 (power of two)")
        self.buffer_size = buffer_size
        self._n_in = number_of_input_channels
        self._n_out = number_of_output_channels
        cfg = ChannelConfig(count=max(1, number_of_input_channels),
                            mode=ChannelCountMode.EXPLICIT,
                            interpretation=ChannelInterpretation.SPEAKERS)
        super().__init__(context, channel_config=cfg)
        self._onaudioprocess = None

    def set_onaudioprocess(self, handler):
        """handler(event: AudioProcessingEvent) fills event.output_buffer."""
        self._onaudioprocess = handler
        self.context._invalidate_graph_cache()

    def block_constraint(self):
        return "pow2"

    def output_channel_count(self, input_counts):
        return [max(1, self._n_out)]

    def make_kernel(self, render_ctx):
        _check_backend_supports_callbacks()
        return _ScriptProcessorKernel(self, render_ctx)
