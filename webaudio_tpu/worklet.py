"""AudioWorklet: user-defined audio processors.

reference: src/worklet.rs.  The reference's `AudioWorkletProcessor` trait
(constructor options, `parameter_descriptors()`, `process(inputs, outputs,
params, scope) -> bool`, worklet.rs:50-114) maps directly onto the engine's
functional kernel protocol: a processor declares params and implements

    init_state(render_ctx) -> pytree
    process(scope, state, inputs, params) -> (state', outputs)

with `inputs` a list of (channels, block) arrays and params dense tensors —
i.e. user processors are written in JAX and get compiled into the same XLA
computation as built-in nodes (instead of being interpreted per quantum on
an audio thread).  MessagePort messaging is control-side and takes effect
at trace boundaries (construction / suspend re-traces), mirroring how the
reference delivers messages between render quanta (worklet.rs:301-321).
"""

from __future__ import annotations

from typing import Any, Callable, Optional

from .constants import IndexSizeError, NotSupportedError
from .graph.compiler import Kernel
from .nodes.audio_node import AudioNode, AudioNodeOptions
from .param import AudioParamDescriptor


class MessagePort:
    """Bidirectional control<->processor channel
    (reference: src/message_port.rs:1-54)."""

    def __init__(self):
        self._onmessage: Optional[Callable] = None
        self._peer: Optional["MessagePort"] = None
        self._pending: list = []

    @staticmethod
    def pair() -> tuple["MessagePort", "MessagePort"]:
        a, b = MessagePort(), MessagePort()
        a._peer, b._peer = b, a
        return a, b

    def set_onmessage(self, cb: Callable):
        self._onmessage = cb
        # deliver anything posted before a handler existed (the reference's
        # channel buffers messages until the render thread drains them,
        # worklet.rs onmessage / message_port.rs) — with lazy processor
        # construction the node may post before the processor exists
        pending, self._pending = self._pending, []
        for msg in pending:
            cb(msg)

    def post_message(self, msg: Any):
        if self._peer is None:
            return
        if self._peer._onmessage is not None:
            self._peer._onmessage(msg)
        else:
            self._peer._pending.append(msg)


class AudioWorkletProcessor:
    """Base class for user processors (reference: worklet.rs:50-114)."""

    def __init__(self, options: Optional[dict] = None, port: Optional[MessagePort] = None):
        self.options = options or {}
        self.port = port

    @classmethod
    def parameter_descriptors(cls) -> list[AudioParamDescriptor]:
        return []

    def init_state(self, render_ctx):
        return None

    def process(self, scope, state, inputs, params):
        """Return (state', [outputs]) — pure JAX code, traced once."""
        raise NotImplementedError


class _WorkletKernel(Kernel):
    def __init__(self, processor: AudioWorkletProcessor, rc, n_outputs: int,
                 output_channel_count):
        import os

        self.processor = processor
        self.rc = rc
        self.n_outputs = n_outputs
        self.output_channel_count = output_channel_count
        # opt-in per processor class or globally via env (mirrors the
        # reference's cargo feature, off by default)
        self.spec_inputs = bool(
            getattr(processor, "spec_compliant_inputs", False)
            or os.environ.get("WEBAUDIO_SPEC_WORKLET_INPUTS") == "1")

    def init_state(self):
        return self.processor.init_state(self.rc)

    def tail_frames(self):
        # processors may declare a bounded state history to opt in to
        # time-sharded rendering (parallel/segments.py)
        hook = getattr(self.processor, "tail_frames", None)
        return hook() if hook is not None else None

    def process(self, scope, state, inputs, params):
        if self.spec_inputs:
            # spec-compliant empty-input distinction (the reference's
            # `spec-compliant-worklet-inputs` feature, worklet.rs:367-385
            # + Cargo.toml:104-107): a DISCONNECTED input port is a
            # zero-channel array, a connected-but-silent one stays (C, B)
            # zeros — processors can tell the two apart
            import jax.numpy as jnp

            connected = self.rc.input_connected
            inputs = [x if (i < len(connected) and connected[i])
                      else jnp.zeros((0, x.shape[1]), x.dtype)
                      for i, x in enumerate(inputs)]
        state, outputs = self.processor.process(scope, state, inputs, params)
        if not isinstance(outputs, (list, tuple)):
            outputs = [outputs]
        return state, list(outputs)


class AudioWorkletNode(AudioNode):
    """reference: worklet.rs:125-289."""

    def __init__(self, context, processor_cls, number_of_inputs: int = 1,
                 number_of_outputs: int = 1,
                 output_channel_count: Optional[list[int]] = None,
                 parameter_data: Optional[dict] = None,
                 processor_options: Optional[dict] = None,
                 **options):
        if number_of_inputs == 0 and number_of_outputs == 0:
            raise NotSupportedError(
                "number_of_inputs and number_of_outputs cannot both be zero")
        self._number_of_inputs = int(number_of_inputs)
        self._number_of_outputs = int(number_of_outputs)
        if output_channel_count is not None and len(output_channel_count) == 0:
            # [spec]/reference: an empty sequence means "not specified"
            # (worklet.rs test_worklet_output_channel_count options1)
            output_channel_count = None
        if output_channel_count is not None:
            if len(output_channel_count) != number_of_outputs:
                raise IndexSizeError(
                    "output_channel_count length must equal number_of_outputs")
            for c in output_channel_count:
                if not (1 <= c <= 32):
                    raise NotSupportedError("invalid output channel count")
        self._output_channel_count = output_channel_count
        super().__init__(context,
                         options=AudioNodeOptions(**options) if options else None)

        node_port, proc_port = MessagePort.pair()
        self.port = node_port
        # processor constructed LAZILY at first compile — the analog of the
        # reference constructing it on the render thread at the first
        # quantum (worklet.rs:301-321): node creation never runs user code;
        # a constructor that throws surfaces at compile/render time and is
        # isolated like any processor failure
        self._processor_cls = processor_cls
        self._processor_options = processor_options
        self._proc_port = proc_port
        self._processor = None
        self._parameters: dict[str, Any] = {}
        for desc in processor_cls.parameter_descriptors():
            p = self._register_param(desc.name, desc)
            self._parameters[desc.name] = p
            if parameter_data and desc.name in parameter_data:
                p.set_value(parameter_data[desc.name])

    @property
    def parameters(self) -> dict:
        """Named AudioParam map (reference: worklet.rs:245-257)."""
        return dict(self._parameters)

    def output_channel_count(self, input_counts):
        if self._output_channel_count is not None:
            return list(self._output_channel_count)
        # [spec] defaults: 1 in 1 out -> follow input; else mono outputs
        if self._number_of_inputs == 1 and self._number_of_outputs == 1:
            return [max(1, input_counts[0] if input_counts else 1)]
        return [1] * self._number_of_outputs

    def make_kernel(self, render_ctx):
        if self._processor is None:
            self._processor = self._processor_cls(
                options=self._processor_options, port=self._proc_port)
        return _WorkletKernel(self._processor, render_ctx,
                              self._number_of_outputs,
                              self._output_channel_count)
