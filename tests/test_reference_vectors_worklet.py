"""AudioWorklet test transcriptions (reference: src/worklet.rs `mod tests`).

The reference's host-thread processors become JAX processors here; its
"has the processor run" AtomicBool flags become carried state read back
through the offline render's `_on_render_state` hook — the functional
analog of a render-thread side effect.
"""

import numpy as np
import pytest
import jax.numpy as jnp

from webaudio_tpu import OfflineAudioContext, AudioWorkletProcessor
from webaudio_tpu.constants import NotSupportedError


class SilenceProcessor(AudioWorkletProcessor):
    """The reference's TestProcessor: leaves every output silent.

    Output arity/channels ride through processor options since the
    processor itself builds its output arrays."""

    def __init__(self, options=None, port=None):
        super().__init__(options=options, port=port)
        opts = options or {}
        self.n_out = opts.get("n_out", 1)
        self.ch = opts.get("ch")

    def process(self, scope, state, inputs, params):
        ch = self.ch or [1] * self.n_out
        outs = [jnp.zeros((c, scope.frames), jnp.float32) for c in ch]
        return state, outs


class CountingProcessor(AudioWorkletProcessor):
    """worklet.rs SetBoolWhenRunProcessor — proves process() ran."""

    def init_state(self, rc):
        return {"count": jnp.zeros((), jnp.float32)}

    def process(self, scope, state, inputs, params):
        return {"count": state["count"] + 1.0}, []


def test_worklet_render():
    # worklet.rs test_worklet_render
    ctx = OfflineAudioContext(1, 128, 48000.0)
    node = ctx.create_audio_worklet(SilenceProcessor)
    node.connect(ctx.destination)
    out = ctx.start_rendering_sync().get_channel_data(0)
    np.testing.assert_array_equal(out, np.zeros(128))


def test_worklet_inputs_outputs_matrix():
    # worklet.rs test_worklet_inputs_outputs — every (inputs, outputs)
    # combination in 0..=2 except (0, 0) constructs and renders silence
    ctx = OfflineAudioContext(1, 128, 48000.0)
    for n_in in (0, 1, 2):
        for n_out in (0, 1, 2):
            if n_in == 0 and n_out == 0:
                continue
            node = ctx.create_audio_worklet(
                SilenceProcessor,
                number_of_inputs=n_in, number_of_outputs=n_out,
                processor_options={"n_out": n_out})
            if n_out > 0:
                node.connect(ctx.destination)
    out = ctx.start_rendering_sync().get_channel_data(0)
    np.testing.assert_array_equal(out, np.zeros(128))


def test_worklet_zero_inputs_and_outputs_rejected():
    ctx = OfflineAudioContext(1, 128, 48000.0)
    with pytest.raises(NotSupportedError):
        ctx.create_audio_worklet(SilenceProcessor,
                                 number_of_inputs=0, number_of_outputs=0)


def test_worklet_only_input():
    # worklet.rs test_worklet_only_input — a 1-in 0-out processor still
    # runs every block (its carried state advances)
    ctx = OfflineAudioContext(1, 128, 48000.0)
    node = ctx.create_audio_worklet(CountingProcessor,
                                    number_of_inputs=1, number_of_outputs=0)
    seen = []
    node._on_render_state = lambda st: seen.append(st)
    ctx.start_rendering_sync()
    assert seen and float(np.asarray(seen[0]["count"])) > 0.0


def test_worklet_output_channel_count():
    # worklet.rs test_worklet_output_channel_count — [] means default;
    # [1] mono; [1, 2] across two output ports
    ctx = OfflineAudioContext(1, 128, 48000.0)
    w1 = ctx.create_audio_worklet(SilenceProcessor, output_channel_count=[])
    w1.connect(ctx.destination)
    w2 = ctx.create_audio_worklet(SilenceProcessor,
                                  output_channel_count=[1],
                                  processor_options={"ch": [1]})
    w2.connect(ctx.destination)
    w3 = ctx.create_audio_worklet(SilenceProcessor,
                                  number_of_outputs=2,
                                  output_channel_count=[1, 2],
                                  processor_options={"n_out": 2,
                                                     "ch": [1, 2]})
    w3.connect(ctx.destination)
    out = ctx.start_rendering_sync().get_channel_data(0)
    np.testing.assert_array_equal(out, np.zeros(128))


def test_worklet_invalid_output_channel_count():
    ctx = OfflineAudioContext(1, 128, 48000.0)
    from webaudio_tpu.constants import IndexSizeError
    with pytest.raises(IndexSizeError):
        ctx.create_audio_worklet(SilenceProcessor,
                                 number_of_outputs=2,
                                 output_channel_count=[1])
    with pytest.raises(NotSupportedError):
        ctx.create_audio_worklet(SilenceProcessor,
                                 output_channel_count=[33])
