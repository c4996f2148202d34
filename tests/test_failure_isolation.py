"""Processor failure isolation (reference: tests/processor_error.rs —
a panicking worklet is removed, an ErrorEvent fires, the graph continues)."""

import numpy as np

from webaudio_tpu import OfflineAudioContext, AudioWorkletProcessor


class ExplodingProcessor(AudioWorkletProcessor):
    def process(self, scope, state, inputs, params):
        raise RuntimeError("boom")


def test_failing_node_is_isolated():
    fs = 48000.0
    ctx = OfflineAudioContext(1, 256, fs)
    good = ctx.create_constant_source(offset=0.5)
    good.connect(ctx.destination)
    good.start()

    bad_src = ctx.create_constant_source(offset=1.0)
    bad = ctx.create_audio_worklet(ExplodingProcessor)
    errors = []
    bad.set_onprocessorerror(lambda e: errors.append(e))
    bad_src.connect(bad)
    bad.connect(ctx.destination)
    bad_src.start()

    out = ctx.start_rendering_sync().get_channel_data(0)
    # the failing node went silent; the healthy path still rendered
    np.testing.assert_allclose(out, 0.5, atol=1e-7)
    assert errors and "boom" in str(errors[0])
