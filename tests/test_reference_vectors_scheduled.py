"""AudioScheduledSourceNode lifecycle test transcriptions
(reference: src/node/scheduled_source.rs `mod tests`): the onended event
matrix (explicit / none / exact-at-end / implicit), start-twice and
stop-before-start panics, and stop-twice being allowed — each across
constant source, buffer source, and oscillator.
"""

import numpy as np
import pytest

from webaudio_tpu import OfflineAudioContext
from webaudio_tpu.buffer import AudioBuffer
from webaudio_tpu.constants import InvalidStateError


def _sources(ctx):
    def constant(c):
        return c.create_constant_source()

    def buffer(c):
        src = c.create_buffer_source()
        src.buffer = AudioBuffer.from_array(
            np.ones((1, 44100), np.float32), 44100.0)
        return src

    def oscillator(c):
        return c.create_oscillator()

    return [constant, buffer, oscillator]


def _run_each(run):
    ctx = OfflineAudioContext(2, 44100, 44100.0)
    for make in _sources(ctx):
        ctx = OfflineAudioContext(2, 44100, 44100.0)
        run(ctx, make(ctx))


def test_ended_event():
    def run(ctx, src):
        src.connect(ctx.destination)
        src.start(0.0)
        src.stop(0.5)
        fired = []
        src.set_onended(lambda *a: fired.append(True))
        ctx.start_rendering_sync()
        assert fired == [True]

    _run_each(run)


def test_no_ended_event_when_never_started():
    def run(ctx, src):
        src.connect(ctx.destination)
        fired = []
        src.set_onended(lambda *a: fired.append(True))
        ctx.start_rendering_sync()
        assert fired == []

    _run_each(run)


def test_exact_ended_event():
    # stop exactly at the end of the offline buffer still fires
    def run(ctx, src):
        src.connect(ctx.destination)
        src.start(0.0)
        src.stop(1.0)
        fired = []
        src.set_onended(lambda *a: fired.append(True))
        ctx.start_rendering_sync()
        assert fired == [True]

    _run_each(run)


def test_implicit_ended_event():
    # no explicit stop: the source ends with the offline context
    def run(ctx, src):
        src.connect(ctx.destination)
        src.start(0.0)
        fired = []
        src.set_onended(lambda *a: fired.append(True))
        ctx.start_rendering_sync()
        assert fired == [True]

    _run_each(run)


def test_start_twice_raises():
    def run(ctx, src):
        src.start()
        with pytest.raises(InvalidStateError):
            src.start()

    _run_each(run)


def test_stop_before_start_raises():
    def run(ctx, src):
        with pytest.raises(InvalidStateError):
            src.stop()

    _run_each(run)


def test_stop_twice_allowed():
    # reference: scheduled_source.rs run_stop_twice (issue #579)
    def run(ctx, src):
        src.start()
        src.stop()
        src.stop()

    _run_each(run)
