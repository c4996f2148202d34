"""Checkpoint/resume of render state (RenderSession)."""

import numpy as np

from webaudio_tpu import OfflineAudioContext
from webaudio_tpu.checkpoint import RenderSession


def _build(fs=48000.0, n=4096):
    ctx = OfflineAudioContext(1, n, fs)
    osc = ctx.create_oscillator(frequency=440.0)
    d = ctx.create_delay(max_delay_time=0.01)
    d.delay_time.value = 0.005
    osc.connect(d)
    d.connect(ctx.destination)
    osc.start()
    return ctx


def test_incremental_matches_oneshot(tmp_path):
    fs, n = 48000.0, 4096
    # one-shot render
    ctx = _build(fs, n)
    full = ctx.start_rendering_sync().get_channel_data(0)

    # incremental with checkpoint in the middle
    ctx2 = _build(fs, n)
    s = RenderSession(ctx2, quanta_per_block=8)
    first = s.step(2048)
    ck = str(tmp_path / "ck.npz")
    s.save(ck)

    ctx3 = _build(fs, n)
    s2 = RenderSession(ctx3, quanta_per_block=8)
    s2.restore(ck)
    assert s2.frame == 2048
    second = s2.step(2048)

    got = np.concatenate([first[0], second[0]])
    # sessions stream dense params (phase via cumsum) while the one-shot
    # render const-folds the oscillator to closed-form phase; both are
    # within ~1e-6 of the exact value
    np.testing.assert_allclose(got, full, atol=5e-6)
