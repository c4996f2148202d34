"""OscillatorBankNode: fused voices match the per-node formulation."""

import numpy as np
import pytest

from webaudio_tpu import OfflineAudioContext


def test_bank_matches_individual_oscillators():
    fs, n = 48000.0, 8192
    freqs = [220.0, 331.0, 442.5]

    # naive: three OscillatorNodes summed
    ctx = OfflineAudioContext(1, n, fs)
    for f in freqs:
        o = ctx.create_oscillator(frequency=f)
        g = ctx.create_gain(gain=1.0 / 3)
        o.connect(g)
        g.connect(ctx.destination)
        o.start()
    naive = ctx.start_rendering_sync().get_channel_data(0)

    # fused bank (no envelope: attack 0, sustain 1)
    ctx2 = OfflineAudioContext(1, n, fs)
    bank = ctx2.create_oscillator_bank(
        frequencies=freqs, volumes=1.0 / 3, attacks=0.0, sustains=1.0)
    bank.connect(ctx2.destination)
    fused = ctx2.start_rendering_sync().get_channel_data(0)

    np.testing.assert_allclose(fused, naive, atol=2e-5)


def test_bank_adsr_and_stereo():
    fs, n = 48000.0, 48000
    ctx = OfflineAudioContext(2, n, fs)
    bank = ctx.create_oscillator_bank(
        frequencies=[440.0], starts=[0.1], stops=[0.5],
        attacks=0.05, decays=0.1, sustains=0.5, releases=0.05,
        stereo=True, pans=[-1.0])
    bank.connect(ctx.destination)
    out = ctx.start_rendering_sync()
    l, r = out.get_channel_data(0), out.get_channel_data(1)
    assert np.all(l[: int(0.1 * fs)] == 0.0)            # before start
    assert np.abs(l[int(0.44 * fs):int(0.5 * fs)]).max() == \
        pytest.approx(0.5, abs=0.03)                     # sustain level
    assert np.abs(l[int(0.9 * fs):]).max() < 1e-3        # released
    assert np.abs(r).max() < 1e-6                        # hard-left pan
