"""HRTF panning model tests (reference: panner.rs HRTF path + hrtf crate)."""

import numpy as np
import pytest

from webaudio_tpu import OfflineAudioContext
from webaudio_tpu.nodes.hrtf import load_hrir_sphere


def test_sphere_parses():
    positions, faces, spectra, K = load_hrir_sphere(44100.0)
    assert positions.shape == (187, 3)
    assert faces.shape[1] == 3
    assert spectra.shape[0] == 187 and spectra.shape[1] == 2
    # unit-ish sphere positions
    r = np.linalg.norm(positions, axis=1)
    assert r.min() > 0.1


def _render_hrtf(x_pos, z_pos, fs=44100.0, n=4096):
    ctx = OfflineAudioContext(2, n, fs)
    src = ctx.create_constant_source(offset=0.0)
    # impulse train source via buffer for broadband content
    buf = ctx.create_buffer(1, n, fs)
    data = np.zeros(n, np.float32)
    data[::512] = 1.0
    buf.copy_to_channel(data, 0)
    bs = ctx.create_buffer_source()
    bs.buffer = buf
    p = ctx.create_panner(panning_model="HRTF", position_x=x_pos,
                          position_z=z_pos)
    bs.connect(p)
    p.connect(ctx.destination)
    bs.start()
    out = ctx.start_rendering_sync().to_array()
    return np.asarray(out)


def test_hrtf_lateralization():
    left_src = _render_hrtf(-3.0, 0.0)
    right_src = _render_hrtf(3.0, 0.0)
    rms = lambda a: np.sqrt((a.astype(np.float64) ** 2).mean())
    # source on the left: left ear louder, and vice versa
    assert rms(left_src[0]) > rms(left_src[1]) * 1.5
    assert rms(right_src[1]) > rms(right_src[0]) * 1.5
    # mirror symmetry approximately holds
    assert rms(left_src[0]) == pytest.approx(rms(right_src[1]), rel=0.2)


def test_hrtf_itd_delay():
    # interaural time difference: left-side source reaches left ear first
    out = _render_hrtf(-3.0, 0.0)
    l, r = out[0], out[1]
    # find first significant onset in each ear
    thresh = 0.05 * max(np.abs(l).max(), np.abs(r).max())
    first_l = int(np.argmax(np.abs(l) > thresh))
    first_r = int(np.argmax(np.abs(r) > thresh))
    assert first_l < first_r, (first_l, first_r)


def test_hrtf_nonzero_and_finite_at_other_rate():
    out = _render_hrtf(0.0, -3.0, fs=48000.0)
    assert np.isfinite(out).all()
    assert np.abs(out).max() > 0.0


def test_hrtf_crossfade_smooths_motion():
    """The hrtf crate crossfades prev->new HRIR within each quantum and
    lerps the distance gain (panner.rs:215-271): an orbiting source must
    not click at quantum boundaries, and the first block fades in from
    silence (initial prev gain is 0)."""
    import numpy as np
    from webaudio_tpu import OfflineAudioContext

    fs = 48000.0
    ctx = OfflineAudioContext(2, 4096, fs)
    o = ctx.create_oscillator(frequency=330.0)
    p = ctx.create_panner(panning_model="HRTF")
    for ti in np.arange(0, 4096 / fs, 128 / fs):
        ang = 2 * np.pi * ti * 20  # 20 rev/s
        p.position_x.set_value_at_time(float(np.sin(ang) * 2), float(ti))
        p.position_z.set_value_at_time(float(np.cos(ang) * 2), float(ti))
    o.connect(p)
    p.connect(ctx.destination)
    o.start()
    out = ctx.start_rendering_sync().to_array()

    assert out[0, 0] == 0.0  # fade-in from the crate's initial gain 0
    d = np.abs(np.diff(out[0]))
    boundary = d[127::128]
    within = np.delete(d, np.arange(127, len(d), 128))
    # without the crossfade the boundary jumps are ~5x the within-quantum
    # ones; with it they sit at parity
    assert boundary.max() < 2.0 * within.max()
