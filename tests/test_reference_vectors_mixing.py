"""Render-quantum mixing test vectors transcribed from the reference's
unit tests (reference: src/render/quantum.rs `mod tests`,
test_audiobuffer_mix_discrete / upmix_speakers / downmix_speakers),
asserted directly against ops.mixing.mix — the engine's AudioRenderQuantum
mix analog.
"""

import numpy as np

from webaudio_tpu.ops.mixing import ChannelInterpretation, mix

S = np.float32(np.sqrt(0.5))


def _mix(rows, c_out, interp=ChannelInterpretation.SPEAKERS):
    x = np.repeat(np.asarray(rows, np.float32)[:, None], 8, axis=1)
    out = np.asarray(mix(x, c_out, interp))
    # every sample in a row is identical; return the per-channel scalars
    assert np.all(out == out[:, :1])
    return out[:, 0]


def test_mix_discrete():
    # quantum.rs test_audiobuffer_mix_discrete — discrete keeps the first
    # channels and zero-fills the rest
    np.testing.assert_allclose(
        _mix([1.0], 2, ChannelInterpretation.DISCRETE), [1.0, 0.0])
    np.testing.assert_allclose(
        _mix([1.0, 0.5], 1, ChannelInterpretation.DISCRETE), [1.0])


def test_upmix_speakers():
    # quantum.rs test_audiobuffer_upmix_speakers
    np.testing.assert_allclose(_mix([1.0], 1), [1.0])           # 1 -> 1
    np.testing.assert_allclose(_mix([1.0], 2), [1.0, 1.0])      # 1 -> 2
    np.testing.assert_allclose(_mix([1.0], 4), [1.0, 1.0, 0.0, 0.0])
    np.testing.assert_allclose(                                  # 1 -> 5.1
        _mix([1.0], 6), [0.0, 0.0, 1.0, 0.0, 0.0, 0.0])
    np.testing.assert_allclose(                                  # 2 -> 4
        _mix([1.0, 0.5], 4), [1.0, 0.5, 0.0, 0.0])
    np.testing.assert_allclose(                                  # 2 -> 5.1
        _mix([1.0, 0.5], 6), [1.0, 0.5, 0.0, 0.0, 0.0, 0.0])
    np.testing.assert_allclose(                                  # 4 -> 5.1
        _mix([1.0, 0.75, 0.5, 0.25], 6),
        [1.0, 0.75, 0.0, 0.0, 0.5, 0.25])


def test_downmix_speakers_to_mono():
    # 2 -> 1: 0.5 * (L + R)
    np.testing.assert_allclose(_mix([1.0, 0.5], 1), [0.75])
    # 4 -> 1: 0.25 * (L + R + SL + SR)
    np.testing.assert_allclose(_mix([1.0, 0.75, 0.5, 0.25], 1), [0.625])
    # 5.1 -> 1: sqrt(0.5)*(L+R) + C + 0.5*(SL+SR)
    expected = S * (1.0 + 0.9) + np.float32(0.8) + \
        np.float32(0.5) * (0.6 + 0.5)
    np.testing.assert_allclose(
        _mix([1.0, 0.9, 0.8, 0.7, 0.6, 0.5], 1), [expected], rtol=1e-6)


def test_downmix_speakers_to_stereo():
    # 4 -> 2: L' = 0.5*(L+SL), R' = 0.5*(R+SR)
    np.testing.assert_allclose(
        _mix([0.25, 0.5, 0.75, 1.0], 2), [0.5, 0.75])
    # 5.1 -> 2: L' = L + sqrt(0.5)*(C+SL), R' = R + sqrt(0.5)*(C+SR)
    left = np.float32(1.0) + S * (0.8 + 0.6)
    right = np.float32(0.9) + S * (0.8 + 0.5)
    np.testing.assert_allclose(
        _mix([1.0, 0.9, 0.8, 0.7, 0.6, 0.5], 2), [left, right], rtol=1e-6)


def test_downmix_speakers_to_quad():
    # 5.1 -> 4: L' = L + sqrt(0.5)*C, R' = R + sqrt(0.5)*C, SL, SR
    left = np.float32(1.0) + S * np.float32(0.8)
    right = np.float32(0.9) + S * np.float32(0.8)
    np.testing.assert_allclose(
        _mix([1.0, 0.9, 0.8, 0.7, 0.6, 0.5], 4),
        [left, right, 0.6, 0.5], rtol=1e-6)
