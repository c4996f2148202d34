"""IIRFilterNode test vectors transcribed from the reference's unit tests
(reference: src/node/iir_filter.rs `mod tests`).

Covers coefficient validation, frequency-response argument validation,
the one-zero literal vector, the scipy cheby2 magnitude-response vector,
and the iir-vs-biquad equivalence corpus: the reference feeds the IIR node
the UNNORMALIZED biquad coefficients for all 8 filter types and asserts
the two nodes render identically (iir_filter.rs test_output_against_biquad).
The coefficient literals below are the reference's own.
"""

import numpy as np
import pytest

from webaudio_tpu import OfflineAudioContext
from webaudio_tpu.buffer import AudioBuffer
from webaudio_tpu.constants import (NotSupportedError, InvalidStateError,
                                    InvalidAccessError)

LENGTH = 512


def test_constructor_and_factory():
    # iir_filter.rs test_constructor_and_factory
    ctx = OfflineAudioContext(2, LENGTH, 44100.0)
    from webaudio_tpu.nodes.iir_filter import IIRFilterNode
    IIRFilterNode(ctx, feedforward=[1.0] * 3, feedback=[1.0] * 3)
    ctx2 = OfflineAudioContext(2, LENGTH, 44100.0)
    ctx2.create_iir_filter([1.0] * 3, [1.0] * 3)


def test_invalid_feedforward_size():
    ctx = OfflineAudioContext(2, LENGTH, 44100.0)
    with pytest.raises(NotSupportedError):
        ctx.create_iir_filter([1.0] * 21, [1.0] * 3)


def test_invalid_feedforward_values():
    ctx = OfflineAudioContext(2, LENGTH, 44100.0)
    with pytest.raises(InvalidStateError):
        ctx.create_iir_filter([0.0] * 5, [1.0] * 3)


def test_valid_feedforward_values():
    ctx = OfflineAudioContext(2, LENGTH, 44100.0)
    ctx.create_iir_filter([1.0] * 5, [1.0] * 3)


def test_invalid_feedback_size():
    ctx = OfflineAudioContext(2, LENGTH, 44100.0)
    with pytest.raises(NotSupportedError):
        ctx.create_iir_filter([1.0] * 3, [1.0] * 21)


def test_invalid_feedback_values():
    ctx = OfflineAudioContext(2, LENGTH, 44100.0)
    fb = [1.0] * 5
    fb[0] = 0.0
    with pytest.raises(InvalidStateError):
        ctx.create_iir_filter([1.0] * 3, fb)


def test_valid_feedback_values():
    ctx = OfflineAudioContext(2, LENGTH, 44100.0)
    ctx.create_iir_filter([1.0] * 3, [1.0] * 5)


@pytest.mark.parametrize("mag_len,phase_len", [(2, 1), (1, 2)])
def test_frequency_response_arguments(mag_len, phase_len):
    # iir_filter.rs test_frequency_response_arguments{,_2} (should_panic)
    ctx = OfflineAudioContext(2, 555, 44100.0)
    iir = ctx.create_iir_filter([1.0] * 10, [1.0] * 10)
    with pytest.raises(InvalidAccessError):
        iir.get_frequency_response(
            np.zeros(1, np.float32),
            np.zeros(mag_len, np.float32),
            np.zeros(phase_len, np.float32))


def test_one_zero_with_feedback_feedforward_different_length():
    # iir_filter.rs — a pure FIR [0.5, 0.5] against an impulse
    fs = 24000.0
    ctx = OfflineAudioContext(1, 8000, fs)
    src = ctx.create_buffer_source()
    src.buffer = AudioBuffer.from_array(np.ones((1, 1), np.float32), fs)
    iir = ctx.create_iir_filter([0.5, 0.5], [1.0])
    src.connect(iir)
    iir.connect(ctx.destination)
    src.start()
    out = ctx.start_rendering_sync().get_channel_data(0)
    expected = np.zeros(8000, np.float32)
    expected[0] = 0.5
    expected[1] = 0.5
    np.testing.assert_allclose(out, expected, atol=1e-6)


# the reference's unnormalized biquad coefficients for frequency=2000,
# q=1, gain=3 at fs=44100 (iir_filter.rs test_output_against_biquad; the
# values come from biquad_filter.rs test_frequency_responses)
_COEFS = {
    "lowpass": ([1.1252702717383296, -1.9193504546709936, 0.8747297282616704],
                [0.02016238633225159, 0.04032477266450318,
                 0.02016238633225159]),
    "highpass": ([1.1252702717383296, -1.9193504546709936,
                  0.8747297282616704],
                 [0.9798376136677485, -1.959675227335497,
                  0.9798376136677485]),
    "bandpass": ([1.1405555566658274, -1.9193504546709936,
                  0.8594444433341726],
                 [0.14055555666582747, 0.0, -0.14055555666582747]),
    "notch": ([1.1405555566658274, -1.9193504546709936, 0.8594444433341726],
              [1.0, -1.9193504546709936, 1.0]),
    "allpass": ([1.1405555566658274, -1.9193504546709936,
                 0.8594444433341726],
                [0.8594444433341726, -1.9193504546709936,
                 1.1405555566658274]),
    "peaking": ([1.1182627625098631, -1.9193504546709936,
                 0.8817372374901369],
                [1.167050592175986, -1.9193504546709936,
                 0.8329494078240139]),
    "lowshelf": ([2.8028072429836723, -4.577507200153761, 1.935999047828101],
                 [2.9011403634599007, -4.544236234748791,
                  1.8709368927568424]),
    "highshelf": ([2.4410054070459357, -3.8234982904056865,
                   1.5741972118903644],
                  [3.331142651362703, -5.440377503491735,
                   2.300939180659645]),
}


def _render_filtered(noise, make_node):
    ctx = OfflineAudioContext(1, 1000, 44100.0)
    node = make_node(ctx)
    node.connect(ctx.destination)
    src = ctx.create_buffer_source()
    src.connect(node)
    src.buffer = AudioBuffer.from_array(noise[None], 44100.0)
    src.start()
    return ctx.start_rendering_sync().get_channel_data(0)


@pytest.mark.parametrize("ftype", list(_COEFS))
def test_output_against_biquad(ftype):
    # iir_filter.rs test_output_against_biquad — the IIR node fed the
    # biquad's unnormalized coefficients must render the same audio as
    # the BiquadFilterNode itself (white.ogg there, seeded noise here)
    feedback, feedforward = _COEFS[ftype]
    noise = (np.random.RandomState(7)
             .uniform(-0.5, 0.5, 2000).astype(np.float32))

    def make_biquad(ctx):
        f = ctx.create_biquad_filter()
        f.type = ftype
        f.frequency.set_value(2000.0)
        f.q.set_value(1.0)
        f.gain.set_value(3.0)
        return f

    biquad_out = _render_filtered(noise, make_biquad)
    iir_out = _render_filtered(
        noise, lambda ctx: ctx.create_iir_filter(feedforward, feedback))
    np.testing.assert_allclose(iir_out, biquad_out, atol=2e-6)


def test_get_frequency_response():
    # iir_filter.rs tests_get_frequency_response — scipy cheby2 highpass
    # reference magnitudes (generated by the reference's own comment)
    ref_mag = np.array([
        1e-3, 4.152807e-4, 1.4607895e-3, 5.051316e-3, 1.1303235e-2,
        2.2303402e-2, 4.311698e-2, 8.84345e-2, 2.1466202e-1, 6.802952e-1,
    ], np.float32)
    ctx = OfflineAudioContext(2, LENGTH, 44100.0)
    iir = ctx.create_iir_filter(
        [0.019618022238052212, -0.03600792810244924, 0.01961802223805221],
        [1.0, 1.5764362005383137, 0.6516801731168673])
    freqs = np.array([0., 2205., 4410., 6615., 8820., 11025., 13230.,
                      15435., 17640., 19845.], np.float32)
    mag = np.zeros(10, np.float32)
    phase = np.zeros(10, np.float32)
    iir.get_frequency_response(freqs, mag, phase)
    np.testing.assert_allclose(mag, ref_mag, rtol=1e-5, atol=1e-7)
