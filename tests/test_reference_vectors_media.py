"""Media-layer test transcriptions (reference: src/media_streams/mod.rs,
src/resampling.rs, src/decoding.rs `mod tests`).
"""

import numpy as np
import pytest

from webaudio_tpu.buffer import AudioBuffer
from webaudio_tpu.media.streams import MediaStreamTrack
from webaudio_tpu.media.resampler import Resampler


def _chunk(values, rate=48000.0):
    return AudioBuffer.from_array(
        np.asarray([values], np.float32), rate)


# --- media_streams/mod.rs -----------------------------------------------------

def test_lazy():
    # media_streams test_lazy — chunks arrive in order; the track ends
    # after the final chunk and stays ended
    track = MediaStreamTrack.from_iterator(
        [_chunk([1.0]), _chunk([2.0]), _chunk([3.0])])
    assert track.ready_state == "live"
    it = track.iter()
    for expected in (1.0, 2.0, 3.0):
        np.testing.assert_array_equal(
            it.next().get_channel_data(0), [expected])
    assert it.next() is None
    assert it.next() is None
    assert track.ready_state == "ended"


def test_lazy_multiple_consumers():
    # media_streams test_lazy_multiple_consumers — a lagging consumer
    # catches up to the LATEST chunk, skipping the ones it missed
    track = MediaStreamTrack.from_iterator(
        [_chunk([1.0]), _chunk([2.0]), _chunk([3.0])])
    it1 = track.iter()
    it2 = track.iter()

    np.testing.assert_array_equal(it1.next().get_channel_data(0), [1.0])
    np.testing.assert_array_equal(it2.next().get_channel_data(0), [1.0])

    np.testing.assert_array_equal(it1.next().get_channel_data(0), [2.0])
    np.testing.assert_array_equal(it1.next().get_channel_data(0), [3.0])

    # iter2 skipped chunk 2 and receives the latest
    np.testing.assert_array_equal(it2.next().get_channel_data(0), [3.0])

    assert it1.next() is None
    assert it2.next() is None
    assert track.ready_state == "ended"


def test_close():
    # media_streams test_close — closing mid-stream ends every consumer
    track = MediaStreamTrack.from_iterator(
        [_chunk([1.0]), _chunk([2.0]), _chunk([3.0])])
    it = track.iter()
    np.testing.assert_array_equal(it.next().get_channel_data(0), [1.0])
    track.close()
    assert it.next() is None
    assert track.ready_state == "ended"


# --- resampling.rs -------------------------------------------------------------

def test_resampler_concat():
    # resampling.rs test_resampler_concat — three 5-sample chunks re-chunk
    # into 10-sample quanta, the final one zero-padded
    chunks = [_chunk([1., 2., 3., 4., 5.], 44100.0) for _ in range(3)]
    r = Resampler(iter(chunks), 44100.0, quantum=10)

    out = next(r)
    assert out.length == 10
    np.testing.assert_array_equal(
        out.get_channel_data(0), [1., 2., 3., 4., 5., 1., 2., 3., 4., 5.])

    out = next(r)
    assert out.length == 10
    np.testing.assert_array_equal(
        out.get_channel_data(0), [1., 2., 3., 4., 5., 0., 0., 0., 0., 0.])

    with pytest.raises(StopIteration):
        next(r)


def test_resampler_split():
    # resampling.rs test_resampler_split — one 10-sample chunk splits into
    # two 5-sample quanta
    chunks = [_chunk([1., 2., 3., 4., 5., 6., 7., 8., 9., 10.], 44100.0)]
    r = Resampler(iter(chunks), 44100.0, quantum=5)

    out = next(r)
    assert out.length == 5
    np.testing.assert_array_equal(out.get_channel_data(0), [1., 2., 3., 4., 5.])

    out = next(r)
    assert out.length == 5
    np.testing.assert_array_equal(out.get_channel_data(0),
                                  [6., 7., 8., 9., 10.])

    with pytest.raises(StopIteration):
        next(r)


# --- decoding.rs ----------------------------------------------------------------

def test_media_decoder_invalid_input():
    # decoding.rs test_media_decoder — 32 zero bytes are no known container
    from webaudio_tpu.media.decoding import MediaDecoder

    with pytest.raises(Exception):
        md = MediaDecoder(bytes(32))
        # constructing may defer probing; force the pipeline
        for _ in md:
            pass
