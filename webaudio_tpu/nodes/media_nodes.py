"""Media source/destination nodes: bridge streams into/out of the graph.

reference: src/node/media_stream_source.rs, media_stream_track_source.rs,
media_element_source.rs, media_stream_destination.rs and the shared
MediaStreamRenderer (src/node/mod.rs:60-113).  Each tick pulls one block
from the host-side stream via `jax.pure_callback` (static shapes, host
boundary once per block); the destination pushes rendered blocks into a
live PushStreamTrack.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..graph.compiler import Kernel
from ..media.resampler import Resampler
from ..media.streams import MediaStream, MediaStreamTrack, PushStreamTrack
from .audio_node import AudioNode


class _StreamPullKernel(Kernel):
    """Pull (channels, B) from a host iterator per block
    (the MediaStreamRenderer analog, node/mod.rs:60-113)."""

    def __init__(self, node, channels: int, sample_rate: float):
        self.node = node
        self.channels = channels
        self.sample_rate = sample_rate

    def _pull_host(self, frames_arr):
        frames = int(frames_arr)
        out = np.zeros((self.channels, frames), np.float32)
        filled = 0
        while filled < frames:
            chunk = self.node._next_quantum()
            if chunk is None:
                break
            n = min(chunk.shape[1], frames - filled)
            c = min(chunk.shape[0], self.channels)
            out[:c, filled:filled + n] = chunk[:c, :n]
            filled += n
        return out

    def process(self, scope, state, inputs, params):
        B = scope.frames
        out = jax.pure_callback(
            self._pull_host,
            jax.ShapeDtypeStruct((self.channels, B), jnp.float32),
            jnp.int32(B), vmap_method="sequential")
        return state, [out]


class _StreamSourceBase(AudioNode):
    _number_of_inputs = 0
    _number_of_outputs = 1

    def __init__(self, context, track: MediaStreamTrack, channels_hint: int = 2):
        super().__init__(context)
        self._resampler = Resampler(
            _track_chunks(track), context.sample_rate)
        self._channels = channels_hint
        self._track = track

    def _next_quantum(self):
        try:
            buf = next(self._resampler)
        except StopIteration:
            return None
        return buf.to_array()

    def output_channel_count(self, input_counts):
        return [self._channels]

    def make_kernel(self, render_ctx):
        return _StreamPullKernel(self, self._channels, render_ctx.sample_rate)

    def block_constraint(self):
        return None


def _track_chunks(track: MediaStreamTrack):
    while True:
        chunk = track.next_chunk()
        if chunk is None:
            return
        yield chunk


class MediaStreamAudioSourceNode(_StreamSourceBase):
    """reference: media_stream_source.rs."""

    def __init__(self, context, stream: MediaStream):
        tracks = stream.get_audio_tracks()
        if not tracks:
            raise ValueError("MediaStream has no audio tracks")
        super().__init__(context, tracks[0])


class MediaStreamTrackAudioSourceNode(_StreamSourceBase):
    """reference: media_stream_track_source.rs."""

    def __init__(self, context, track: MediaStreamTrack):
        super().__init__(context, track)


class MediaElementAudioSourceNode(AudioNode):
    """reference: media_element_source.rs (pulls from MediaElement controls
    honoring pause/seek/rate/loop live)."""

    _number_of_inputs = 0
    _number_of_outputs = 1

    def __init__(self, context, media_element):
        super().__init__(context)
        self.media_element = media_element
        self._channels = media_element.number_of_channels

    def output_channel_count(self, input_counts):
        return [self._channels]

    def make_kernel(self, render_ctx):
        node = self

        class _Kern(Kernel):
            def _pull(self, frames_arr):
                return node.media_element._pull_chunk(
                    int(frames_arr), render_ctx.sample_rate)

            def process(self, scope, state, inputs, params):
                B = scope.frames
                out = jax.pure_callback(
                    self._pull,
                    jax.ShapeDtypeStruct((node._channels, B), jnp.float32),
                    jnp.int32(B), vmap_method="sequential")
                return state, [out]

        return _Kern()


class MediaStreamAudioDestinationNode(AudioNode):
    """reference: media_stream_destination.rs:119+ — captures its input as
    a new MediaStream."""

    _number_of_inputs = 1
    _number_of_outputs = 1
    has_side_effects = True

    def __init__(self, context):
        super().__init__(context)
        self._track = PushStreamTrack(label="graph-capture")
        self.stream = MediaStream([self._track])
        self._sample_rate = context.sample_rate

    def _push_host(self, chunk):
        from ..buffer import AudioBuffer

        self._track.push(AudioBuffer.from_array(np.asarray(chunk),
                                                self._sample_rate))
        return np.int32(0)

    def output_channel_count(self, input_counts):
        return [max(1, input_counts[0])]

    def make_kernel(self, render_ctx):
        node = self

        class _Kern(Kernel):
            def process(self, scope, state, inputs, params):
                from jax.experimental import io_callback

                x = inputs[0]
                # ordered, side-effecting callback: must not be DCE'd even
                # though nothing consumes its result
                io_callback(node._push_host,
                            jax.ShapeDtypeStruct((), jnp.int32), x,
                            ordered=True)
                return state, [x]

        return _Kern()
