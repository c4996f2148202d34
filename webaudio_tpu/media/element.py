"""MediaElement: an <audio>-element shim for controllable file playback.

reference: src/media_element.rs (creek real-time-safe disk streaming with
seek / loop / playback-rate / pause via atomics).  Host-side equivalent:
the file decodes once; a chunk iterator honours live control flags
(thread-safe; the render loop pulls chunks while the user mutates
controls).
"""

from __future__ import annotations

import threading
import numpy as np

from .decoding import decode_audio_data


class MediaElement:
    """reference: media_element.rs:12-223."""

    def __init__(self, source):
        self._buffer = decode_audio_data(source)
        self._lock = threading.Lock()
        self._position = 0.0          # seconds
        self._playback_rate = 1.0
        self._loop = False
        self._paused = True

    # --- controls -----------------------------------------------------------
    @property
    def current_time(self) -> float:
        with self._lock:
            return self._position

    @current_time.setter
    def current_time(self, t: float):
        self.set_current_time(t)

    def set_current_time(self, t: float):
        with self._lock:
            self._position = min(max(float(t), 0.0), self._buffer.duration)

    @property
    def duration(self) -> float:
        return self._buffer.duration

    @property
    def playback_rate(self) -> float:
        return self._playback_rate

    @playback_rate.setter
    def playback_rate(self, r: float):
        with self._lock:
            self._playback_rate = float(r)

    @property
    def loop(self) -> bool:
        return self._loop

    @loop.setter
    def loop(self, v: bool):
        with self._lock:
            self._loop = bool(v)

    @property
    def paused(self) -> bool:
        return self._paused

    def play(self):
        with self._lock:
            self._paused = False

    def pause(self):
        with self._lock:
            self._paused = True

    # --- chunk production (pulled by MediaElementAudioSourceNode) -----------
    def _pull_chunk(self, frames: int, out_rate: float) -> np.ndarray:
        """Produce `frames` frames at `out_rate` honoring rate/loop/pause
        (linear-interp resampling like the reference's slow track)."""
        buf = self._buffer
        data = buf.to_array()
        c = buf.number_of_channels
        with self._lock:
            if self._paused:
                return np.zeros((c, frames), np.float32)
            rate = self._playback_rate * buf.sample_rate / out_rate
            pos = self._position * buf.sample_rate
            idx = pos + np.arange(frames, dtype=np.float64) * rate
            n = buf.length
            if self._loop:
                idx = np.mod(idx, n)
                valid = np.ones(frames, bool)
            else:
                valid = idx < n - 1
                idx = np.clip(idx, 0, n - 1)
            k = np.floor(idx).astype(np.int64)
            frac = (idx - k).astype(np.float32)
            k1 = np.minimum(k + 1, n - 1)
            out = data[:, k] * (1 - frac) + data[:, k1] * frac
            out = np.where(valid[None, :], out, 0.0).astype(np.float32)
            new_pos = pos + frames * rate
            if self._loop:
                new_pos = np.mod(new_pos, n)
            else:
                new_pos = min(new_pos, float(n))
                if new_pos >= n:
                    self._paused = True
            self._position = float(new_pos) / buf.sample_rate
            return out
