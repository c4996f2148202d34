"""AudioBuffer: in-memory multichannel audio asset.

reference: src/buffer.rs (AudioBuffer, ChannelData).  Host-side storage is a
single contiguous numpy `(channels, length)` f32 array (the reference uses
Arc-copy-on-write per channel; here numpy views give the same cheap clones
and XLA owns device memory — buffers reach HBM through each kernel's
`resources()`, staged once per compiled graph).
"""

from __future__ import annotations

import numpy as np

from .constants import (
    assert_valid_number_of_channels,
    assert_valid_sample_rate,
    assert_valid_channel_number,
    IndexSizeError,
)


class AudioBuffer:
    """reference: src/buffer.rs:69-363"""

    def __init__(self, number_of_channels: int, length: int, sample_rate: float):
        assert_valid_number_of_channels(number_of_channels)
        assert_valid_sample_rate(sample_rate)
        if length <= 0:
            raise IndexSizeError("AudioBuffer length must be > 0")
        self._data = np.zeros((number_of_channels, length), dtype=np.float32)
        self._sample_rate = float(sample_rate)

    # --- constructors -------------------------------------------------
    @classmethod
    def from_array(cls, data, sample_rate: float) -> "AudioBuffer":
        """Build from a (channels, length) array-like (reference: buffer.rs `from`)."""
        arr = np.asarray(data, dtype=np.float32)
        if arr.ndim == 1:
            arr = arr[None, :]
        if arr.ndim != 2:
            raise IndexSizeError("expected (channels, length) data")
        buf = cls.__new__(cls)
        assert_valid_number_of_channels(arr.shape[0])
        assert_valid_sample_rate(sample_rate)
        buf._data = np.ascontiguousarray(arr)
        buf._sample_rate = float(sample_rate)
        return buf

    # --- spec attributes ------------------------------------------------
    @property
    def number_of_channels(self) -> int:
        return self._data.shape[0]

    @property
    def length(self) -> int:
        return self._data.shape[1]

    @property
    def sample_rate(self) -> float:
        return self._sample_rate

    @property
    def duration(self) -> float:
        return self.length / self._sample_rate

    # --- channel access (reference: buffer.rs:148-240) -----------------
    def get_channel_data(self, channel_number: int) -> np.ndarray:
        assert_valid_channel_number(channel_number, self.number_of_channels)
        return self._data[channel_number]

    def copy_from_channel(self, destination: np.ndarray, channel_number: int,
                          offset: int = 0) -> None:
        """reference: buffer.rs:148-178"""
        assert_valid_channel_number(channel_number, self.number_of_channels)
        offset = min(int(offset), self.length)
        n = min(len(destination), self.length - offset)
        destination[:n] = self._data[channel_number, offset:offset + n]

    def copy_from_channel_with_offset(self, destination, channel_number,
                                      offset):
        """reference: buffer.rs copy_from_channel_with_offset."""
        self.copy_from_channel(destination, channel_number, offset)

    def copy_to_channel_with_offset(self, source, channel_number, offset):
        """reference: buffer.rs copy_to_channel_with_offset."""
        self.copy_to_channel(source, channel_number, offset)

    def copy_to_channel(self, source: np.ndarray, channel_number: int,
                        offset: int = 0) -> None:
        """reference: buffer.rs:180-210"""
        assert_valid_channel_number(channel_number, self.number_of_channels)
        offset = min(int(offset), self.length)
        n = min(len(source), self.length - offset)
        self._data[channel_number, offset:offset + n] = source[:n]

    # --- engine-side helpers --------------------------------------------
    def to_array(self) -> np.ndarray:
        """Return the raw (channels, length) f32 array (no copy)."""
        return self._data

    def resample(self, sample_rate: float) -> None:
        """In-place linear-interpolation resample (reference: buffer.rs:311-363).

        Matches the reference exactly: very-close rates (|delta| <= 0.1 Hz)
        and zero-length buffers only relabel the rate; otherwise the new
        length is ceil(length * ratio) and the interpolation is
        endpoint-preserving (position i/(new-1) in [0,1] scaled to
        [0, length-1]), keeping the first and last samples intact."""
        assert_valid_sample_rate(sample_rate)
        if abs(sample_rate - self._sample_rate) <= 0.1 or self.length == 0:
            self._sample_rate = float(sample_rate)
            return
        rate = sample_rate / self._sample_rate
        new_len = int(np.ceil(self.length * float(rate)))
        from .native import resample_linear_native

        out = resample_linear_native(self._data, rate, new_len)
        if out is None:  # numpy fallback
            position = (np.arange(new_len, dtype=np.float64) / (new_len - 1)
                        if new_len > 1 else np.zeros(1, np.float64))
            playhead = position * (self.length - 1)
            k = np.floor(playhead).astype(np.int64)
            frac = (playhead - k).astype(np.float32)
            k1 = np.minimum(k + 1, self.length - 1)
            d = self._data
            out = (d[:, k] * (1.0 - frac) + d[:, k1] * frac).astype(np.float32)
        self._data = out
        self._sample_rate = float(sample_rate)

    def __repr__(self):
        return (f"AudioBuffer(channels={self.number_of_channels}, "
                f"length={self.length}, sample_rate={self._sample_rate})")
