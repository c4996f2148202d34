"""Engine-wide constants and validation helpers.

Mirrors the reference crate's root constants and assertions
(reference: src/lib.rs:18-21, 149-251) while adding TPU-specific block
configuration: the engine renders in *blocks* of a multiple of the render
quantum so that `lax.scan` steps are large enough to saturate the chip.
"""

from __future__ import annotations

# Render quantum size: granularity of event scheduling / k-rate params.
# (reference: src/lib.rs:18)
RENDER_QUANTUM_SIZE = 128

# Maximum number of channels for audio contexts / buffers.
# (reference: src/lib.rs:21)
MAX_CHANNELS = 32

# Inclusive sample-rate range accepted by contexts and buffers.
# (reference: src/lib.rs:149-152)
MIN_SAMPLE_RATE = 3000.0
MAX_SAMPLE_RATE = 768000.0

# Default number of render quanta per compiled scan step for acyclic graphs.
# Graphs containing feedback cycles fall back to one quantum per step because
# the cycle-breaking DelayNode guarantees only >= 1 quantum of latency
# (reference: src/node/delay.rs:535-542).
DEFAULT_QUANTA_PER_BLOCK = 128  # 128 * 128 = 16384 frames per scan step


def assert_valid_sample_rate(sample_rate: float) -> None:
    """reference: src/lib.rs:149-162"""
    if not (MIN_SAMPLE_RATE <= float(sample_rate) <= MAX_SAMPLE_RATE):
        raise NotSupportedError(
            f"sample rate {sample_rate} is outside "
            f"[{MIN_SAMPLE_RATE}, {MAX_SAMPLE_RATE}]"
        )


def assert_valid_number_of_channels(number_of_channels: int) -> None:
    """reference: src/lib.rs:163-175"""
    if not (1 <= int(number_of_channels) <= MAX_CHANNELS):
        raise NotSupportedError(
            f"number of channels {number_of_channels} is outside [1, {MAX_CHANNELS}]"
        )


def assert_valid_channel_number(channel_number: int, number_of_channels: int) -> None:
    """reference: src/lib.rs:177-192"""
    if not (0 <= int(channel_number) < number_of_channels):
        raise IndexSizeError(
            f"channel number {channel_number} out of range "
            f"(number of channels: {number_of_channels})"
        )


def assert_valid_time_value(value: float) -> None:
    """reference: src/lib.rs:194-207"""
    import math

    if not math.isfinite(value) or value < 0.0:
        raise TypeError(f"time value {value} should be finite and >= 0")


class WebAudioError(Exception):
    """Base class for spec-named DOMException analogs."""


class NotSupportedError(WebAudioError):
    pass


class IndexSizeError(WebAudioError):
    pass


class InvalidStateError(WebAudioError):
    pass


class InvalidAccessError(WebAudioError):
    pass


class RangeError(WebAudioError):
    pass


class NotFoundError(WebAudioError):
    """Unknown sink/device id (reference: media_devices enumeration,
    online.rs test_try_new_invalid_sink_id)."""
