"""Streaming integer-factor resampling (oversampling for WaveShaperNode).

reference: the rubato `FftFixedInOut` 2x/4x resamplers
(waveshaper.rs:233-348).  TPU design: linear-phase halfband/polyphase FIR
interpolation — zero-stuff + FIR smooth for upsampling, FIR + decimate for
downsampling — expressed as strided reshapes + small convolutions that XLA
vectorizes; the FIR tail is carried across blocks so streaming is exact.
A different (higher-quality linear-phase) kernel than rubato's FFT
resampler, same function.
"""

from __future__ import annotations

import functools

import numpy as np
import jax.numpy as jnp


@functools.lru_cache(maxsize=None)
def _interp_fir(factor: int, taps_per_phase: int = 48) -> np.ndarray:
    """Windowed-sinc lowpass at ~fs/(2*factor), gain `factor`, for
    zero-stuffed upsampling.  Odd length, linear phase; cutoff pulled in
    slightly so the stopband covers the fold-back region."""
    from scipy.signal import firwin

    n = taps_per_phase * factor + 1
    h = firwin(n, 0.92 / factor, window=("kaiser", 9.0)) * factor
    return h.astype(np.float32)


def up_fir_state(channels: int, factor: int) -> jnp.ndarray:
    n = len(_interp_fir(factor))
    return jnp.zeros((channels, n - 1), jnp.float32)


def down_fir_state(channels: int, factor: int) -> jnp.ndarray:
    n = len(_interp_fir(factor))
    return jnp.zeros((channels, n - 1), jnp.float32)


def upsample(x: jnp.ndarray, factor: int, state: jnp.ndarray):
    """(C, B) -> (C, B*factor), streaming.  state: FIR history in the
    upsampled domain."""
    h = jnp.asarray(_interp_fir(factor))
    C, B = x.shape
    up = jnp.zeros((C, B * factor), x.dtype)
    up = up.at[:, ::factor].set(x)
    ext = jnp.concatenate([state, up], axis=1)
    y = _fir_valid(ext, h)
    return y, ext[:, -(len(h) - 1):]


def downsample(x: jnp.ndarray, factor: int, state: jnp.ndarray):
    """(C, B*factor) -> (C, B), streaming anti-aliased decimation."""
    h = jnp.asarray(_interp_fir(factor)) / np.float32(factor)
    ext = jnp.concatenate([state, x], axis=1)
    y = _fir_valid(ext, h)
    return y[:, ::factor], ext[:, -(len(h) - 1):]


def _fir_valid(x: jnp.ndarray, h: jnp.ndarray) -> jnp.ndarray:
    """'valid' FIR along the last axis via conv_general_dilated.
    x: (C, T); h: (N,) -> (C, T - N + 1)."""
    import jax

    C = x.shape[0]
    lhs = x[:, None, :]                       # (C, 1, T) NCH
    rhs = h[::-1][None, None, :]              # (1, 1, N) OIH
    out = jax.lax.conv_general_dilated(
        lhs, rhs, window_strides=(1,), padding="VALID",
        dimension_numbers=("NCH", "OIH", "NCH"))
    return out[:, 0, :]
