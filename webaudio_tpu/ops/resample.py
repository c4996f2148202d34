"""Streaming integer-factor resampling (oversampling for WaveShaperNode).

reference: the rubato `FftFixedInOut` 2x/4x resamplers
(waveshaper.rs:233-348).  TPU design: linear-phase windowed-sinc polyphase
FIR interpolation, evaluated as **framed matmuls** so the MXU does the
work — a 128-wide output tile is one (frames, window) x (window, 128)
contraction against a banded (Toeplitz) coefficient matrix:

- upsample: frames gather only the *dense* input samples (the zero-stuffed
  conv never touches its zeros), window = taps_per_phase + TILE/factor;
- downsample: frames stride by TILE*factor and only the decimated outputs
  are computed, window = TILE*factor + taps - 1.

This replaces `conv_general_dilated`, whose (batch=channels, feature=1)
shape lowers to ~5% of MXU peak on TPU; the framed form measured 6-9x
faster at factor 4 (65k-sample blocks, v5e).  The FIR tail is carried
across blocks so streaming is exact; results match the conv formulation
to f32 rounding (precision=HIGHEST keeps the contraction in f32).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

TILE = 128          # output tile width (MXU lane dimension)
TAPS_PER_PHASE = 48


@functools.lru_cache(maxsize=None)
def _interp_fir(factor: int, taps_per_phase: int = TAPS_PER_PHASE) -> np.ndarray:
    """Windowed-sinc lowpass at ~fs/(2*factor), gain `factor`, for
    zero-stuffed upsampling.  Odd length, linear phase; cutoff pulled in
    slightly so the stopband covers the fold-back region."""
    from scipy.signal import firwin

    n = taps_per_phase * factor + 1
    h = firwin(n, 0.92 / factor, window=("kaiser", 9.0)) * factor
    return h.astype(np.float32)


@functools.lru_cache(maxsize=None)
def _up_matrix(factor: int) -> np.ndarray:
    """(W_up, TILE) banded matrix for the upsampled-output tile.

    y_up[TILE*t + r] = sum_k h[k] * up[TILE*t + r + HN-1 - k] with `up`
    nonzero only at multiples of `factor`; substituting j = dense index
    relative to the frame start gives M[q, r] = h[r + HN-1 - factor*q].
    """
    h = _interp_fir(factor)
    HN = len(h)
    W = (TILE + HN - 2) // factor + 1
    M = np.zeros((W, TILE), np.float32)
    for r in range(TILE):
        for q in range(W):
            k = r + HN - 1 - factor * q
            if 0 <= k < HN:
                M[q, r] = h[k]
    return M


@functools.lru_cache(maxsize=None)
def _down_matrix(factor: int) -> np.ndarray:
    """(W_dn, TILE) banded matrix computing only the decimated outputs.

    y[TILE*t + r] = sum_k (h/factor)[k] * ext[TILE*factor*t + factor*r
    + HN-1 - k]  ->  M[j, r] = h[factor*r + HN-1 - j] / factor.
    """
    h = _interp_fir(factor) / np.float32(factor)
    HN = len(h)
    W = TILE * factor + HN - 1
    M = np.zeros((W, TILE), np.float32)
    for r in range(TILE):
        for k in range(HN):
            M[factor * r + HN - 1 - k, r] = h[k]
    return M


def up_fir_state(channels: int, factor: int) -> jnp.ndarray:
    """Dense-domain input history: taps_per_phase samples."""
    return jnp.zeros((channels, TAPS_PER_PHASE), jnp.float32)


def down_fir_state(channels: int, factor: int) -> jnp.ndarray:
    """Upsampled-domain history: HN-1 samples."""
    n = len(_interp_fir(factor))
    return jnp.zeros((channels, n - 1), jnp.float32)


def _frames(x: jnp.ndarray, stride: int, width: int) -> jnp.ndarray:
    """(C, T) -> (C, nt, width) overlapping frames F[c,t,j] = x[c, stride*t+j]
    built from `width/stride` strided reshapes (no gather)."""
    C, T = x.shape
    nt = (T - width) // stride + 1
    ngroups = -(-width // stride)
    pad = ngroups * stride - width
    need = (ngroups - 1) * stride + nt * stride
    xp = jnp.pad(x, ((0, 0), (0, max(0, need - T) + pad)))
    parts = [xp[:, g * stride: g * stride + nt * stride].reshape(C, nt, stride)
             for g in range(ngroups)]
    return jnp.concatenate(parts, axis=2)[:, :, :width]


def _tile_matmul(F: jnp.ndarray, M) -> jnp.ndarray:
    return jax.lax.dot_general(
        F, jnp.asarray(M), (((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST)


def upsample(x: jnp.ndarray, factor: int, state: jnp.ndarray):
    """(C, B) -> (C, B*factor), streaming.  state: (C, TAPS_PER_PHASE)
    dense-domain input history."""
    C, B = x.shape
    xd = jnp.concatenate([state, x], axis=1)        # (C, B + 48)
    M = _up_matrix(factor)
    dt = TILE // factor                             # dense samples per tile
    F = _frames(xd, dt, M.shape[0])                 # (C, B*factor/TILE, W)
    y = _tile_matmul(F, M).reshape(C, B * factor)
    return y, xd[:, -TAPS_PER_PHASE:]


def downsample(x: jnp.ndarray, factor: int, state: jnp.ndarray):
    """(C, B*factor) -> (C, B), streaming anti-aliased decimation.
    state: (C, HN-1) upsampled-domain history."""
    C, B4 = x.shape
    HN = len(_interp_fir(factor))
    ext = jnp.concatenate([state, x], axis=1)       # (C, B4 + HN - 1)
    M = _down_matrix(factor)
    F = _frames(ext, TILE * factor, M.shape[0])     # (C, B4/(TILE*f), W)
    y = _tile_matmul(F, M).reshape(C, B4 // factor)
    return y, ext[:, -(HN - 1):]


def _fir_valid(x: jnp.ndarray, h: jnp.ndarray) -> jnp.ndarray:
    """'valid' FIR along the last axis via conv_general_dilated.
    x: (C, T); h: (N,) -> (C, T - N + 1).  Kept for oracles/utilities;
    the streaming paths above use the framed-matmul form."""
    C = x.shape[0]
    lhs = x[:, None, :]                       # (C, 1, T) NCH
    rhs = h[::-1][None, None, :]              # (1, 1, N) OIH
    out = jax.lax.conv_general_dilated(
        lhs, rhs, window_strides=(1,), padding="VALID",
        dimension_numbers=("NCH", "OIH", "NCH"))
    return out[:, 0, :]
