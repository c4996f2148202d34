"""Linear recurrences on TPU.

The reference runs recursive filters sample-by-sample in f64 on the audio
thread (biquad_filter.rs:857-896, iir_filter.rs:386-410).  A sequential
per-sample loop wastes a TPU, so this module provides three strategies:

1. `iir_impulse_response` — for **constant** (LTI) coefficients, convert the
   IIR to a truncated FIR host-side (scipy runs the exact f64 recurrence in
   C); the filter then runs as FFT convolution (ops/fft_conv.py), the
   speed-of-light path on the MXU/VPU.  Truncation error is controlled to
   `tol` via the tail bound of the measured impulse response.

2. `recurrence_2nd_order` / `recurrence_1st_order` — for **time-varying**
   (a-rate automated) coefficients, log-depth `associative_scan` over affine
   transfer elements in structure-of-arrays layout (plain (B,) f32 arrays,
   perfect VPU tiling; a (B,3,3) matrix layout pads 3 -> 128 lanes and is
   ~100x slower).

3. `scan_recurrence_df1` — exact per-sample `lax.scan` fallback (used by
   tests as oracle and for precision-critical paths).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp


def iir_impulse_response(b, a, tol: float = 1e-7, max_len: int = 1 << 18,
                         min_len: int = 128) -> np.ndarray:
    """Truncated impulse response of the IIR filter (b, a), f64 host-side.

    The length is grown until the recent-tail energy is below `tol` of the
    peak, or `max_len` is hit (at which point the FIR equals the IIR for
    any render shorter than max_len anyway).
    """
    from scipy.signal import lfilter

    b = np.asarray(b, dtype=np.float64)
    a = np.asarray(a, dtype=np.float64)
    n = min_len
    while True:
        impulse = np.zeros(n)
        impulse[0] = 1.0
        h = lfilter(b, a, impulse)
        peak = np.abs(h).max()
        if peak == 0.0:
            return h[:min_len].astype(np.float32)
        tail = np.abs(h[-min(128, n // 4):]).max()
        if tail <= tol * peak or n >= max_len:
            return h.astype(np.float32)
        n *= 4


def recurrence_1st_order(a, f, y0):
    """y[n] = f[n] + a[n] * y[n-1], y[-1] = y0.  All (B,) f32 (or f64).

    Affine composition: (a2, f2) . (a1, f1) = (a2*a1, a2*f1 + f2).
    """
    def combine(l, r):
        al, fl = l
        ar, fr = r
        return ar * al, ar * fl + fr

    aa, ff = jax.lax.associative_scan(combine, (a, f))
    return ff + aa * y0


def recurrence_2nd_order(a1, a2, f, y1, y2):
    """y[n] = f[n] - a1[n]*y[n-1] - a2[n]*y[n-2]; y[-1]=y1, y[-2]=y2.

    Elements are affine maps on [y[n-1], y[n-2], 1] kept as six (B,) arrays
    (m00, m01, m10, m11, v0, v1); the scan composes them in log depth.
    """
    one = jnp.ones_like(f)
    zero = jnp.zeros_like(f)
    el = (-a1 * one, -a2 * one, one, zero, f, zero)

    def combine(A, B):
        a00, a01, a10, a11, av0, av1 = A
        b00, b01, b10, b11, bv0, bv1 = B
        return (
            b00 * a00 + b01 * a10,
            b00 * a01 + b01 * a11,
            b10 * a00 + b11 * a10,
            b10 * a01 + b11 * a11,
            b00 * av0 + b01 * av1 + bv0,
            b10 * av0 + b11 * av1 + bv1,
        )

    m00, m01, m10, m11, v0, v1 = jax.lax.associative_scan(combine, el)
    y = m00 * y1 + m01 * y2 + v0
    return y


def biquad_forcing(x, b0, b1, b2, x1, x2):
    """FIR half of a biquad: f[n] = b0 x[n] + b1 x[n-1] + b2 x[n-2] with
    carried x1 = x[-1], x2 = x[-2].  x: (..., B)."""
    xm1 = jnp.concatenate([jnp.broadcast_to(x1, x[..., :1].shape), x[..., :-1]], -1)
    xm2 = jnp.concatenate(
        [jnp.broadcast_to(x2, x[..., :1].shape),
         jnp.broadcast_to(x1, x[..., :1].shape), x[..., :-2]], -1)
    return b0 * x + b1 * xm1 + b2 * xm2


def scan_recurrence_df1(x, coefs, state):
    """Exact per-sample Direct Form 1 (oracle / precision path).

    x: (C, B); coefs: per-sample (b0,b1,b2,a1,a2) each () or (B,);
    state: (C, 4) [x1, x2, y1, y2].  reference: biquad_filter.rs:868-892."""
    b0, b1, b2, a1, a2 = [jnp.broadcast_to(c, (x.shape[1],)) for c in coefs]

    def step(st, inp):
        xn, cb0, cb1, cb2, ca1, ca2 = inp
        x1, x2, y1, y2 = st[:, 0], st[:, 1], st[:, 2], st[:, 3]
        y = cb0 * xn + cb1 * x1 + cb2 * x2 - ca1 * y1 - ca2 * y2
        new = jnp.stack([xn, x1, y, y1], axis=1)
        return new, y

    xs = (x.T, b0, b1, b2, a1, a2)
    state, ys = jax.lax.scan(step, state, xs)
    return ys.T, state
