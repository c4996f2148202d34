"""Oscillator waveform kernels.

reference: src/node/oscillator.rs:500-680.  The reference accumulates phase
per-sample in f64 on the audio thread; here phase is vectorized per block:

    phase[n] = carry + exclusive_cumsum(masked phase increments)[n]  (mod 1)

computed with a two-level split so almost all work stays f32 on the VPU:
an f32 cumsum *within* each 128-frame quantum (bounded error ~1e-7 cycles)
plus an f64 cumsum over the per-quantum sums (128 scalars per block), and an
f64 scalar carried across blocks so there is no long-render drift.

Waveforms: sine is evaluated with `jnp.sin` instead of the reference's
2048-entry lerp table (oscillator.rs:16-27) — a deliberate divergence that
*reduces* error (table lerp deviates up to ~1.2e-6).  Sawtooth/square use
the same polyBLEP correction formulas (oscillator.rs:588-659); custom waves
gather from the PeriodicWave table with linear interpolation.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..constants import RENDER_QUANTUM_SIZE

# parity switch with the reference's cfg!(test) polyBLEP disable
# (oscillator.rs:592-603) for closed-form golden comparisons
DISABLE_POLYBLEP = False


def computed_frequency(freq, detune):
    """computed_freq = freq * 2^(detune/1200) (reference: oscillator.rs:30-34)."""
    return freq * jnp.exp2(detune * (1.0 / 1200.0))


def accumulate_phase(carry, incr64, mask, start_correction):
    """Vectorized phase accumulation over one block.

    carry: () f64 — phase (in cycles, unwrapped) at block start
    incr64: (B,) f64 — per-sample phase increments (cycles/sample); f64 to
      match the reference's `phase_incr = f64(computed_freq) / fs`
      (oscillator.rs:446-449) — an f32 increment would drift ~1e-5
      cycles per 64k samples.
    mask: (B,) bool — scheduling mask; inactive samples don't advance phase
    start_correction: () f64 — extra phase at the sub-sample start
      (reference: oscillator.rs:521-529)

    Returns (phase (B,) f32 in [0,1), new_carry () f64).

    Split design keeps the per-sample work f32 on the VPU: an exclusive f32
    cumsum *within* each 128-frame quantum (error <= 128 ulp of the
    increment, ~1e-7 cycles) plus an exact f64 prefix over the per-quantum
    sums (only B/128 f64 scalars).
    """
    B = incr64.shape[0]
    q = RENDER_QUANTUM_SIZE
    nq = B // q
    m64 = jnp.where(mask, incr64, 0.0).reshape(nq, q)
    m32 = m64.astype(jnp.float32)
    within = jnp.cumsum(m32, axis=1) - m32                   # exclusive, f32
    qsums = jnp.sum(m64, axis=1)                             # (nq,) f64 exact-ish
    qoffs = jnp.cumsum(qsums) - qsums                        # exclusive, f64
    base = carry + qoffs + start_correction
    base_mod = jnp.mod(base, 1.0).astype(jnp.float32)        # f64 -> f32 once
    phase = jnp.mod(base_mod[:, None] + within, 1.0).reshape(B)
    new_carry = jnp.mod(carry + qoffs[-1] + qsums[-1] + start_correction, 1.0)
    return phase, new_carry


def poly_blep(t, dt):
    """Band-limited step correction (reference: oscillator.rs:629-645)."""
    if DISABLE_POLYBLEP:
        return jnp.zeros_like(t)
    dt = jnp.maximum(dt, 1e-20)
    t1 = t / dt
    low = t1 + t1 - t1 * t1 - 1.0
    t2 = (t - 1.0) / dt
    high = t2 * t2 + t2 + t2 + 1.0
    return jnp.where(t < dt, low, jnp.where(t > 1.0 - dt, high, 0.0))


def sine(phase):
    return jnp.sin((2.0 * np.pi) * phase)


def sawtooth(phase, incr):
    """offset phase so the wave starts at 0 (reference: oscillator.rs:588-596)."""
    p = jnp.mod(phase + 0.5, 1.0)
    return (2.0 * p - 1.0) - poly_blep(p, incr)


def square(phase, incr):
    s = jnp.where(phase < 0.5, 1.0, -1.0)
    s = s + poly_blep(phase, incr)
    return s - poly_blep(jnp.mod(phase + 0.5, 1.0), incr)


def triangle(phase):
    s = -4.0 * phase + 2.0
    s = jnp.where(s > 1.0, 2.0 - s, s)
    s = jnp.where(s < -1.0, -2.0 - s, s)
    return s


def wavetable_lookup(phase, table):
    """Linear-interp gather (reference: oscillator.rs:606-627 / :660-678)."""
    n = table.shape[0]
    position = phase.astype(jnp.float32) * n
    floored = jnp.floor(position)
    prev_i = floored.astype(jnp.int32)
    next_i = jnp.where(prev_i + 1 == n, 0, prev_i + 1)
    k = position - floored
    return table[prev_i] * (1.0 - k) + table[next_i] * k
