"""Uniform partitioned FFT convolution (frequency-domain delay line).

reference: the `fft-convolver` crate used by ConvolverNode
(convolver.rs:286-307, partition size 1024 = 8 quanta).  TPU design:
overlap-save with partition P; the IR is pre-transformed host-side into a
(K, P+1) complex spectrum matrix staged to HBM once; per render block the
engine computes B/P input-chunk spectra with one batched rfft and performs
the partition MAC

    Y[j] = sum_k H[k] * X[j - k]

as a single einsum over the partition axis (a per-frequency matvec that XLA
maps onto the MXU/VPU), then one batched irfft.  The delay line (last K-1
chunk spectra + P input tail samples) is carried in the scan state.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

DEFAULT_PARTITION = 1024   # reference: convolver.rs:286
MAX_PARTITION = 16384      # TPU cap: one partition per 128-quanta block


def choose_partition(block_frames: int) -> int:
    """Largest power-of-two divisor of the block size.  The reference uses
    a fixed 1024 partition (8 quanta, convolver.rs:286) because its FDL
    runs per realtime callback; offline on TPU the partitioned-convolution
    output is exact for ANY partition, and a larger one is strictly
    cheaper — the per-sample MAC cost scales with K = ceil(ir_len/P) while
    the FFT cost only grows logarithmically.  A 3.7 s IR drops from
    K=160 partitions (P=1024) to K=10 (P=16384).  Blocks are always
    multiples of the render quantum (128), so the result is in
    [128, MAX_PARTITION]."""
    p = block_frames & (-block_frames)  # largest power-of-2 divisor
    return min(p, MAX_PARTITION)


def partition_ir(ir: np.ndarray, partition: int = DEFAULT_PARTITION) -> np.ndarray:
    """IR (C_ir, L) or (L,) -> spectra (C_ir, K, P+1) complex64 (host-side)."""
    ir = np.asarray(ir, dtype=np.float32)
    if ir.ndim == 1:
        ir = ir[None, :]
    c, L = ir.shape
    P = partition
    K = max(1, -(-L // P))
    padded = np.zeros((c, K * P), np.float32)
    padded[:, :L] = ir
    chunks = padded.reshape(c, K, P)
    # zero-pad to 2P for linear (not circular) convolution
    z = np.zeros((c, K, 2 * P), np.float32)
    z[:, :, :P] = chunks
    return np.fft.rfft(z, axis=-1).astype(np.complex64)


def complex_zeros(shape) -> jnp.ndarray:
    """Eagerly-created complex64 zeros WITHOUT a complex literal: eager
    `jnp.zeros(..., complex64)` uploads a complex scalar constant, which is
    UNIMPLEMENTED on tunneled TPU backends; converting f32 zeros on device
    sidesteps the transfer."""
    return jnp.zeros(shape, jnp.float32).astype(jnp.complex64)


class PartitionedConvState:
    """Functional state pytree helpers."""

    @staticmethod
    def init(channels: int, k_partitions: int, partition: int):
        P = partition
        return {
            "spectra": complex_zeros(
                (channels, max(k_partitions - 1, 0), P + 1)),
            "tail": jnp.zeros((channels, P), jnp.float32),
        }


def partitioned_conv_block(state, x, h_spectra, partition: int):
    """Convolve one block through the frequency-domain delay line.

    state: {"spectra": (C, K-1, P+1) c64, "tail": (C, P) f32}
    x: (C, B) f32 with B a multiple of P
    h_spectra: (C, K, P+1) complex64 (or (1, K, P+1) broadcast over C)

    Returns (new_state, y (C, B) f32).
    """
    C, B = x.shape
    P = partition
    J = B // P
    K = h_spectra.shape[1]

    # overlap-save segments: for chunk j, fft of [prev P samples, chunk],
    # built with two strided reshapes (no gather)
    ext = jnp.concatenate([state["tail"], x], axis=1)        # (C, B + P)
    segs = jnp.stack([ext[:, : J * P].reshape(C, J, P),
                      ext[:, P:].reshape(C, J, P)], axis=2).reshape(C, J, 2 * P)
    X = jnp.fft.rfft(segs, axis=-1).astype(jnp.complex64)    # (C, J, P+1)

    # delay line: past K-1 spectra followed by this block's J spectra
    Xfull = jnp.concatenate([state["spectra"], X], axis=1)   # (C, K-1+J, P+1)

    # Y[j] = sum_k H[k] * Xfull[j + K-1 - k]
    Hb = jnp.broadcast_to(h_spectra, (C,) + h_spectra.shape[1:])
    if K * J <= 512:
        # unrolled static slices: J*K fused elementwise MACs, no windowed
        # intermediate (the gathered (C,J,K,P+1) tensor is 42 MB at the
        # reference partition size — this path never materializes it)
        Y = None
        for k in range(K):
            term = Hb[:, k, None, :] * Xfull[:, K - 1 - k: K - 1 - k + J, :]
            Y = term if Y is None else Y + term
    else:
        jj = jnp.arange(J)[:, None]
        kk = jnp.arange(K)[None, :]
        win = Xfull[:, jj + (K - 1) - kk, :]                 # (C, J, K, P+1)
        Y = jnp.einsum("cjkf,ckf->cjf", win, Hb)

    y = jnp.fft.irfft(Y, n=2 * P, axis=-1)[:, :, P:]          # overlap-save
    y = y.reshape(C, B).astype(jnp.float32)

    new_state = {
        "spectra": Xfull[:, Xfull.shape[1] - max(K - 1, 0):, :]
        if K > 1 else state["spectra"],
        "tail": ext[:, B:],
    }
    return new_state, y


def fir_convolve_full(x: jnp.ndarray, h: np.ndarray) -> jnp.ndarray:
    """One-shot FFT convolution for offline post-passes: (C, T) * (L,)."""
    T = x.shape[-1]
    L = len(h)
    n = 1
    while n < T + L - 1:
        n *= 2
    X = jnp.fft.rfft(x, n=n, axis=-1)
    H = jnp.fft.rfft(jnp.asarray(h, jnp.float32), n=n)
    return jnp.fft.irfft(X * H, n=n, axis=-1)[..., :T].astype(jnp.float32)
