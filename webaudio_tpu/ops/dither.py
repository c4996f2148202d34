"""TPU-side dithered quantization for 16-bit export (Pallas kernel).

The reference converts f32 to i16 with plain rounding on export
(render/thread.rs:513-520 via dasp, media_recorder WAV encode).  Mastering
pipelines want *dithered* quantization (decorrelates quantization error);
on TPU this runs as a Pallas kernel using the on-core PRNG
(pltpu.prng_random_bits + stochastic rounding of the scaled signal), so
bounced audio can be quantized on-device before the single host transfer.

Falls back to numpy TPD dither off-TPU.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp


def _dither_kernel(seed_ref, x_ref, out_ref):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    # decorrelate the PRNG stream across grid programs
    pltpu.prng_seed(seed_ref[0] + pl.program_id(0))
    scaled = x_ref[...] * 32767.0
    bits = pltpu.prng_random_bits(scaled.shape)
    # one uniform in [0,1): stochastic rounding == 1-LSB RPDF dither
    u = bits.astype(jnp.float32) / jnp.float32(2**32) + 0.5
    q = jnp.floor(scaled + u)
    out_ref[...] = jnp.clip(q, -32768.0, 32767.0).astype(jnp.int32)


_ROWS_PER_PROG = 1024          # 1024 x 128 f32 = 512 KB per grid step


def dither_to_i16_tpu(x, seed: int = 0):
    """(C, T) f32 in [-1,1] -> (C, T) int32 of i16 codes, on device.
    Gridded over row tiles so arbitrarily large bounces never exceed
    VMEM (a 256-graph batch is ~200 MB)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    C, T = x.shape
    lanes = 128
    pad = (-T) % lanes
    xp = jnp.pad(x, ((0, 0), (0, pad)))
    xp = xp.reshape(C * (T + pad) // lanes, lanes)
    rows = xp.shape[0]
    rpad = (-rows) % _ROWS_PER_PROG
    if rpad:
        xp = jnp.pad(xp, ((0, rpad), (0, 0)))
    grid = xp.shape[0] // _ROWS_PER_PROG

    out = pl.pallas_call(
        _dither_kernel,
        out_shape=jax.ShapeDtypeStruct(xp.shape, jnp.int32),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((1,), lambda i: (jnp.int32(0),),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((_ROWS_PER_PROG, lanes),
                         lambda i: (i, jnp.int32(0)),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((_ROWS_PER_PROG, lanes),
                               lambda i: (i, jnp.int32(0)),
                               memory_space=pltpu.VMEM),
    )(jnp.asarray([seed], jnp.int32), xp)
    return out[:rows].reshape(C, T + pad)[:, :T]


def dither_to_i16(x, seed: int = 0):
    """Dithered i16 quantization; Pallas on TPU, numpy TPD elsewhere."""
    if isinstance(x, jnp.ndarray) and x.devices() and \
            next(iter(x.devices())).platform in ("tpu", "axon"):
        try:
            return np.asarray(dither_to_i16_tpu(x, seed), np.int16)
        except Exception:
            pass
    x = np.asarray(x, np.float32)
    rng = np.random.RandomState(seed)
    # triangular (TPD) dither, +-1 LSB
    tpd = rng.rand(*x.shape) - rng.rand(*x.shape)
    q = np.floor(x * 32767.0 + tpd + 0.5)
    return np.clip(q, -32768, 32767).astype(np.int16)


# --- u-law 8-bit bounce (preview-grade serving) -----------------------------
# Halves readback bytes again vs int16: y = sign(x) ln(1+255|x|)/ln(256)
# companded to 8 bits with RPDF dither.  ~48 dB SNR at full scale (G.711
# territory) — preview/monitor quality, chosen explicitly by the caller.

_MU = 255.0


def _ulaw_kernel(seed_ref, x_ref, out_ref):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    pltpu.prng_seed(seed_ref[0] + pl.program_id(0))
    x = jnp.clip(x_ref[...], -1.0, 1.0)
    # constants must be f32 inside the kernel (no f64 on TPU Pallas)
    inv_log = jnp.float32(1.0 / np.log(1.0 + _MU))
    y = jnp.sign(x) * jnp.log1p(jnp.float32(_MU) * jnp.abs(x)) * inv_log
    scaled = (y * 0.5 + 0.5) * 255.0
    bits = pltpu.prng_random_bits(scaled.shape)
    u = bits.astype(jnp.float32) / jnp.float32(2**32) + 0.5
    q = jnp.floor(scaled + u)
    out_ref[...] = jnp.clip(q, 0.0, 255.0).astype(jnp.int32)


def ulaw_to_u8_tpu(x, seed: int = 0):
    """(C, T) f32 in [-1,1] -> (C, T) int32 of u8 u-law codes, on device
    (same row-tiled grid as dither_to_i16_tpu)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    C, T = x.shape
    lanes = 128
    pad = (-T) % lanes
    xp = jnp.pad(x, ((0, 0), (0, pad)))
    xp = xp.reshape(C * (T + pad) // lanes, lanes)
    rows = xp.shape[0]
    rpad = (-rows) % _ROWS_PER_PROG
    if rpad:
        xp = jnp.pad(xp, ((0, rpad), (0, 0)))
    grid = xp.shape[0] // _ROWS_PER_PROG

    out = pl.pallas_call(
        _ulaw_kernel,
        out_shape=jax.ShapeDtypeStruct(xp.shape, jnp.int32),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((1,), lambda i: (jnp.int32(0),),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((_ROWS_PER_PROG, lanes),
                         lambda i: (i, jnp.int32(0)),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((_ROWS_PER_PROG, lanes),
                               lambda i: (i, jnp.int32(0)),
                               memory_space=pltpu.VMEM),
    )(jnp.asarray([seed], jnp.int32), xp)
    return out[:rows].reshape(C, T + pad)[:, :T]


def ulaw_encode_u8(x, seed: int = 0):
    """u-law companded 8-bit codes; Pallas on TPU, numpy elsewhere."""
    if isinstance(x, jnp.ndarray) and x.devices() and \
            next(iter(x.devices())).platform in ("tpu", "axon"):
        try:
            return np.asarray(ulaw_to_u8_tpu(x, seed), np.uint8)
        except Exception:
            pass
    x = np.clip(np.asarray(x, np.float32), -1.0, 1.0)
    y = np.sign(x) * np.log1p(_MU * np.abs(x)) / np.log(1.0 + _MU)
    rng = np.random.RandomState(seed)
    q = np.floor((y * 0.5 + 0.5) * 255.0 + rng.rand(*x.shape))
    return np.clip(q, 0, 255).astype(np.uint8)


def ulaw_decode_u8(codes) -> np.ndarray:
    """Expand u8 u-law codes back to f32 (host-side consumer step).

    The encoder stochastically rounds with E[code] = scaled value, so the
    unbiased inverse is codes/255 (a +0.5-LSB shift would bias every
    sample and expand code 255 past full scale); output clips to [-1, 1]
    like the encoder's input domain."""
    y = np.asarray(codes, np.float32) / 255.0 * 2.0 - 1.0
    out = (np.sign(y) * (np.power(1.0 + _MU, np.abs(y)) - 1.0) / _MU)
    return np.clip(out, -1.0, 1.0).astype(np.float32)
