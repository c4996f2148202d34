"""WaveShaper curve lookup as a fused Pallas kernel.

The XLA two-hot curve formulation (nodes/waveshaper.py::apply_curve)
materializes a (samples, SEG+1) one-hot and a (samples, nseg) segment
matrix in HBM — ~750 MB per 4x-oversampled mastering block, the largest
single term left in that chain.  This kernel keeps the lookup in VMEM:
the cheap index/fraction math (v, ki, f, hi, lo) runs as fused XLA
elementwise ops, and the kernel streams (lo, f, hi) tiles through VMEM,
builds the two-hot in registers, contracts on the MXU, and iota-selects
the segment — HBM traffic is ~16 bytes per sample.

The axon remote Mosaic compiler rejects every variant of this kernel
family tried (computed or input-fed operands, gridded or gridless —
HTTP 500 from the compile helper), even though the structurally similar
windowed-read kernel (input-fed one-hot -> dot under a grid) compiles;
the exact trigger is unisolated.  The kernel is verified in interpret
mode, AOT-lowers for TPU locally, and is smoke-gated per session by
benches/run_tpu_r3.py (WEBAUDIO_CURVE=pallas enables it on healthy
backends); indices are computed XLA-side regardless, which is the
cheaper split anyway.

Math is identical to apply_curve's matmul path (same index/fraction
formulas, HIGHEST-precision dot, two nonzero lanes), which is itself
bit-compatible with the reference's gather+lerp (waveshaper.rs:556-573).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

R = 1024     # samples per grid step


_PREC = {"highest": jax.lax.Precision.HIGHEST,
         "default": jax.lax.Precision.DEFAULT}


def _kernel(lo_ref, f_ref, hi_ref, table_ref, out_ref, *, seg: int,
            nseg: int, prec: str):
    one = jnp.float32(1.0)
    zero = jnp.float32(0.0)
    lo = lo_ref[...]                                      # (R, 1) i32
    f = f_ref[...]                                        # (R, 1) f32
    hi = hi_ref[...]                                      # (R, 1) i32
    lanes = jax.lax.broadcasted_iota(jnp.int32, (1, seg + 1), 1)
    oh = (jnp.where(lanes == lo, one - f, zero)
          + jnp.where(lanes == lo + jnp.int32(1), f, zero))   # (R, seg+1)
    P = jax.lax.dot_general(
        oh, table_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=_PREC[prec])                                # (R, nseg)
    segs = jax.lax.broadcasted_iota(jnp.int32, (1, nseg), 1)
    out_ref[...] = jnp.sum(jnp.where(segs == hi, P, zero), axis=1,
                           keepdims=True)


def _kernel_v2(lo_ref, f_ref, hi_ref, table_ref, out_ref, *, seg: int,
               nseg: int, prec: str):
    """Windowed-read-shaped variant: samples ride the LANE axis (128
    minor), one row of 128 samples per inner step — the same block
    geometry as ops/grain_read.py::_kernel, which the axon remote Mosaic
    accepts, where the original (R, 1)-laned kernel gets an HTTP 500.
    Math identical: two-hot over the segment width, dot against the
    (nseg, seg+1) table, iota-select the sample's segment row."""
    one = jnp.float32(1.0)
    zero = jnp.float32(0.0)
    for j in range(GV2):
        j32 = jnp.int32(j)   # python ints lift to i64 under x64
        lo = lo_ref[j32, :][None, :]                       # (1, Q)
        fr = f_ref[j32, :][None, :]
        hi = hi_ref[j32, :][None, :]
        lanes = jax.lax.broadcasted_iota(
            jnp.int32, (seg + 1, lo.shape[1]), 0)          # (seg+1, Q)
        ohT = (jnp.where(lanes == lo, one - fr, zero)
               + jnp.where(lanes == lo + jnp.int32(1), fr, zero))
        P = jax.lax.dot_general(
            table_ref[...], ohT, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=_PREC[prec])                         # (nseg, Q)
        segs = jax.lax.broadcasted_iota(
            jnp.int32, (nseg, lo.shape[1]), 0)
        out_ref[j32, :] = jnp.sum(jnp.where(segs == hi, P, zero), axis=0)


GV2 = 16   # sample rows (of Q lanes) per grid step in the v2 kernel
QV2 = 128  # samples per row
# v3 row geometry: WIDE rows so each in-kernel dot is MXU-shaped.  At
# (GV2, QV2) = (16, 128) the kernel issued one tiny (nseg, segp)@(segp,
# 128) dot per 128 samples — ~30k serialized dots per mastering block,
# measured SLOWER in situ than the XLA two-hot despite zero HBM one-hot
# traffic.  (4, 2048) keeps VMEM blocks small (~1 MB one-hot) while each
# dot contracts against 2048 lanes.
GV3 = 8    # rows per grid step (sublane-divisible: Pallas
           # requires the block's penultimate dim % 8 == 0)
QV3 = 2048  # samples per row


def _kernel_v3(lo_ref, f_ref, hi_ref, table_ref, out_ref, *, segp: int,
               nseg: int, prec: str):
    """v3: v2 with the dot contraction over a 128-PADDED segment axis —
    v2 contracted over seg+1 = 65, not a sublane/lane multiple, where the
    (remote-compiling) grain kernel's W is always a 64-multiple.  Math
    unchanged: the pad lanes of the two-hot are structurally zero
    (lo <= seg-1 < segp-1).  (A rank-2 traced-row write was also tried
    and hits a local Mosaic _masked_swap lowering bug; the rank-1 row
    write lowers.)"""
    zero = jnp.float32(0.0)
    one = jnp.float32(1.0)
    for j in range(GV3):
        j32 = jnp.int32(j)   # python ints lift to i64 under x64
        lo = lo_ref[j32, :][None, :]                       # (1, Q)
        fr = f_ref[j32, :][None, :]
        hi = hi_ref[j32, :][None, :]
        # two-hot as the triangular hat max(0, 1-|l-(lo+f)|): bit-equal
        # to the two-where construct (lo+f < segp <= 2^7 is f32-exact)
        # in ~3 VPU ops per lane instead of ~5
        lanes = jax.lax.broadcasted_iota(
            jnp.int32, (segp, lo.shape[1]), 0).astype(jnp.float32)
        pos = lo.astype(jnp.float32) + fr
        ohT = jnp.maximum(zero, one - jnp.abs(lanes - pos))  # (segp, Q)
        P = jax.lax.dot_general(
            table_ref[...], ohT, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=_PREC[prec])                         # (nseg, Q)
        segs = jax.lax.broadcasted_iota(
            jnp.int32, (nseg, lo.shape[1]), 0)
        out_ref[j32, :] = jnp.sum(jnp.where(segs == hi, P, zero), axis=0)


@functools.lru_cache(maxsize=1)
def pallas3_supported() -> bool:
    """One-time probe: does the current default backend compile the v3
    kernel (curve_lookup_tpu_v3)?  Session-5 bisect (2026-08-17): the
    axon remote Mosaic accepts v3's gridded-table form and it beats the
    XLA two-hot in situ (mastering 920x -> 1359x steady state), but
    earlier Mosaic builds HTTP-500 the whole kernel family — so `auto`
    mode probes once per process instead of assuming.  Compile-only
    (block_until_ready, no host readback — device->host transfers have a
    minutes-scale per-shape setup on the tunneled backend); the
    persistent compile cache makes the probe ~1 s after the first
    session.  Numerics are separately smoke-checked on chip by
    benches/run_tpu_r4.py (maxdev 1.2e-7)."""
    try:
        if jax.devices()[0].platform not in ("tpu", "axon"):
            return False
        segk = 127
        n = 255
        nseg = -(-n // segk)
        table = jnp.zeros((nseg, segk + 1), jnp.float32)
        x = jnp.zeros((GV3 * QV3,), jnp.float32)
        jax.block_until_ready(curve_lookup_tpu_v3(x, table, n, segk))
        return True
    except Exception:
        return False


@functools.partial(jax.jit,
                   static_argnames=("n", "seg", "interpret", "prec",
                                    "gridded_table"))
def curve_lookup_tpu_v3(x_flat, table, n: int, seg: int,
                        interpret: bool = False, prec: str = "highest",
                        gridded_table: bool = True):
    """x_flat (M,) f32; table (nseg, seg+1) f32 -> (M,) f32.  Same math
    as curve_lookup_tpu_v2 with tile-aligned dot operands (_kernel_v3).

    gridded_table=True (default) block-maps the table with a constant
    index map instead of an ungridded full-VMEM operand.  THIS ISOLATED
    THE REMOTE-MOSAIC FAILURE: the axon compile helper HTTP-500s on any
    kernel with a no-block-shape VMEM operand (v1/v2/gridded_table=False
    all fail; this exact kernel with the constant-index-map table
    compiles and matches to 1.2e-7 on chip — bisected 2026-08-17).  The
    windowed-read kernel always compiled because it block-maps every
    input."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    nseg = table.shape[0]
    segp = 128 * ((seg + 1 + 127) // 128)     # padded contraction axis
    tpad = jnp.zeros((nseg, segp), jnp.float32).at[:, :seg + 1].set(table)
    M = x_flat.shape[0]
    row = GV3 * QV3
    pad = (-M) % row
    xp = jnp.pad(x_flat, (0, pad)).reshape((M + pad) // QV3, QV3)

    v = jnp.float32((n - 1) / 2.0) * (xp + jnp.float32(1.0))
    v = jnp.clip(v, jnp.float32(0.0), jnp.float32(n - 1))
    ki = jnp.minimum(jnp.floor(v).astype(jnp.int32), jnp.int32(n - 2))
    f = (v - ki.astype(jnp.float32)).astype(jnp.float32)
    hi = ki // jnp.int32(seg)
    lo = ki - hi * jnp.int32(seg)
    NB = xp.shape[0]

    table_spec = (pl.BlockSpec((nseg, segp),
                               lambda i: (jnp.int32(0), jnp.int32(0)),
                               memory_space=pltpu.VMEM)
                  if gridded_table
                  else pl.BlockSpec(memory_space=pltpu.VMEM))
    out = pl.pallas_call(
        functools.partial(_kernel_v3, segp=segp, nseg=nseg, prec=prec),
        out_shape=jax.ShapeDtypeStruct((NB, QV3), jnp.float32),
        grid=(NB // GV3,),
        in_specs=[
            pl.BlockSpec((GV3, QV3), lambda i: (i, jnp.int32(0)),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((GV3, QV3), lambda i: (i, jnp.int32(0)),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((GV3, QV3), lambda i: (i, jnp.int32(0)),
                         memory_space=pltpu.VMEM),
            table_spec,
        ],
        out_specs=pl.BlockSpec((GV3, QV3), lambda i: (i, jnp.int32(0)),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(lo, f, hi, tpad)
    return out.reshape(-1)[:M]


@functools.partial(jax.jit,
                   static_argnames=("n", "seg", "interpret", "prec"))
def curve_lookup_tpu_v2(x_flat, table, n: int, seg: int,
                        interpret: bool = False, prec: str = "highest"):
    """x_flat (M,) f32; table (nseg, seg+1) f32 (the UNtransposed segment
    table from apply_curve) -> (M,) f32.  Same math as curve_lookup_tpu
    with the grain_read-style block geometry (see _kernel_v2)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    nseg = table.shape[0]
    M = x_flat.shape[0]
    row = GV3 * QV3
    pad = (-M) % row
    xp = jnp.pad(x_flat, (0, pad)).reshape((M + pad) // QV3, QV3)

    v = jnp.float32((n - 1) / 2.0) * (xp + jnp.float32(1.0))
    v = jnp.clip(v, jnp.float32(0.0), jnp.float32(n - 1))
    ki = jnp.minimum(jnp.floor(v).astype(jnp.int32), jnp.int32(n - 2))
    f = (v - ki.astype(jnp.float32)).astype(jnp.float32)
    hi = ki // jnp.int32(seg)
    lo = ki - hi * jnp.int32(seg)
    NB = xp.shape[0]

    out = pl.pallas_call(
        functools.partial(_kernel_v2, seg=seg, nseg=nseg, prec=prec),
        out_shape=jax.ShapeDtypeStruct((NB, QV3), jnp.float32),
        grid=(NB // GV3,),
        in_specs=[
            pl.BlockSpec((GV3, QV3), lambda i: (i, jnp.int32(0)),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((GV3, QV3), lambda i: (i, jnp.int32(0)),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((GV3, QV3), lambda i: (i, jnp.int32(0)),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((GV3, QV3), lambda i: (i, jnp.int32(0)),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(lo, f, hi, table)
    return out.reshape(-1)[:M]


@functools.partial(jax.jit,
                   static_argnames=("n", "seg", "interpret", "prec"))
def curve_lookup_tpu(x_flat, table_t, n: int, seg: int,
                     interpret: bool = False, prec: str = "highest"):
    """x_flat (M,) f32 in any range; table_t (SEG+1, nseg) f32 (the
    transposed segment table from apply_curve) -> (M,) f32."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    nseg = table_t.shape[1]
    M = x_flat.shape[0]
    pad = (-M) % R
    xp = jnp.pad(x_flat, (0, pad)).reshape(M + pad, 1)

    # index/fraction math in XLA (fused elementwise), same formulas as
    # apply_curve
    v = jnp.float32((n - 1) / 2.0) * (xp + jnp.float32(1.0))
    v = jnp.clip(v, jnp.float32(0.0), jnp.float32(n - 1))
    ki = jnp.minimum(jnp.floor(v).astype(jnp.int32), jnp.int32(n - 2))
    f = (v - ki.astype(jnp.float32)).astype(jnp.float32)
    hi = ki // jnp.int32(seg)
    lo = ki - hi * jnp.int32(seg)

    out = pl.pallas_call(
        functools.partial(_kernel, seg=seg, nseg=nseg, prec=prec),
        out_shape=jax.ShapeDtypeStruct((M + pad, 1), jnp.float32),
        grid=((M + pad) // R,),
        in_specs=[
            pl.BlockSpec((R, 1), lambda i: (i, jnp.int32(0)),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((R, 1), lambda i: (i, jnp.int32(0)),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((R, 1), lambda i: (i, jnp.int32(0)),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((R, 1), lambda i: (i, jnp.int32(0)),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(lo, f, hi, table_t)
    return out.reshape(-1)[:M]
