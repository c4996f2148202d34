"""Windowed two-hot buffer reads as a fused Pallas kernel.

The fused grain-bank's read path (graph/fusion.py) and the buffer-source
const-rate path fetch, per (lane, sub-block), one contiguous (C, W)
window and select/lerp per-sample values with a two-hot contraction.  In
plain XLA that batched small-N dot lowers to a broadcast-multiply-reduce
which materializes the full (batch, Qs, W) one-hot in HBM — slower than
the per-sample gathers it replaces.  Here the selection runs as ONE
Pallas kernel: the window tensor (gathered XLA-side with one descriptor
per window — cheap, ~1.5 KB slices) streams through VMEM blocks, the
two-hot builds in registers and contracts on the MXU, and the one-hot
never touches HBM.

The axon remote Mosaic compiler rejects manual in-kernel DMA with
dynamic offsets (benches/pallas_features.py bisect), so windows are
gathered by XLA `vmap(dynamic_slice)` outside the kernel; index maps
construct jnp.int32 block indices in-body (Python ints lift to i64 under
jax_enable_x64 and the remote Mosaic rejects them).

Numerics match the XLA formulation (two nonzero lanes -> a*(1-f) + b*f,
f32 accumulate) — covered by the interpret-mode unit test and the lane
kernel's gather-vs-window regression.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

G = 16   # windows processed per grid step

# Mosaic dot precision is parameterized so the remote-compile probe can
# bisect backend failures; 'highest' keeps f32-exact accumulation.
_PREC = {"highest": jax.lax.Precision.HIGHEST,
         "default": jax.lax.Precision.DEFAULT}


def _kernel(win_ref, loc_ref, frac_ref, out_ref, *, W: int, C: int,
            prec: str):
    one = jnp.float32(1.0)
    zero = jnp.float32(0.0)
    for j in range(G):
        j32 = jnp.int32(j)   # python ints lift to i64 under x64
        loc = loc_ref[j32, :][None, :]                     # (1, Qs)
        fr = frac_ref[j32, :][None, :]
        lanes = jax.lax.broadcasted_iota(
            jnp.int32, (W, loc.shape[1]), 0)               # (W, Qs)
        ohT = (jnp.where(lanes == loc, one - fr, zero)
               + jnp.where(lanes == loc + jnp.int32(1), fr, zero))
        y = jax.lax.dot_general(
            win_ref[j32], ohT, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=_PREC[prec])                         # (C, Qs)
        out_ref[:, j32, :] = y


@functools.partial(jax.jit,
                   static_argnames=("Qs", "W", "interpret", "prec"))
def windowed_read_tpu(data_win, w0, loc, frac, Qs: int, W: int,
                      interpret: bool = False, prec: str = "highest"):
    """data_win (C, Lp) f32; w0 (NB,) i32 window starts; loc (NB, Qs) i32
    in [0, W-2]; frac (NB, Qs) f32 -> (C, NB, Qs) f32 lerped samples."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    C = data_win.shape[0]
    NB = w0.shape[0]
    pad = (-NB) % G
    w0 = w0.astype(jnp.int32)
    loc = loc.astype(jnp.int32)
    if pad:
        w0 = jnp.pad(w0, (0, pad))
        loc = jnp.pad(loc, ((0, pad), (0, 0)))
        frac = jnp.pad(frac, ((0, pad), (0, 0)))
    NBp = NB + pad

    # one descriptor per (C, W) window — XLA-side gather, cheap
    win = jax.vmap(
        lambda s: jax.lax.dynamic_slice(
            data_win, (jnp.int32(0), s), (C, W)))(w0)      # (NBp, C, W)

    out = pl.pallas_call(
        functools.partial(_kernel, W=W, C=C, prec=prec),
        out_shape=jax.ShapeDtypeStruct((C, NBp, Qs), jnp.float32),
        grid=(NBp // G,),
        in_specs=[
            pl.BlockSpec((G, C, W),
                         lambda i: (i, jnp.int32(0), jnp.int32(0)),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((G, Qs), lambda i: (i, jnp.int32(0)),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((G, Qs), lambda i: (i, jnp.int32(0)),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (C, G, Qs), lambda i: (jnp.int32(0), i, jnp.int32(0)),
            memory_space=pltpu.VMEM),
        interpret=interpret,
    )(win, loc, frac)
    return out[:, :NB, :]


def windowed_read_reference(data_win, w0, loc, frac):
    """Pure-numpy oracle for the kernel (tests)."""
    data = np.asarray(data_win)
    w0 = np.asarray(w0)
    loc = np.asarray(loc)
    frac = np.asarray(frac)
    C = data.shape[0]
    NB, Qs = loc.shape
    out = np.zeros((C, NB, Qs), np.float32)
    for b in range(NB):
        idx = w0[b] + loc[b]
        a = data[:, idx]
        bb = data[:, idx + 1]
        out[:, b, :] = a * (1 - frac[b]) + bb * frac[b]
    return out


def windowed_lerp(data_win, pi, fr, Qs: int, W: int, wrap_len: int = 0):
    """Shared windowed two-hot fetch: pi/fr (R, B) int32/f32 (monotone per
    Qs sub-block) -> (C, R, B).

    `wrap_len > 0` serves whole-buffer loops: pi is the UNWRAPPED
    (monotone) sample index, the window start wraps mod wrap_len, and
    data_win carries the loop continuation copied past column wrap_len —
    so in-window offsets stay linear across the seam (valid only when the
    loop length is integral, i.e. loop spans the whole buffer).

    Dispatches to the fused Pallas kernel on TPU; elsewhere evaluates the
    XLA dot formulation (numerically identical, used by tests)."""
    R, B = pi.shape
    C = data_win.shape[0]
    S = B // Qs
    piq = pi.reshape(R * S, Qs)
    frq = fr.reshape(R * S, Qs)
    # monotone within the sub-block -> the min sits at an endpoint
    w0 = jnp.minimum(piq[:, 0], piq[:, -1])                  # (R*S,)
    loc = jnp.clip(piq - w0[:, None], 0, W - 2)
    if wrap_len:
        w0 = w0 % jnp.int32(wrap_len)
    if jax.devices()[0].platform in ("tpu", "axon"):
        out = windowed_read_tpu(data_win, w0, loc, frq, Qs, W)
        return out.reshape(C, R, B)
    win = jax.vmap(
        lambda s: jax.lax.dynamic_slice(
            data_win, (jnp.int32(0), s), (C, W)))(w0)        # (R*S, C, W)
    lanes = jnp.arange(W, dtype=jnp.int32)[None, None, :]
    oh = (jnp.where(lanes == loc[:, :, None],
                    (1.0 - frq)[:, :, None], 0.0)
          + jnp.where(lanes == loc[:, :, None] + 1,
                      frq[:, :, None], 0.0))                 # (R*S, Qs, W)
    out = jax.lax.dot_general(
        oh, win, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST)                 # (R*S, Qs, C)
    return jnp.transpose(out, (2, 0, 1)).reshape(C, R, B)


def pick_window(rmax: float, block_frames: int):
    """(Qs, W) windowed-read geometry for max |buffer-samples per output
    frame| `rmax`, or (0, 0) when no bounded window fits.  Qs stays <= one
    render quantum (callers' per-quantum grain/variant switches bound the
    monotone span)."""
    for Qs in (128, 64, 32):
        if block_frames % Qs:
            continue
        W = 64 * int(np.ceil((Qs * rmax + 6) / 64.0))
        if W <= 512 and W <= 4 * Qs:
            return Qs, W
    return 0, 0


# --- grouped rows: the descriptor-amortized pure-XLA read -------------------
# pair_rows generalized: one gathered row serves g consecutive output
# samples (row width w ~= g*rmax + taps), so gather descriptors drop by g
# while per-sample selection becomes a short elementwise where-chain over
# the row lanes (XLA fuses it into one pass).  Unlike the Pallas windowed
# kernel this adds no grid/launch serialization — measured the fastest
# formulation on the tunneled v5e.


def pick_group(rmax: float, C: int, L: int, block_frames: int,
               wide: bool = False):
    """(g, w) grouped-row geometry, or (0, 0) when ineligible.  Bounds:
    row width w <= 32 lanes and the staged row matrix <= 128 MB.

    `wide=True` is the FUSED-kernel geometry: prefer g=32 (half the
    gather descriptors; the row axis is a VMEM sublane dimension there,
    so w ~= 39 is legal) — in-situ sweep benches/probe_gf3.py: g32
    kernel path 2.25 ms vs 3.50 ms at g16 on the 800-grain case.

    WEBAUDIO_GRAIN_GROUP forces the group size: the XLA select's HBM
    traffic scales with w ~= g*rmax (two (w, C, s_tot) broadcast
    intermediates), so g=8 trades 2x gather descriptors for ~43% less
    select traffic — an in-situ A/B knob (benches/run_tpu_r5.py)."""
    import os

    forced = int(os.environ.get("WEBAUDIO_GRAIN_GROUP", "0"))
    wmax = 48 if (forced or wide) else 32
    cands = (forced,) if forced else ((32, 16, 8) if wide else (16, 8))
    for g in cands:
        if block_frames % g or g > RENDER_QUANTUM_MAX_GROUP:
            continue
        w = int(np.ceil(g * rmax)) + 3
        if w <= wmax and (L + 2) * C * w * 4 <= (128 << 20):
            return g, w
    return 0, 0


RENDER_QUANTUM_MAX_GROUP = 128   # group must stay within one quantum


def stage_rows(data_ext: np.ndarray, w: int) -> np.ndarray:
    """(C, Lp) window layout -> (N, C, w) row matrix, N = Lp - w + 1
    (covers starts 0..wrap_len; the extended columns provide loop
    continuation / edge constants exactly like the windowed layout)."""
    from numpy.lib.stride_tricks import sliding_window_view

    sw = sliding_window_view(np.ascontiguousarray(data_ext), w, axis=1)
    return np.ascontiguousarray(sw.transpose(1, 0, 2))       # (N, C, w)


def grouped_row_lerp_t(rows_g, pi, fr, g: int, w: int, wrap_len: int = 0):
    """Transposed grouped-row two-hot: same contract as grouped_row_lerp,
    but every tensor in the select/lerp carries the SAMPLE axis as its
    minor (lane) dimension.  The straight formulation's intermediates are
    (R*S, g, w) with minor dims g=16/w~21 — TPU tiles pad the lane dim to
    128, so the fused select ran at ~1/6 lane utilization.  Here the
    gathered rows transpose once to (w, C, R*S) and the two-hot weights
    build as (w, S_tot) with S_tot = R*B minor — full 128-lane tiles —
    and the reduce runs over the w MAJOR axis.  Numerics identical (f32
    multiply + axis-reduce in the same lane order)."""
    R, B = pi.shape
    C = rows_g.shape[1]
    S = B // g
    piq = pi.reshape(R * S, g)
    frq = fr.reshape(R * S, g)
    w0 = jnp.minimum(piq[:, 0], piq[:, -1])                  # (R*S,)
    loc = jnp.clip(piq - w0[:, None], 0, w - 2)              # (R*S, g)
    if wrap_len:
        w0 = w0 % jnp.int32(wrap_len)
    rows = rows_g[w0]                                        # (R*S, C, w)
    rows_t = jnp.transpose(rows, (2, 1, 0))                  # (w, C, R*S)
    s_tot = R * B
    loc_s = loc.reshape(1, s_tot)                            # sample order
    fr_s = frq.reshape(1, s_tot)
    wgrid = jnp.arange(w, dtype=jnp.int32)[:, None]          # (w, 1)
    twp = (jnp.where(wgrid == loc_s, 1.0 - fr_s, 0.0)
           + jnp.where(wgrid == loc_s + 1, fr_s, 0.0))       # (w, s_tot)
    vals = jnp.broadcast_to(
        rows_t[:, :, :, None], (w, C, R * S, g)).reshape(w, C, s_tot)
    out = jnp.sum(twp[:, None, :] * vals, axis=0)            # (C, s_tot)
    return out.reshape(C, R, B)


_MPL = 512   # groups (gathered rows) per grid step in the packed kernel


def _kernel_grouped_pl(packed_ref, out_ref, *, g: int, w: int, C: int):
    """Packed grouped-select kernel: one (M, 128) block carries, per
    gathered row, ch0 row lanes [0:32], ch1 [64:96], loc (as f32)
    [32:32+g], frac [48:48+g].  For each of the C*g output columns the
    two-hot weight (1-fr at lane loc, fr at loc+1 — the same f32 terms
    as grouped_row_lerp_t, so outputs are BIT-identical) multiplies the
    32-lane row chunk and lane-reduces — the (w, ..., g) broadcast that
    costs ~2x667 MB/render in the XLA formulation never leaves VMEM.
    All operands block-mapped with static index maps — the shape family
    the remote Mosaic accepts (ops/curve_kernel.py::curve_lookup_tpu_v3)."""
    zero = jnp.float32(0.0)
    one = jnp.float32(1.0)
    pk = packed_ref[...]                                   # (M, 128)
    lanes32 = jax.lax.broadcasted_iota(
        jnp.int32, (pk.shape[0], 32), 1).astype(jnp.float32)
    cols = []
    for c in range(C):
        rows_c = pk[:, c * 64:c * 64 + 32]                 # (M, 32)
        for s in range(g):
            locf = pk[:, 32 + s][:, None]                  # (M, 1)
            fr = pk[:, 48 + s][:, None]
            tw = (jnp.where(lanes32 == locf, one - fr, zero)
                  + jnp.where(lanes32 == locf + one, fr, zero))
            cols.append(jnp.sum(rows_c * tw, axis=1, keepdims=True))
    res = jnp.concatenate(cols, axis=1)                    # (M, C*g)
    if C * g < 128:
        res = jnp.concatenate(
            [res, jnp.zeros((pk.shape[0], 128 - C * g), jnp.float32)],
            axis=1)
    out_ref[...] = res


@functools.partial(jax.jit,
                   static_argnames=("g", "w", "wrap_len", "interpret"))
def grouped_row_lerp_pl(rows_g, pi, fr, g: int, w: int, wrap_len: int = 0,
                        interpret: bool = False):
    """Pallas variant of grouped_row_lerp_t (same contract, bit-identical
    outputs: each output is the same two products in the same f32 adds).
    Requires C <= 2, g <= 16, w <= 32 (pick_group guarantees g/w).
    Opt-in study mode (WEBAUDIO_GRAIN_READ=grouped_pl) — the XLA
    formulation's two ~(w, C, R*B) broadcast intermediates dominate the
    high-density granular case's HBM traffic (benches/SUB1000_ANALYSIS.md
    round-4 addendum)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    # CPU (test) backends run the kernel in interpret mode so the render
    # A/B works everywhere; TPU backends compile it
    interpret = interpret or jax.devices()[0].platform not in ("tpu", "axon")
    R, B = pi.shape
    C = rows_g.shape[1]
    assert C <= 2 and g <= 16 and w <= 32, (C, g, w)
    S = B // g
    piq = pi.reshape(R * S, g)
    frq = fr.reshape(R * S, g)
    w0 = jnp.minimum(piq[:, 0], piq[:, -1])
    loc = jnp.clip(piq - w0[:, None], 0, w - 2)
    if wrap_len:
        w0 = w0 % jnp.int32(wrap_len)
    rows = rows_g[w0]                                      # (R*S, C, w)

    RS = R * S
    RSp = ((RS + _MPL - 1) // _MPL) * _MPL
    packed = jnp.zeros((RSp, 128), jnp.float32)
    for c in range(C):
        packed = packed.at[:RS, c * 64:c * 64 + w].set(rows[:, c, :])
    packed = packed.at[:RS, 32:32 + g].set(loc.astype(jnp.float32))
    packed = packed.at[:RS, 48:48 + g].set(frq)

    out = pl.pallas_call(
        functools.partial(_kernel_grouped_pl, g=g, w=w, C=C),
        out_shape=jax.ShapeDtypeStruct((RSp, 128), jnp.float32),
        grid=(RSp // _MPL,),
        in_specs=[pl.BlockSpec((_MPL, 128), lambda i: (i, jnp.int32(0)),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((_MPL, 128), lambda i: (i, jnp.int32(0)),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(packed)
    res = out[:RS, :C * g].reshape(RS, C, g)
    return jnp.transpose(res, (1, 0, 2)).reshape(C, R, B)


def grouped_row_lerp_t2(rows_g, pi, fr, g: int, w: int, wrap_len: int = 0):
    """Broadcast-only transposed select (no reshape through the broadcast).

    grouped_t's `broadcast_to(...).reshape(w, C, s_tot)` folds the group
    dim into the minor axis, which forces XLA to MATERIALIZE the (w, C,
    s_tot) expansion (+ the product) — ~4.3 GB/render measured on the
    800-grain case.  Here every operand keeps (w, C, R*S, g) axes and
    only broadcasts feed the w-axis reduce, so the whole select can fuse
    into one pass over the gathered rows; the g=16 minor axis costs lane
    padding, the bet is that fusion beats padding.  Bit-identical math
    (same two f32 products per output)."""
    R, B = pi.shape
    C = rows_g.shape[1]
    S = B // g
    piq = pi.reshape(R * S, g)
    frq = fr.reshape(R * S, g)
    w0 = jnp.minimum(piq[:, 0], piq[:, -1])                  # (R*S,)
    loc = jnp.clip(piq - w0[:, None], 0, w - 2)              # (R*S, g)
    if wrap_len:
        w0 = w0 % jnp.int32(wrap_len)
    rows = rows_g[w0]                                        # (R*S, C, w)
    rows_t = jnp.transpose(rows, (2, 1, 0))                  # (w, C, R*S)
    wgrid = jnp.arange(w, dtype=jnp.int32)[:, None, None]    # (w, 1, 1)
    twp = (jnp.where(wgrid == loc[None], 1.0 - frq[None], 0.0)
           + jnp.where(wgrid == loc[None] + 1, frq[None], 0.0))
    # twp (w, R*S, g); rows_t broadcast along g; reduce over w
    out = jnp.sum(twp[:, None, :, :] * rows_t[:, :, :, None],
                  axis=0)                                    # (C, R*S, g)
    return out.reshape(C, R, B)


def grouped_row_lerp_dot(rows_g, pi, fr, g: int, w: int, wrap_len: int = 0):
    """dot_general grouped select: same contract as grouped_row_lerp_t.

    The XLA multiply-reduce formulations materialize their broadcast
    intermediates because the (R*S, g) -> s_tot reshape folds the
    broadcast dim into the minor axis (grouped_t's two ~667 MB tensors =
    the measured 4.4 GB/render on the 800-grain case).  Expressed as a
    batched contraction instead — batch rs, contract w:
        out[rs, j, c] = sum_w  tw[rs, j, w] * rows[rs, c, w]
    nothing larger than the (R*S, g, w) two-hot weights ever exists, so
    HBM traffic drops to tw (w/g f32 per sample) + rows + out.  The tiny
    per-batch (g, w) x (w, C) dots are VPU-lowered loop fusions, not MXU
    work — the bet is bandwidth, not FLOPs.  Numerically identical to
    grouped_row_lerp/_t: each output is the same two f32 products."""
    R, B = pi.shape
    C = rows_g.shape[1]
    S = B // g
    piq = pi.reshape(R * S, g)
    frq = fr.reshape(R * S, g)
    w0 = jnp.minimum(piq[:, 0], piq[:, -1])                  # (R*S,)
    loc = jnp.clip(piq - w0[:, None], 0, w - 2)              # (R*S, g)
    if wrap_len:
        w0 = w0 % jnp.int32(wrap_len)
    rows = rows_g[w0]                                        # (R*S, C, w)
    lanes = jnp.arange(w, dtype=jnp.int32)[None, None, :]    # (1, 1, w)
    tw = (jnp.where(lanes == loc[:, :, None],
                    (1.0 - frq)[:, :, None], 0.0)
          + jnp.where(lanes == loc[:, :, None] + 1,
                      frq[:, :, None], 0.0))                 # (R*S, g, w)
    out = jax.lax.dot_general(
        tw, rows, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST)                 # (R*S, g, C)
    return jnp.transpose(out, (2, 0, 1)).reshape(C, R, B)


_MGV = 1024  # sample-groups per grid step in the VMEM-select kernel


def _kernel_grouped_v(rows_ref, loc_ref, fr_ref, out_ref, *, g: int,
                      w: int, C: int):
    """VMEM grouped select (the SUB1000_ANALYSIS round-4 candidate,
    simplified to zero dots): every operand rides the GROUP axis as its
    minor (lane) dimension, so each VPU op runs full 128-lane tiles and
    the (w, C, s_tot)-sized expansion the XLA formulations materialize
    in HBM (2x ~667 MB/render on the 800-grain case) lives only as a
    (g, MGV) register accumulator.  Per static row-lane u, the two-hot
    weight (1-fr at loc==u, fr at loc==u-1 — the same two f32 products
    in the same u order as grouped_row_lerp_t's w-axis reduce)
    multiplies the broadcast row value and accumulates.  The backend is
    free to contract each mul+accumulate into an FMA, so outputs match
    grouped_row_lerp_t to <=1 ulp OF THE OPERAND SCALE rather than
    bit-exactly — unavoidable: XLA:CPU contracts ANY formulation of
    this shape (stack+reduce and optimization_barrier both measured
    identical), and the contracted form is the more accurate one.
    No dot, no dynamic DMA, static index maps only — well inside the
    remote-Mosaic-accepted shape family (benches/pallas_features.py)."""
    zero = jnp.float32(0.0)
    one = jnp.float32(1.0)
    rows = rows_ref[...]                                   # (Cw_pad, M)
    loc = loc_ref[...]                                     # (g, M) i32
    fr = fr_ref[...]                                       # (g, M) f32
    acc = [jnp.zeros(loc.shape, jnp.float32) for _ in range(C)]
    for u in range(w):
        u32 = jnp.int32(u)   # python ints lift to i64 under x64
        wgt = jnp.where(loc == u32, one - fr, zero)
        if u:
            wgt = wgt + jnp.where(loc == u32 - jnp.int32(1), fr, zero)
        for c in range(C):
            acc[c] = acc[c] + rows[c * w + u, :][None, :] * wgt
    for c in range(C):
        out_ref[c * g:(c + 1) * g, :] = acc[c]


@functools.partial(jax.jit,
                   static_argnames=("g", "w", "wrap_len", "interpret"))
def grouped_row_lerp_v(rows_g, pi, fr, g: int, w: int, wrap_len: int = 0,
                       interpret: bool = False):
    """Pallas VMEM variant of grouped_row_lerp_t (same contract; same
    two-hot lerp products, matching to <=1 ulp of the operand scale —
    NOT bit-exact, see _kernel_grouped_v on FMA contraction; the other
    grouped modes remain pairwise bit-identical).  Unlike grouped_pl
    there is NO host-side packing pass (the r5-s1 loss mode: the packed
    staging scatters cost more HBM than they saved) and no in-kernel
    dot: inputs stream in their natural gathered layouts, transposed
    once XLA-side so the group axis is minor everywhere."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    interpret = interpret or jax.devices()[0].platform not in ("tpu", "axon")
    R, B = pi.shape
    C = rows_g.shape[1]
    S = B // g
    piq = pi.reshape(R * S, g)
    frq = fr.reshape(R * S, g)
    w0 = jnp.minimum(piq[:, 0], piq[:, -1])                # (R*S,)
    loc = jnp.clip(piq - w0[:, None], 0, w - 2)            # (R*S, g)
    if wrap_len:
        w0 = w0 % jnp.int32(wrap_len)
    rows = rows_g[w0]                                      # (R*S, C, w)

    RS = R * S
    RSp = ((RS + _MGV - 1) // _MGV) * _MGV
    Cw = C * w
    Cwp = ((Cw + 7) // 8) * 8
    # group axis -> minor everywhere; pad groups to the grid multiple
    # and the row-lane axis to a sublane multiple (pad lanes read as 0
    # and pad groups select zero rows — sliced off below)
    rows_t = jnp.transpose(rows, (1, 2, 0)).reshape(Cw, RS)
    rows_t = jnp.pad(rows_t, ((0, Cwp - Cw), (0, RSp - RS)))
    loc_t = jnp.pad(jnp.transpose(loc).astype(jnp.int32),
                    ((0, 0), (0, RSp - RS)))               # (g, RSp)
    fr_t = jnp.pad(jnp.transpose(frq), ((0, 0), (0, RSp - RS)))

    out = pl.pallas_call(
        functools.partial(_kernel_grouped_v, g=g, w=w, C=C),
        out_shape=jax.ShapeDtypeStruct((C * g, RSp), jnp.float32),
        grid=(RSp // _MGV,),
        in_specs=[
            pl.BlockSpec((Cwp, _MGV), lambda i: (jnp.int32(0), i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((g, _MGV), lambda i: (jnp.int32(0), i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((g, _MGV), lambda i: (jnp.int32(0), i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((C * g, _MGV),
                               lambda i: (jnp.int32(0), i),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(rows_t, loc_t, fr_t)
    # (C*g, RSp) -> (C, g, RS) -> (C, RS, g) -> (C, R, B)
    res = out.reshape(C, g, RSp)[:, :, :RS]
    return jnp.transpose(res, (0, 2, 1)).reshape(C, R, B)


_MGF = 2048  # sample-groups per grid step in the fully-fused bank kernel
# (M=2048 + in-kernel transpose measured fastest; M=4096 VMEM-overflows
# the remote Mosaic at g=32 — benches/runs_r05/probe_gf3c.jsonl)


def _kernel_grain_fused(rows_ref, ints_ref, flts_ref, gain_ref, out_ref, *,
                        g: int, w: int, C: int, L: int, gl0: float,
                        gl1: float, tin: bool = False):
    """Fully-fused grain-bank tile: playhead, schedule/bounds masks,
    two-hot row select, end-of-buffer edge correction, and the envelope
    multiply all happen on VMEM-resident (g, M) tiles.

    Motivation (benches/probe_hlo2.py on the 800-grain case): the XLA
    lane path materializes ~1.67 GB/render of full-length intermediates
    — 688 MB layout/carry copies, 228 MB pads, the 95.6 MB stacked
    (6, K, B) broadcast of per-quantum constants — because every
    elementwise stage between the row gather and the K-lane sum lives at
    (K, B) with fusion-breaking transposes/reshapes between them.  Here
    the only HBM tensors are the gathered rows, nine per-GROUP scalar
    rows, the (g, M)-layout envelope, and the (C*g, M) output.

    Layouts: the GROUP axis is the lane (minor) dimension everywhere —
    the grouped_v family the remote Mosaic accepts (static index maps,
    no dots, no dynamic DMA).  ints (8, M) i32 rows: t0 (frame of the
    group's first sample), start/stop frames, base_i (buffer sample at
    the quantum start), w0 (gathered row start).  flts (8, M) f32 rows:
    base_f, rate, js (within-quantum j of the group's first sample),
    ok flag, edge_vals[0], edge_vals[1].  Within a group, consecutive
    sublanes are consecutive samples, so per-sample j/t are affine in
    the sublane iota.  Numerics: the same f32 products/adds as the XLA
    path (fusion.py::_process_grain_lanes) in the same order; the
    backend may FMA-contract the select accumulation exactly as
    _kernel_grouped_v's (<= 1 ulp of the lerp operands)."""
    zero = jnp.float32(0.0)
    one = jnp.float32(1.0)
    zi = jnp.int32(0)
    ints = ints_ref[...]                                   # (8, M) i32
    flts = flts_ref[...]                                   # (8, M) f32
    if tin:
        # gather-natural operands: transpose on the VMEM tile instead of
        # through HBM (the XLA-side (RSp, Cw) -> (Cw, RSp) transpose of
        # the gathered rows was backend-estimated at 2.98 ms/render —
        # runs_r05/hlo_800_fused.txt copy.6)
        rows = rows_ref[...].T                             # (M, Cwp).T
        gv = gain_ref[...].T                               # (M, g).T
    else:
        rows = rows_ref[...]                               # (Cwp, M)
        gv = gain_ref[...]                                 # (g, M)
    M = ints.shape[1]
    sg = jax.lax.broadcasted_iota(jnp.int32, (g, M), 0)    # sublane idx
    t = ints[0, :][None, :] + sg                           # frame (g, M)
    j = flts[2, :][None, :] + sg.astype(jnp.float32)       # within-quantum
    delta = flts[0, :][None, :] + flts[1, :][None, :] * j  # f32 (g, M)
    dfl = jnp.floor(delta)
    idx = ints[3, :][None, :] + dfl.astype(jnp.int32)      # buffer sample
    frac = delta - dfl
    lm1 = jnp.int32(L - 1)
    piv = jnp.clip(idx, zi, lm1)
    loc = jnp.clip(piv - ints[4, :][None, :], zi, jnp.int32(w - 2))
    valid = ((flts[3, :][None, :] > jnp.float32(0.5))
             & (t >= ints[1, :][None, :]) & (t < ints[2, :][None, :])
             & (idx >= zi) & (idx <= lm1))
    acc = [jnp.zeros((g, M), jnp.float32) for _ in range(C)]
    for u in range(w):
        u32 = jnp.int32(u)   # python ints lift to i64 under x64
        wgt = jnp.where(loc == u32, one - frac, zero)
        if u:
            wgt = wgt + jnp.where(loc == u32 - jnp.int32(1), frac, zero)
        for c in range(C):
            acc[c] = acc[c] + rows[c * w + u, :][None, :] * wgt
    # non-loop end-of-buffer rule (fusion.py smp_of): subtract the staged
    # edge constant's contribution at the +1 lerp tap past the buffer
    cond = ((piv + jnp.int32(1) >= jnp.int32(L))
            & ((frac >= jnp.float32(1.0 - 1e-6)) | (piv == zi)))
    et = jnp.where(cond, frac, zero)
    genv = jnp.clip(gv, jnp.float32(gl0), jnp.float32(gl1))
    vals = []
    for c in range(C):
        smp = acc[c] - flts[4 + c, :][None, :] * et
        vals.append(jnp.where(valid, smp, zero) * genv)
    # K-lane reduction ACROSS grid steps: the k axis is the innermost
    # grid dim, every k revisits the same output block, and adds run in
    # ascending k — the same f32 order as the old XLA-side
    # jnp.sum(axis=K), which this replaces (it materialized a
    # (C, g, K, Sp) intermediate + a 470 us reduce per render)
    from jax.experimental import pallas as pl

    first = pl.program_id(1) == 0

    @pl.when(first)
    def _init():
        for c in range(C):
            out_ref[c * g:(c + 1) * g, :] = vals[c]

    @pl.when(jnp.logical_not(first))
    def _accum():
        for c in range(C):
            out_ref[c * g:(c + 1) * g, :] = \
                out_ref[c * g:(c + 1) * g, :] + vals[c]


def grain_bank_fused(rows_gf, t, okf, sv, ev, base_i, base_f, rate, gain,
                     edge, g: int, w: int, L: int, Q: int, gl0: float,
                     gl1: float, interpret: bool = False):
    """Env-knob shim: WEBAUDIO_GF_M overrides the kernel block width
    (sample-groups per grid step; default _MGF) and WEBAUDIO_GF_T picks
    where the gathered rows transpose ('kernel' = on the VMEM tile,
    'xla' = HBM transpose) — A/Bs in benches/probe_gf3.py."""
    import os

    M = int(os.environ.get("WEBAUDIO_GF_M", str(_MGF)))
    tin = os.environ.get("WEBAUDIO_GF_T", "kernel") == "kernel"
    return _grain_bank_fused(rows_gf, t, okf, sv, ev, base_i, base_f,
                             rate, gain, edge, g=g, w=w, L=L, Q=Q,
                             gl0=gl0, gl1=gl1, M=M, tin=tin,
                             interpret=interpret)


@functools.partial(jax.jit,
                   static_argnames=("g", "w", "L", "Q", "gl0", "gl1",
                                    "M", "tin", "interpret"))
def _grain_bank_fused(rows_gf, t, okf, sv, ev, base_i, base_f, rate, gain,
                      edge, g: int, w: int, L: int, Q: int, gl0: float,
                      gl1: float, M: int = _MGF, tin: bool = True,
                      interpret: bool = False):
    """Whole-bank fused read for ALIGNED lane packing with per-lane
    envelope rows: rows_gf (N, Cwp) staged rows, FLAT and pre-padded to
    a sublane multiple host-side (row n = data_ext[:, n:n+w] in C-major
    order; the 3-D (N, C, w) staging forced a 1.7 ms/render T(2,128)
    layout copy of the whole resource — hlo_800_fused.txt copy.5); t
    (B,) i32 frame indices; per-quantum hi-variant fields (K, nq): okf
    f32 0/1, sv/ev i32 start/stop frames, base_i i32 + base_f f32
    playhead split, rate f32; gain (K, B) f32 envelope rows (clipped
    in-kernel to [gl0, gl1]); edge (C,) f32 staged edge constants.
    Returns the K-lane-summed (C, B) f32 bank output (masked +
    enveloped).

    XLA-side work is only group-granular: per-quantum fields repeat to
    (K, S) (S = B/g groups), the row start w0 comes from the CLIPPED
    playhead at the group's two endpoint samples (bit-identical f32 math
    to the in-kernel per-sample path, so loc = piv - w0 is consistent),
    and one gather stages the rows in their natural layout; `tin` moves
    the lane-major transpose onto the VMEM tiles."""
    K, nq = base_i.shape
    B = gain.shape[1]
    S = B // g
    rep = Q // g
    C = edge.shape[0]
    assert C <= 2 and S * g == B and rep * g == Q, (C, S, g, B, Q)

    def expand(x):                                         # (K, nq)->(K, S)
        return jnp.repeat(x, rep, axis=1)

    js = jnp.asarray(
        np.tile(np.arange(rep, dtype=np.float32) * g, nq))  # (S,) f32
    bi_g = expand(base_i)
    bf_g = expand(base_f)
    rt_g = expand(rate)
    ok_g = expand(okf)
    sv_g = expand(sv)
    ev_g = expand(ev)
    t0g = t.reshape(S, g)[:, 0].astype(jnp.int32)          # (S,) i32
    # group row start: clipped playhead at the group's endpoint samples
    # (same f32 ops as the kernel's per-sample delta -> bit-consistent)
    d_s = bf_g + rt_g * js[None, :]
    d_e = bf_g + rt_g * (js[None, :] + jnp.float32(g - 1))
    pi_s = jnp.clip(bi_g + jnp.floor(d_s).astype(jnp.int32),
                    jnp.int32(0), jnp.int32(L - 1))
    pi_e = jnp.clip(bi_g + jnp.floor(d_e).astype(jnp.int32),
                    jnp.int32(0), jnp.int32(L - 1))
    w0 = jnp.minimum(pi_s, pi_e)                           # (K, S) i32

    # pad the GROUP axis per lane (S -> Sp with K*Sp a grid multiple):
    # pads land on the small (K, S) field/index tensors, the gather
    # output arrives already grid-sized (no (Cw, RS)-scale pad+copy),
    # and the (C, g, K, Sp) output factorization survives padding so the
    # K-lane reduce runs BEFORE any slice (probe_hlo2: the flat-pad
    # variant materialized a 47.8 MB pad + 41.7 MB copy + 31.8 MB slice)
    import math

    # Sp is a multiple of M so every grid block lies within ONE lane k
    # (the 2-D reduction grid accumulates over k into the same output
    # block); the grid-step count K*Sp/M is unchanged from the flat
    # 1-D layout whenever gcd(K, M) == 1
    Sp = ((S + M - 1) // M) * M
    RSp = K * Sp
    nS = Sp // M
    Cw = C * w
    Cwp = rows_gf.shape[1]
    assert Cwp >= Cw and Cwp % 8 == 0, (Cwp, Cw)

    def pads(x, val=0):                                    # (K, S)->(K, Sp)
        return jnp.pad(x, ((0, 0), (0, Sp - S)),
                       constant_values=val)

    w0_p = pads(w0)
    rows = rows_gf[w0_p.reshape(RSp)]                      # (RSp, Cwp)
    rows_t = rows if tin else rows.T                       # else (Cwp, RSp)

    def fl(x):
        return pads(x).reshape(RSp)

    zer = jnp.zeros((RSp,), jnp.int32)
    ints_arr = jnp.stack([
        fl(jnp.broadcast_to(t0g[None, :], (K, S))),
        fl(sv_g.astype(jnp.int32)), fl(ev_g.astype(jnp.int32)),
        fl(bi_g), pads(w0).reshape(RSp), zer, zer, zer])   # (8, RSp)
    zer_f = jnp.zeros((RSp,), jnp.float32)
    e0 = jnp.broadcast_to(edge[0], (RSp,)).astype(jnp.float32)
    e1 = (jnp.broadcast_to(edge[1], (RSp,)).astype(jnp.float32)
          if C > 1 else zer_f)
    flts_arr = jnp.stack([
        fl(bf_g), fl(rt_g),
        fl(jnp.broadcast_to(js[None, :], (K, S))),
        fl(ok_g), e0, e1, zer_f, zer_f])                   # (8, RSp)
    gain_t = jnp.pad(gain.reshape(K, S, g),
                     ((0, 0), (0, Sp - S), (0, 0))).reshape(RSp, g)
    if not tin:
        gain_t = gain_t.T                                  # (g, RSp)

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    interpret = interpret or jax.devices()[0].platform not in ("tpu", "axon")
    def blk(s, k):                     # flat (k-major) group-block index
        # jnp.int32 constructed IN the map body (python ints lift to
        # i64 under x64; tracer capture is rejected by pallas)
        return k * jnp.int32(nS) + s

    rows_spec = (pl.BlockSpec((M, Cwp), lambda s, k: (blk(s, k),
                                                      jnp.int32(0)),
                              memory_space=pltpu.VMEM) if tin else
                 pl.BlockSpec((Cwp, M), lambda s, k: (jnp.int32(0),
                                                      blk(s, k)),
                              memory_space=pltpu.VMEM))
    gain_spec = (pl.BlockSpec((M, g), lambda s, k: (blk(s, k),
                                                    jnp.int32(0)),
                              memory_space=pltpu.VMEM) if tin else
                 pl.BlockSpec((g, M), lambda s, k: (jnp.int32(0),
                                                    blk(s, k)),
                              memory_space=pltpu.VMEM))
    out = pl.pallas_call(
        functools.partial(_kernel_grain_fused, g=g, w=w, C=C, L=L,
                          gl0=gl0, gl1=gl1, tin=tin),
        out_shape=jax.ShapeDtypeStruct((C * g, Sp), jnp.float32),
        grid=(nS, K),
        in_specs=[
            rows_spec,
            pl.BlockSpec((8, M), lambda s, k: (jnp.int32(0), blk(s, k)),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, M), lambda s, k: (jnp.int32(0), blk(s, k)),
                         memory_space=pltpu.VMEM),
            gain_spec,
        ],
        out_specs=pl.BlockSpec((C * g, M),
                               lambda s, k: (jnp.int32(0), s),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(rows_t, ints_arr, flts_arr, gain_t)
    # (C*g, Sp) already K-summed -> slice S -> (C, S, g) -> (C, B)
    res = out.reshape(C, g, Sp)[:, :, :S]                  # (C, g, S)
    return jnp.transpose(res, (0, 2, 1)).reshape(C, B)


@functools.lru_cache(maxsize=1)
def grain_fused_supported() -> bool:
    """One-time probe: does the current default backend compile the
    fully-fused bank kernel (grain_bank_fused)?  Same contract as
    grouped_v_supported — compile-only, ~1 s once cached."""
    try:
        if jax.devices()[0].platform not in ("tpu", "axon"):
            return False
        # the production WIDE geometry (pick_group wide=True): g=32,
        # w=39, rows flat-padded to Cwp=80
        C, g, w, K, nq, Q = 2, 32, 39, 2, 8, 128
        B = nq * Q
        rows_g = jnp.zeros((64, 80), jnp.float32)          # (N, Cwp) flat
        t = jnp.arange(B, dtype=jnp.int32)
        okf = jnp.ones((K, nq), jnp.float32)
        sv = jnp.zeros((K, nq), jnp.int32)
        ev = jnp.full((K, nq), B, jnp.int32)
        bi = jnp.zeros((K, nq), jnp.int32)
        bf = jnp.zeros((K, nq), jnp.float32)
        rt = jnp.ones((K, nq), jnp.float32)
        gain = jnp.ones((K, B), jnp.float32)
        edge = jnp.zeros((C,), jnp.float32)
        jax.block_until_ready(grain_bank_fused(
            rows_g, t, okf, sv, ev, bi, bf, rt, gain, edge,
            g=g, w=w, L=40, Q=Q, gl0=0.0, gl1=1.0))
        return True
    except Exception:
        return False


@functools.lru_cache(maxsize=1)
def grouped_v_supported() -> bool:
    """One-time probe: does the current default backend compile the VMEM
    grouped select (grouped_row_lerp_v)?  Same pattern as
    ops/curve_kernel.pallas3_supported — the in-situ adjudication
    (benches/runs_r05/probe_gv.jsonl, 2026-08-18) showed grouped_v
    beating grouped_t at BOTH grain densities and BOTH depths (400:
    909/1,879 vs 718/1,592; 800: 791/1,134 vs 711/1,032 at 5/25-deep)
    and bit-exact on chip (max_abs 0.0), but earlier remote Mosaic
    builds HTTP-500 whole kernel families, so `auto` probes once per
    process instead of assuming.  Compile-only (block_until_ready, no
    host readback); ~1 s once the persistent compile cache has it."""
    try:
        if jax.devices()[0].platform not in ("tpu", "axon"):
            return False
        C, g, w = 2, 16, 21
        rows_g = jnp.zeros((8, C, w), jnp.float32)
        pi = jnp.zeros((1, 1024), jnp.int32)
        fr = jnp.zeros((1, 1024), jnp.float32)
        jax.block_until_ready(grouped_row_lerp_v(rows_g, pi, fr, g, w))
        return True
    except Exception:
        return False


def grouped_row_lerp(rows_g, pi, fr, g: int, w: int, wrap_len: int = 0):
    """rows_g (N, C, w); pi/fr (R, B) int32/f32 (monotone per g-sample
    group) -> (C, R, B).  Same contract as windowed_lerp (`wrap_len` for
    whole-buffer loops with pi unwrapped)."""
    R, B = pi.shape
    C = rows_g.shape[1]
    S = B // g
    piq = pi.reshape(R * S, g)
    frq = fr.reshape(R * S, g)
    w0 = jnp.minimum(piq[:, 0], piq[:, -1])                  # (R*S,)
    loc = jnp.clip(piq - w0[:, None], 0, w - 2)              # (R*S, g)
    if wrap_len:
        w0 = w0 % jnp.int32(wrap_len)
    rows = rows_g[w0]                                        # (R*S, C, w)
    # two-hot select+lerp as one multiply-reduce over the w row lanes
    # (w ~= 21, so the (R*S, C, g, w) product is small; a where-CHAIN over
    # lanes compiled to ~2(w-1) unfused passes and measured slower)
    lanes = jnp.arange(w, dtype=jnp.int32)[None, None, :]    # (1, 1, w)
    tw = (jnp.where(lanes == loc[:, :, None],
                    (1.0 - frq)[:, :, None], 0.0)
          + jnp.where(lanes == loc[:, :, None] + 1,
                      frq[:, :, None], 0.0))                 # (R*S, g, w)
    out = jnp.sum(tw[:, None, :, :] * rows[:, :, None, :],
                  axis=-1)                                   # (R*S, C, g)
    return jnp.transpose(out, (1, 0, 2)).reshape(C, R, B)
