"""WaveShaperNode: nonlinear curve shaping with optional oversampling.

reference: src/node/waveshaper.rs.  Curve application
(apply_curve, waveshaper.rs:556-573) is a vectorized gather + lerp with
edge clamping; 2x/4x oversampling runs the curve at a higher rate between
streaming polyphase up/down-samplers (ops/resample.py — a linear-phase FIR
design standing in for the reference's rubato FFT resampler).
"""

from __future__ import annotations

from enum import Enum

import numpy as np
import jax.numpy as jnp

from ..constants import InvalidStateError
from ..graph.compiler import Kernel
from ..ops import resample
from .audio_node import AudioNode, AudioNodeOptions


class OverSampleType(str, Enum):
    NONE = "none"
    X2 = "2x"
    X4 = "4x"


_SEG = 64     # table-segment width for the two-level matmul lookup
_MAX_MATMUL_SEGS = 64   # beyond 64 segments (4096 entries) gather wins


def _apply_curve_gather(curve: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    """Plain gather+lerp curve lookup (reference: waveshaper.rs:556-573).

    Used for curves too long for the matmul formulation in `apply_curve`;
    produces bit-identical results (same index/fraction math)."""
    n = curve.shape[0]
    shape = x.shape
    v = (n - 1) / 2.0 * (x.reshape(-1) + 1.0)
    v = jnp.clip(v, 0.0, float(n - 1))
    ki = jnp.minimum(jnp.floor(v).astype(jnp.int32), n - 2)
    f = (v - ki.astype(jnp.float32)).astype(jnp.float32)
    c0 = jnp.take(curve, ki, axis=0)
    c1 = jnp.take(curve, ki + 1, axis=0)
    y = (1.0 - f) * c0 + f * c1
    return y.reshape(shape)


def apply_curve(curve: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    """Curve lookup + lerp with edge clamping (reference:
    waveshaper.rs:556-573), evaluated WITHOUT a gather.

    TPU gathers run ~16 ns/element; instead the lerp is a two-level
    matmul: fold the (1-f, f) weights into a two-hot row vector over a
    SEG-wide table segment, contract against all segments at once on the
    MXU, and pick the right segment with an iota-compare select.  Each
    segment row carries the next segment's first entry so the k+1 tap
    never crosses rows.  Bit-identical to the gather+lerp formulation
    (verified exhaustively), ~9x faster at 2 M lookups on v5e.
    """
    import jax

    n = curve.shape[0]
    nseg = -(-(n) // _SEG)
    if nseg > _MAX_MATMUL_SEGS:
        # Long curves (spec allows e.g. 64k entries): the two-hot matmul
        # does O(nseg) MACs per sample and materializes a (M, nseg)
        # intermediate — at 64k entries and a 4x-oversampled large block
        # that is gigabytes.  Fall back to the plain gather+lerp
        # formulation (identical math, O(1) per sample).
        return _apply_curve_gather(curve, x)
    npad = nseg * _SEG
    # padded segment table (nseg, SEG+1); pad entries replicate curve[-1]
    # (ki is clamped to n-2 below, so they are never weighted anyway)
    cpad = jnp.concatenate(
        [curve, jnp.broadcast_to(curve[-1], (npad + 1 - n,))])
    T = jnp.zeros((nseg, _SEG + 1), curve.dtype)
    T = T.at[:, :_SEG].set(cpad[:npad].reshape(nseg, _SEG))
    T = T.at[:, _SEG].set(cpad[_SEG::_SEG][:nseg])

    shape = x.shape
    import os as _os

    mode = _os.environ.get("WEBAUDIO_CURVE", "auto")
    if mode == "auto":
        # auto: fused pallas3 kernel on TPU backends whose Mosaic
        # accepts it (probed once per process — see
        # ops/curve_kernel.pallas3_supported; session-5 A/B: mastering
        # 920x -> 1359x steady state), XLA two-hot otherwise.  Small
        # blocks stay XLA: the kernel needs >= GV3*QV3 samples to tile.
        if x.size >= (1 << 15) and \
                jax.devices()[0].platform in ("tpu", "axon"):
            from ..ops.curve_kernel import pallas3_supported

            mode = "pallas3" if pallas3_supported() else "xla"
        else:
            mode = "xla"
    if x.size >= (1 << 15) and \
            jax.devices()[0].platform in ("tpu", "axon") and \
            mode in ("pallas", "pallas2", "pallas3"):
        # large blocks on TPU: the fused Pallas lookup (same math, the
        # one-hot and segment matrices never leave VMEM; ops/curve_kernel).
        # OPT-IN: the axon remote Mosaic compile helper crashes on the v1
        # kernel in every variant tried (bisects in benches/read_modes.py
        # and benches/final_g.py); "pallas2" is the grain_read-shaped
        # retry (samples on lanes — the layout that kernel family proves
        # compiles).  benches/run_tpu_r4.py smoke-gates both per session.
        if mode == "pallas3":
            from ..ops.curve_kernel import curve_lookup_tpu_v3

            # kernel-shaped table: SEG=127 makes each row (SEG+1 = 128)
            # exactly one lane tile — the padded-to-128 contraction adds
            # zero extra MACs and nseg drops ~2x vs SEG=64 (the dot is
            # the kernel's dominant cost: M*(SEG_pad)*nseg MACs)
            segk = 127
            nsegk = -(-n // segk)
            npadk = nsegk * segk
            cpk = jnp.concatenate(
                [curve, jnp.broadcast_to(curve[-1], (npadk + 1 - n,))])
            Tk = jnp.zeros((nsegk, segk + 1), curve.dtype)
            Tk = Tk.at[:, :segk].set(cpk[:npadk].reshape(nsegk, segk))
            Tk = Tk.at[:, segk].set(cpk[segk::segk][:nsegk])
            y = curve_lookup_tpu_v3(x.reshape(-1), Tk, n, segk)
        elif mode == "pallas2":
            from ..ops.curve_kernel import curve_lookup_tpu_v2

            y = curve_lookup_tpu_v2(x.reshape(-1), T, n, _SEG)
        else:
            from ..ops.curve_kernel import curve_lookup_tpu

            y = curve_lookup_tpu(x.reshape(-1), T.T, n, _SEG)
        return y.reshape(shape)
    if mode == "gather":
        # A/B escape: plain gather+lerp (identical math)
        return _apply_curve_gather(curve, x)
    if mode == "rowgather":
        # session-5 candidate: gather whole (SEG+1)-wide segment ROWS by
        # the coarse index, then a fused triangular-hat multiply-reduce
        # over the row.  The row gather is contiguous (65 f32 per fetch)
        # and XLA-TPU can fuse gathers into loop fusions — if the
        # (M, 65) tile fuses into the reduce, HBM traffic drops to
        # x-in + y-out (8 B/sample) vs ~776 B/sample for the two-hot
        # matmuls.  Identical index/fraction math to the gather+lerp.
        v = (n - 1) / 2.0 * (x.reshape(-1) + 1.0)
        v = jnp.clip(v, 0.0, float(n - 1))
        ki = jnp.minimum(jnp.floor(v).astype(jnp.int32), n - 2)
        f = (v - ki.astype(jnp.float32)).astype(jnp.float32)
        hi = ki // _SEG
        pos = (ki - hi * _SEG).astype(jnp.float32) + f       # in [0, SEG]
        tile = jnp.take(T, hi, axis=0)                       # (M, SEG+1)
        lanes = jnp.arange(_SEG + 1, dtype=jnp.float32)[None, :]
        hat = jnp.maximum(0.0, 1.0 - jnp.abs(lanes - pos[:, None]))
        y = jnp.sum(tile * hat, axis=1)
        return y.reshape(shape)

    v = (n - 1) / 2.0 * (x.reshape(-1) + 1.0)
    v = jnp.clip(v, 0.0, float(n - 1))
    ki = jnp.minimum(jnp.floor(v).astype(jnp.int32), n - 2)
    f = (v - ki.astype(jnp.float32)).astype(jnp.float32)
    hi = ki // _SEG
    lo = ki - hi * _SEG
    if mode == "major":
        # round-3 layout kept for in-situ A/B: samples on the MAJOR axis;
        # the (M, 65)/(M, nseg) intermediates pad their minor dims to 128
        # lanes (~1 KB HBM per sample)
        lanes = jnp.arange(_SEG + 1, dtype=jnp.int32)[None, :]
        w = (jnp.where(lanes == lo[:, None], (1.0 - f)[:, None], 0.0)
             + jnp.where(lanes == lo[:, None] + 1, f[:, None], 0.0))
        P = jnp.dot(w, T.T, preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST)   # (M, nseg)
        y = jnp.sum(jnp.where(jnp.arange(nseg)[None, :] == hi[:, None],
                              P, 0.0), axis=1)
        return y.reshape(shape)
    # TRANSPOSED layout (default): samples ride the MINOR axis.  With
    # samples on the major axis both intermediates pad their (SEG+1 = 65 /
    # nseg = 64) minor dims to 128 lanes — ~1 KB of physical HBM per
    # sample, measured as roughly half the mastering-chain case.
    # (nseg, M)/(65, M) tiles pad nothing along M, halving the traffic.
    # Bit-identical either way: each output sums exactly two nonzero
    # products, so accumulation order is irrelevant.
    lanesT = jnp.arange(_SEG + 1, dtype=jnp.int32)[:, None]
    wT = (jnp.where(lanesT == lo[None, :], (1.0 - f)[None, :], 0.0)
          + jnp.where(lanesT == lo[None, :] + 1, f[None, :], 0.0))
    PT = jnp.dot(T, wT, preferred_element_type=jnp.float32,
                 precision=jax.lax.Precision.HIGHEST)      # (nseg, M)
    y = jnp.sum(jnp.where(jnp.arange(nseg)[:, None] == hi[None, :], PT, 0.0),
                axis=0)
    return y.reshape(shape)


class _WaveShaperKernel(Kernel):
    def __init__(self, curve, oversample: OverSampleType, channels: int):
        self.curve = None if curve is None else np.asarray(curve, np.float32)
        self.oversample = oversample if curve is not None else OverSampleType.NONE
        self.channels = channels
        self.factor = {"none": 1, "2x": 2, "4x": 4}[self.oversample.value]

    def resources(self):
        return None if self.curve is None else {"curve": self.curve}

    def tail_frames(self):
        if self.factor == 1:
            return 0
        from ..ops.resample import _interp_fir

        return 2 * len(_interp_fir(self.factor))

    def init_state(self):
        if self.factor == 1:
            return None
        return {
            "up": resample.up_fir_state(self.channels, self.factor),
            "down": resample.down_fir_state(self.channels, self.factor),
        }

    def process(self, scope, state, inputs, params):
        x = inputs[0]
        if self.curve is None:
            return state, [x]  # passthrough (reference: waveshaper.rs:420-427)
        curve = scope.node_resources["curve"]
        if self.factor == 1:
            return state, [apply_curve(curve, x).astype(jnp.float32)]
        up, up_st = resample.upsample(x, self.factor, state["up"])
        shaped = apply_curve(curve, up)
        down, down_st = resample.downsample(shaped, self.factor, state["down"])
        return {"up": up_st, "down": down_st}, [down.astype(jnp.float32)]


class WaveShaperNode(AudioNode):
    _number_of_inputs = 1
    _number_of_outputs = 1

    def __init__(self, context, curve=None, oversample: str = "none", **options):
        super().__init__(context,
                         options=AudioNodeOptions(**options) if options else None)
        self._curve = None
        self._oversample = OverSampleType(oversample)
        if curve is not None:
            self.set_curve(curve)

    @property
    def curve(self):
        return self._curve

    @curve.setter
    def curve(self, c):
        self.set_curve(c)

    def set_curve(self, curve):
        """reference: waveshaper.rs:180-210 (curve can only be set once...
        actually it can be replaced but not unset; setting twice raises
        InvalidStateError per spec)."""
        if self._curve is not None:
            raise InvalidStateError("curve has already been set")
        curve = np.asarray(curve, dtype=np.float32)
        if curve.ndim != 1 or len(curve) < 2:
            raise InvalidStateError("curve must be a 1-d sequence of length >= 2")
        self._curve = curve
        self.context._invalidate_graph_cache()

    @property
    def oversample(self) -> OverSampleType:
        return self._oversample

    @oversample.setter
    def oversample(self, v):
        self.set_oversample(v)

    def set_oversample(self, v):
        self._oversample = OverSampleType(v)
        self.context._invalidate_graph_cache()

    def make_kernel(self, render_ctx):
        c = max(1, render_ctx.input_channel_counts[0])
        return _WaveShaperKernel(self._curve, self._oversample, c)
