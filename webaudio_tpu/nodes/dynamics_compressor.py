"""DynamicsCompressorNode: spec compression curve with lookahead.

reference: src/node/dynamics_compressor.rs (Giannoulis et al. design:
gain computer in dB with soft knee, branching attack/release peak detector,
makeup gain = (1/curve(1))^0.6, max-across-channels sidechain, fixed
one-quantum lookahead delay).

TPU mapping: everything except the level detector is elementwise tensor
math.  The detector `y[n] = a y[n-1] + (1-a) x[n]` with `a` chosen by
`x[n] > y[n-1]` is genuinely sequential (data-dependent coefficient), so it
runs as a per-sample `lax.scan` carrying one scalar — the designated
Pallas-kernel candidate for a later perf round.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..constants import RENDER_QUANTUM_SIZE, NotSupportedError
from ..graph.compiler import Kernel
from ..ops.mixing import ChannelCountMode
from ..param import AudioParamDescriptor, AutomationRate
from .audio_node import AudioNode, ChannelConfig


def _detector_sequential(y0, x, at, rt):
    """Literal per-sample recurrence (the reference's loop, :427-445).
    ~720 ns/sample on TPU v5e (scalar-unit bound); kept as the oracle and
    CPU/env fallback."""
    def step(prev, inp):
        xl, a_tau, r_tau = inp
        tau = jnp.where(xl > prev, a_tau, r_tau)
        y = tau * prev + (1.0 - tau) * xl
        return y, y

    _, ys = jax.lax.scan(step, y0, (x, at, rt), unroll=8)
    return ys


def _comb_affine(c1, c2):
    a1, b1 = c1
    a2, b2 = c2
    return a1 * a2, a2 * b1 + b2


def _detector_fixed_point(y0, x, at, rt, max_iters=24, dtype=jnp.float32,
                          exact_fallback=True):
    """Branch-pattern fixed-point detector — the TPU formulation.

    y[n] = tau_n * y[n-1] + (1 - tau_n) * x[n], with tau_n chosen by
    x[n] > y[n-1], is a composition of piecewise-linear maps that are
    CONTINUOUS at their breakpoints (both branches agree at y == x), so
    iterating [guess branch pattern -> solve the linear time-varying
    recurrence with one associative scan -> recompute pattern] converges
    to the exact forward solution; near-breakpoint mispredictions perturb
    the result by O(eps) only.  Each iteration is O(B log B) parallel work
    instead of B sequential scalar steps: ~40x faster at 480k samples on
    v5e, fuzz-validated against the sequential oracle.

    The scan runs in f32 by default (2e-5 relative vs the f32 sequential
    oracle at B=16k — the composition error grows ~eps*log2(B); TPU f64 is
    software-emulated and ~1.6x slower end to end).  Set
    WEBAUDIO_DETECTOR=fp64 for the f64 scan.
    """
    x64 = x.astype(dtype)
    at64 = at.astype(dtype)
    rt64 = rt.astype(dtype)
    y064 = y0.astype(dtype)

    def solve(tau):
        # associative composition of y -> tau*y + (1-tau)*x
        As, Bs = jax.lax.associative_scan(
            _comb_affine, (tau, (1.0 - tau) * x64))
        return As * y064 + Bs

    def pattern_of(y):
        yprev = jnp.concatenate([y064[None], y[:-1]])
        return x64 > yprev

    def taus(pat):
        return jnp.where(pat, at64, rt64)

    pat0 = x64 > y064            # first guess: propagate y0's branch
    y = solve(taus(pat0))

    def cond(carry):
        _, _, changed, i = carry
        return changed & (i < max_iters)

    def body(carry):
        y, pat, _, i = carry
        newpat = pattern_of(y)
        changed = jnp.any(newpat != pat)
        return solve(taus(newpat)), newpat, changed, i + 1

    y, _, changed, _ = jax.lax.while_loop(
        cond, body, (y, pat0, jnp.bool_(True), 0))
    # `changed` still true at exit = the branch pattern never stabilized
    # within max_iters — possible when attack_tau == 0 (an attack step
    # RESETS y = x, so one mispredicted branch re-seeds everything after
    # it and the pattern front can crawl forward one flip per iteration;
    # caught by the r5 spatial/dynamics graph fuzz at 2.7 dB error).
    # Fall back to the exact sequential recurrence for this block: the
    # cond branch costs nothing when converged, which is every
    # spec-typical input.
    if exact_fallback:
        y = jax.lax.cond(
            changed,
            lambda: _detector_sequential(y064, x64, at64, rt64),
            lambda: y)
    return y.astype(jnp.float32)


_CH = 128  # chunk width of the MXU-scan detector (one MXU tile)


def _detector_fixed_point_chunked(y0, x, a: float, r: float,
                                  max_iters=24, exact_fallback=True):
    """Constant-tau fixed-point detector with an O(1)-pass chunked solve.

    The generic path's `associative_scan` costs ~2*log2(B) full-array
    sweeps per fixed-point iteration (~56 HBM passes with the pattern
    update — the mastering bench's dominant term at ~31 ns/sample).  With
    CONSTANT attack/release taus the linear-recurrence solve given a
    branch pattern collapses to closed form per 128-sample chunk:

        A[j]  = a^S[j] * r^(j+1-S[j])      S = # attack steps (prefix)
        y[j]  = A[j] * (y_chunk0 + sum_{k<=j} (1-tau_k) x_k / A[k])

    Both prefix sums (S and the inner sum) are ONE (nc,128)x(128,128)
    lower-triangular matmul each — MXU work instead of log-depth sweeps —
    and the 1/A[k] terms stay in range because the caller guarantees
    a^128, r^128 >= 1e-20 (fast attacks fall back to the generic path).
    Chunk boundaries compose through a tiny (nc,) affine scan.  ~8 HBM
    passes per iteration; same fixed-point iteration/convergence as
    _detector_fixed_point, exp/log f32 error ~1e-6 relative (tolerance
    1e-4 vs the sequential oracle, test_effects.py)."""
    B = x.shape[0]
    nc = -(-B // _CH)
    pad = nc * _CH - B
    xf = jnp.pad(x, (0, pad))
    la = jnp.float32(np.log(np.float64(a)))
    lr = jnp.float32(np.log(np.float64(r)))
    af = jnp.float32(a)
    rf = jnp.float32(r)
    tril = jnp.asarray(np.tril(np.ones((_CH, _CH), np.float32)))
    jrow = jnp.arange(1, _CH + 1, dtype=jnp.float32)[None, :]
    hp = jax.lax.Precision.HIGHEST

    xc = xf.reshape(nc, _CH)

    def solve(pat):
        patf = pat.reshape(nc, _CH).astype(jnp.float32)
        # inclusive prefix count of attack steps: one triangular matmul
        S = jnp.dot(patf, tril.T, preferred_element_type=jnp.float32,
                    precision=hp)                      # (nc, CH)
        logA = S * la + (jrow - S) * lr
        A = jnp.exp(logA)
        tau = jnp.where(pat.reshape(nc, _CH), af, rf)
        T = (1.0 - tau) * xc * jnp.exp(-logA)
        V = jnp.dot(T, tril.T, preferred_element_type=jnp.float32,
                    precision=hp)                      # inclusive prefix
        # per-chunk end affine (y_chunk0 -> y_end), composed across chunks
        Ae = A[:, -1]
        Be = Ae * V[:, -1]

        def comb(c1, c2):
            a1, b1 = c1
            a2, b2 = c2
            return a1 * a2, a2 * b1 + b2

        Acum, Bcum = jax.lax.associative_scan(comb, (Ae, Be))
        ystart = jnp.concatenate(
            [y0[None], Acum[:-1] * y0 + Bcum[:-1]])    # (nc,)
        y = A * (ystart[:, None] + V)
        return y.reshape(-1)[:B]

    def pattern_of(y):
        yprev = jnp.concatenate([y0[None].astype(jnp.float32), y[:-1]])
        return x > yprev

    pat0 = x > y0
    y = solve(jnp.pad(pat0, (0, pad)))

    def cond(carry):
        _, _, changed, i = carry
        return changed & (i < max_iters)

    def body(carry):
        y, pat, _, i = carry
        newpat = pattern_of(y)
        changed = jnp.any(newpat != pat)
        return solve(jnp.pad(newpat, (0, pad))), newpat, changed, i + 1

    y, _, changed, _ = jax.lax.while_loop(
        cond, body, (y, pat0, jnp.bool_(True), 0))
    # non-convergence fallback, same as _detector_fixed_point (the
    # chunked guard excludes a==0, but r==0 or adversarial inputs can
    # still cascade the pattern front past max_iters)
    if exact_fallback:
        y = jax.lax.cond(
            changed,
            lambda: _detector_sequential(
                y0.astype(jnp.float32), x,
                jnp.full(B, af, jnp.float32), jnp.full(B, rf, jnp.float32)),
            lambda: y)
    return y


def chunked_taus_ok(a: float, r: float) -> bool:
    """Static range guard for the chunked detector: per-chunk products
    a^128, r^128 must stay >= ~1e-20 so the 1/A terms cannot overflow."""
    a = float(a)
    r = float(r)
    return (a > 0.0 and r > 0.0
            and a ** _CH >= 1e-20 and r ** _CH >= 1e-20)


def _detector(y0, x, at, rt, const_taus=None):
    """const_taus: (a, r) floats when the kernel knows the taus are
    compile-time constants (k-rate, no automation) — enables the chunked
    MXU solve; None keeps the generic dense-tau paths.

    WEBAUDIO_DETECTOR_MAX_ITERS caps the fixed-point iterations
    (measurement-only study mode: POSSIBLY WRONG output below the
    convergence count — used by benches/profile_r5.py to price one
    iteration's on-chip latency)."""
    import os

    cap = os.environ.get("WEBAUDIO_DETECTOR_MAX_ITERS")
    # the cap also disables the exact sequential fallback (a capped
    # non-converged run would otherwise just measure the fallback)
    kw = {"max_iters": int(cap), "exact_fallback": False} if cap else {}
    mode = os.environ.get("WEBAUDIO_DETECTOR", "auto")
    if mode == "seq":
        return _detector_sequential(y0, x, at, rt)
    if mode == "fp64":
        return _detector_fixed_point(y0, x, at, rt, dtype=jnp.float64, **kw)
    if const_taus is not None and mode in ("auto", "chunked") and \
            chunked_taus_ok(*const_taus) and x.shape[0] >= _CH:
        return _detector_fixed_point_chunked(y0, x, *const_taus, **kw)
    return _detector_fixed_point(y0, x, at, rt, **kw)


def _db_to_lin(v):
    return jnp.power(10.0, v / 20.0)


def _lin_to_db(v):
    return jnp.where(v == 0.0, -1000.0, 20.0 * jnp.log10(jnp.maximum(v, 1e-45)))


class _CompressorKernel(Kernel):
    def __init__(self, channels: int, sample_rate: float, param_plans=None):
        self.channels = channels
        self.sample_rate = sample_rate
        # compile-time-constant attack/release taus unlock the chunked
        # MXU detector (see _detector_fixed_point_chunked); the f32 tau
        # math mirrors the traced computation in process() exactly
        self.const_taus = None
        plans = param_plans or {}
        ap = plans.get("attack")
        rp = plans.get("release")
        if ap is not None and rp is not None and \
                ap.is_constant and rp.is_constant:
            fs = np.float32(sample_rate)

            def tau(v):
                v = np.float32(np.clip(v, 0.0, 1.0))
                if v == 0.0:
                    return 0.0
                return float(np.exp(np.float32(-1.0)
                                    / (np.maximum(v, np.float32(1e-30))
                                       * fs)))

            self.const_taus = (tau(ap.scalar), tau(rp.scalar))
        # ~6 ms lookahead realised as whole render quanta, exactly like the
        # reference's ring of ceil(fs*0.006/128)+1 quanta read one slot
        # behind the write head (dynamics_compressor.rs:251-254, 452-459):
        # the effective delay is ceil(fs*0.006/128) quanta.
        q = RENDER_QUANTUM_SIZE
        self.delay_frames = int(np.ceil(sample_rate * 0.006 / q)) * q

    def init_state(self):
        return {
            "detector": jnp.zeros((), jnp.float32),
            "delay": jnp.zeros((self.channels, self.delay_frames),
                               jnp.float32),
            "reduction": jnp.zeros((), jnp.float32),
        }

    def process(self, scope, state, inputs, params):
        x = inputs[0]                    # (C, B)
        B = x.shape[1]
        fs = self.sample_rate
        q = RENDER_QUANTUM_SIZE

        # k-rate params, (B,) or scalar; formulas reference: :364-390
        threshold = params["threshold"]
        knee = params["knee"]
        ratio = params["ratio"]
        attack = params["attack"]
        release = params["release"]
        half_knee = knee / 2.0
        knee_partial = (1.0 / ratio - 1.0) / (2.0 * jnp.maximum(knee, 1e-30))
        attack_tau = jnp.exp(-1.0 / (jnp.maximum(attack, 1e-30) * fs))
        attack_tau = jnp.where(attack == 0.0, 0.0, attack_tau)
        release_tau = jnp.exp(-1.0 / (jnp.maximum(release, 1e-30) * fs))
        release_tau = jnp.where(release == 0.0, 0.0, release_tau)
        full_range_gain = threshold + (-threshold / ratio)
        full_range_makeup = 1.0 / _db_to_lin(full_range_gain)
        makeup_gain = 20.0 * jnp.log10(full_range_makeup ** 0.6)

        # sidechain: max |x| across channels (reference: :397-407)
        sample_db = _lin_to_db(jnp.max(jnp.abs(x), axis=0))

        # gain computer with soft knee (reference: :413-425)
        over = sample_db - threshold
        knee_branch = sample_db + (over + half_knee) ** 2 * knee_partial
        attenuated = jnp.where(
            sample_db <= threshold - half_knee, sample_db,
            jnp.where(sample_db <= threshold + half_knee,
                      knee_branch, threshold + over / ratio))
        attenuation = sample_db - attenuated     # xL, (B,)

        # branching level detector (reference: :427-445)
        at = jnp.broadcast_to(attack_tau, (B,))
        rt = jnp.broadcast_to(release_tau, (B,))
        detector = _detector(state["detector"], attenuation, at, rt,
                             const_taus=self.const_taus)
        detector_last = detector[-1]

        reduction_db = -detector + makeup_gain
        reduction_lin = _db_to_lin(reduction_db)

        # apply to the signal delayed by one quantum (reference: :452-470)
        ext = jnp.concatenate([state["delay"], x], axis=1)
        delayed = ext[:, :B]
        out = delayed * reduction_lin[None, :]

        new_state = {
            "detector": detector_last,
            "delay": ext[:, B:],
            "reduction": reduction_db[-1],
        }
        return new_state, [out.astype(jnp.float32)]


class DynamicsCompressorNode(AudioNode):
    _number_of_inputs = 1
    _number_of_outputs = 1

    def __init__(self, context, attack: float = 0.003, knee: float = 30.0,
                 ratio: float = 12.0, release: float = 0.25,
                 threshold: float = -24.0, **options):
        cfg = ChannelConfig(count=2, mode=ChannelCountMode.CLAMPED_MAX)
        super().__init__(context, channel_config=cfg)
        mk = lambda name, dv, lo, hi: self._register_param(
            name, AudioParamDescriptor(
                name=name, automation_rate=AutomationRate.K,
                default_value=dv, min_value=lo, max_value=hi))
        self.attack = mk("attack", 0.003, 0.0, 1.0)
        self.knee = mk("knee", 30.0, 0.0, 40.0)
        self.ratio = mk("ratio", 12.0, 1.0, 20.0)
        self.release = mk("release", 0.25, 0.0, 1.0)
        self.threshold = mk("threshold", -24.0, -100.0, 0.0)
        for p in self._params.values():
            p.set_automation_rate_constrained(True)
        for p, v in (("attack", attack), ("knee", knee), ("ratio", ratio),
                     ("release", release), ("threshold", threshold)):
            if getattr(self, p).default_value != v:
                getattr(self, p).set_value(v)
        self._reduction = 0.0

    @property
    def reduction(self) -> float:
        """Current gain reduction in dB (reference: :450, AtomicF32)."""
        return self._reduction

    def _validate_channel_count(self, count: int):
        if count > 2:
            raise NotSupportedError(
                "DynamicsCompressorNode channel count cannot be greater than 2")

    def _validate_channel_count_mode(self, mode: ChannelCountMode):
        if mode == ChannelCountMode.MAX:
            raise NotSupportedError(
                "DynamicsCompressorNode channel count mode cannot be 'max'")

    def output_channel_count(self, input_counts):
        return [max(1, input_counts[0])]

    def make_kernel(self, render_ctx):
        return _CompressorKernel(max(1, render_ctx.input_channel_counts[0]),
                                 render_ctx.sample_rate,
                                 param_plans=render_ctx.param_plans)

    def _on_render_state(self, state):
        self._reduction = float(np.asarray(state["reduction"]))
