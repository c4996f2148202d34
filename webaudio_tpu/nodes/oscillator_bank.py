"""OscillatorBankNode: V oscillator voices + ADSR envelopes in one kernel.

TPU-native extension (no reference counterpart as a node; SURVEY.md §2.2
names this the intended mapping: "500 oscillators = one vmapped voice
tensor").  A 500-node oscillator+gain graph compiles to ~20k HLO ops and
runs per-voice scalar work; this node computes all voices as a single
(V, B) tensor program — phases in closed form, ADSR envelopes as analytic
functions of time (no dense param tensors at all) — and mixes down to
mono or equal-power stereo.

Semantics per voice match OscillatorNode (phase, waveforms, sub-sample
start) and GainNode+AudioParam ADSR automation (linear attack, exponential
decay-to-sustain via the setTargetAtTime formula, exponential release).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..graph.compiler import Kernel
from ..ops import oscillator as osc_ops
from .audio_node import AudioNode


def _as_voice_array(v, n, dtype=np.float32):
    arr = np.asarray(v, dtype=dtype)
    if arr.ndim == 0:
        arr = np.full(n, arr, dtype)
    if arr.shape != (n,):
        raise ValueError(f"expected scalar or ({n},) array, got {arr.shape}")
    return arr


class _BankKernel(Kernel):
    def __init__(self, node: "OscillatorBankNode", rc):
        self.n = node
        self.fs = rc.sample_rate
        self.stereo = node.stereo

    def resources(self):
        n = self.n
        res = {
            "freq": n.frequencies,
            "start": n.starts,
            "stop": n.stops,
            "vol": n.volumes,
            "attack": n.attacks,
            "decay": n.decays,
            "sustain": n.sustains,
            "release": n.releases,
        }
        if self.stereo:
            res["pan"] = n.pans
        return res

    def tail_frames(self):
        return 0  # fully time-indexed

    def init_state(self):
        return None  # phases are closed-form (constant frequencies)

    def process(self, scope, state, inputs, params):
        r = scope.node_resources
        fs = self.fs
        B = scope.frames
        t = scope.t_idx.astype(jnp.float32) / np.float32(fs)      # (B,)
        # f64 global time only for the phase product (avoids drift)
        t64 = scope.t_idx.astype(jnp.float64) / fs

        freq = r["freq"][:, None]                                  # (V, 1)
        start = r["start"][:, None]
        stop = r["stop"][:, None]

        # phase: closed form mod-1 (constant voice frequencies), f64 only
        # at QUANTUM granularity + f32 within the quantum (|incr*127| is
        # small, so the rebase error is <= ~4e-7 of a cycle; a full (V, B)
        # f64 mod costs ~2x wall on TPU's software f64)
        from ..constants import RENDER_QUANTUM_SIZE as _Q

        nq = B // _Q
        t64q = t64[:: _Q]                                          # (nq,)
        ph0 = jnp.mod(
            freq.astype(jnp.float64)
            * (t64q[None, :] - start.astype(jnp.float64)), 1.0
        ).astype(jnp.float32)                                      # (V, nq)
        incr = (freq / fs).astype(jnp.float32)                     # (V, 1)
        j = jnp.arange(_Q, dtype=jnp.float32)

        wave_type = self.n.type
        if wave_type == "sine":
            # sin(2pi(ph0 + incr*j)) via the angle-sum identity: per-voice
            # transcendentals drop from (V, B) to (V, nq) + (V, Q) — the
            # within-quantum factor doesn't depend on the quantum, and the
            # VPU's sin/cos are the bank's hot op (6.4 ms of a 15 ms case)
            two_pi = np.float32(2 * np.pi)
            sa = jnp.sin(two_pi * ph0)[:, :, None]                 # (V,nq,1)
            ca = jnp.cos(two_pi * ph0)[:, :, None]
            bb = two_pi * incr * j[None, :]                        # (V, Q)
            sb = jnp.sin(bb)[:, None, :]                           # (V,1,Q)
            cb = jnp.cos(bb)[:, None, :]
            wave = (sa * cb + ca * sb).reshape(-1, B)
        else:
            ph = ph0[:, :, None] + incr[:, :, None] * j[None, None, :]
            phase = (ph - jnp.floor(ph)).reshape(-1, B)            # (V, B)
            if wave_type == "sawtooth":
                wave = osc_ops.sawtooth(phase, incr)
            elif wave_type == "square":
                wave = osc_ops.square(phase, incr)
            else:
                wave = osc_ops.triangle(phase)

        # analytic ADSR (per voice): linear attack, setTargetAtTime-style
        # exponential decay to sustain, exponential release after stop.
        # The exps factor the same way as the sine: exp(-(t0+jof)/tau) =
        # exp(-t0/tau)*exp(-jof/tau), with arguments clamped to +-80 so the
        # unselected branch can't produce inf*0 (exact for tau >= ~4e-5 s)
        a = r["attack"][:, None, None]
        d = jnp.maximum(r["decay"][:, None, None], 1e-6)
        s = r["sustain"][:, None, None]
        rel = jnp.maximum(r["release"][:, None, None], 1e-6)
        tq = t[:: _Q][None, :, None]                               # (1,nq,1)
        jof = (j / np.float32(fs))[None, None, :]                  # (1,1,Q)
        startv = start[:, :, None]                                 # (V,1,1)
        stopv = stop[:, :, None]
        dt_on = (tq - startv) + jof                                # (V,nq,Q)
        env_attack = jnp.clip(dt_on / jnp.maximum(a, 1e-9), 0.0, 1.0)
        post = dt_on - a

        def _fexp(base0, tau):
            e1 = jnp.exp(jnp.clip(-base0 / tau, -80.0, 80.0))
            e2 = jnp.exp(jnp.clip(-jof / tau, -80.0, 80.0))
            return e1 * e2

        env_ads = jnp.where(
            post > 0.0,
            s + (1.0 - s) * _fexp(tq - startv - a, d),
            env_attack)
        dt_off = (tq - stopv) + jof
        env = jnp.where(dt_off > 0.0,
                        env_ads * _fexp(tq - stopv, rel), env_ads)
        active = dt_on >= 0.0
        voices = (jnp.where(active, wave.reshape(-1, nq, _Q) * env, 0.0)
                  .reshape(-1, B) * r["vol"][:, None])

        if self.stereo:
            x = (r["pan"][:, None] + 1.0) * 0.5
            gl = jnp.sin((1.0 - x) * np.float32(np.pi / 2))
            gr = jnp.sin(x * np.float32(np.pi / 2))
            left = jnp.sum(voices * gl, axis=0)
            right = jnp.sum(voices * gr, axis=0)
            out = jnp.stack([left, right])
        else:
            out = jnp.sum(voices, axis=0)[None, :]
        return state, [out.astype(jnp.float32)]


class OscillatorBankNode(AudioNode):
    """A bank of V oscillator voices mixed to mono/stereo.

    >>> bank = OscillatorBankNode(ctx, frequencies=freqs, type="sine",
    ...                           starts=starts, attacks=0.05, decays=0.1,
    ...                           sustains=0.6, releases=0.3, stereo=True,
    ...                           pans=pans, volumes=1.0 / len(freqs))
    """

    _number_of_inputs = 0
    _number_of_outputs = 1

    def __init__(self, context, frequencies, type: str = "sine",
                 starts=0.0, stops=np.inf, volumes=1.0,
                 attacks=0.0, decays=0.1, sustains=1.0, releases=0.1,
                 stereo: bool = False, pans=0.0):
        super().__init__(context)
        freqs = np.asarray(frequencies, np.float32)
        v = len(freqs)
        self.frequencies = freqs
        self.type = type
        self.starts = _as_voice_array(starts, v)
        self.stops = np.minimum(_as_voice_array(stops, v), np.float32(1e18))
        self.volumes = _as_voice_array(volumes, v)
        self.attacks = _as_voice_array(attacks, v)
        self.decays = _as_voice_array(decays, v)
        self.sustains = _as_voice_array(sustains, v)
        self.releases = _as_voice_array(releases, v)
        self.stereo = bool(stereo)
        self.pans = _as_voice_array(pans, v)

    @property
    def voices(self) -> int:
        return len(self.frequencies)

    def output_channel_count(self, input_counts):
        return [2 if self.stereo else 1]

    def make_kernel(self, render_ctx):
        return _BankKernel(self, render_ctx)
