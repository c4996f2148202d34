"""Cyclic-graph differential fuzz: random feedback-delay networks vs a
per-sample simulation oracle, plus a two-rate-vs-flat compiler cross-check.

The two-rate cycle compiler (graph/compiler.py, WEBAUDIO_TWO_RATE) steps
broken-SCC groups at the delay-bounded inner rate while the acyclic
majority runs larger outer blocks; its enumerated tests (test_two_rate.py)
pin fixed topologies. Here random loop counts / delays / feedback gains /
source schedules must match (a) a sample-at-a-time numpy simulation of the
reference semantics — an in-cycle delay clamps to >= one render quantum
(delay.rs:535-542, 699-703) and its reader sees only past samples — and
(b) the flat single-rate scan, bit-exactly.
"""

import os

import numpy as np
import pytest

from webaudio_tpu import OfflineAudioContext

FS = 48000.0
QUANTUM = 128


class _LoopSpec:
    def __init__(self, delay_s, fb_gain, src_kind, src_val, start_frame,
                 mix_gain):
        self.delay_s = delay_s
        self.fb_gain = fb_gain
        self.src_kind = src_kind
        self.src_val = src_val
        self.start_frame = start_frame
        self.mix_gain = mix_gain


def _random_spec(seed: int):
    rng = np.random.RandomState(7000 + seed)
    length = int(rng.randint(1500, 5000))
    loops = []
    for _ in range(rng.randint(1, 3)):
        choice = rng.randint(3)
        if choice == 0:
            d = 0.0                       # clamps to one quantum
        elif choice == 1:
            d = rng.randint(QUANTUM, 700) / FS   # exact-integer frames
        else:
            d = float(rng.uniform(0.003, 0.015))
        loops.append(_LoopSpec(
            delay_s=d,
            fb_gain=float(rng.uniform(-0.8, 0.8)),
            src_kind="osc" if rng.rand() < 0.5 else "const",
            src_val=float(rng.uniform(80.0, 2000.0)) if rng.rand() < 0.5
            else float(rng.uniform(0.2, 1.0)),
            start_frame=int(rng.randint(0, length // 3)),
            mix_gain=float(rng.uniform(0.3, 1.0)),
        ))
    return length, loops


def _build_ctx(length, loops):
    ctx = OfflineAudioContext(1, length, FS)
    for lp in loops:
        if lp.src_kind == "osc":
            src = ctx.create_oscillator(type="sine", frequency=lp.src_val)
        else:
            src = ctx.create_constant_source(offset=lp.src_val)
        src.start(lp.start_frame / FS)
        mix = ctx.create_gain(gain=lp.mix_gain)
        src.connect(mix)
        delay = ctx.create_delay(max_delay_time=0.05, delay_time=lp.delay_s)
        fb = ctx.create_gain(gain=lp.fb_gain)
        mix.connect(delay)
        delay.connect(fb)
        fb.connect(mix)                      # the feedback edge (cycle)
        mix.connect(ctx.destination)
    return ctx


def _oracle(length, loops):
    out = np.zeros(length, np.float64)
    for lp in loops:
        # source signal
        n = np.arange(length, dtype=np.float64)
        if lp.src_kind == "osc":
            freq = lp.src_val if lp.src_kind == "osc" else 0.0
            sig = np.sin(2 * np.pi * np.mod(
                (n - lp.start_frame) * (freq / FS), 1.0))
        else:
            sig = np.full(length, lp.src_val)
        sig = np.where(n >= lp.start_frame, sig, 0.0)

        d = max(lp.delay_s, QUANTUM / FS)
        num = d * FS
        n_int = int(np.floor(num))
        k0 = num - n_int
        mix = np.zeros(length, np.float64)
        # per-sample: mix[t] = sig[t] * ? — note the engine's GainNode
        # multiplies its summed input by its gain, so
        #   mix[t] = (sig[t] + fb[t]) * mix_gain
        #   fb[t]  = fb_gain * lerp(mix, t - d*fs)
        for t in range(length):
            a = mix[t - n_int - 1] if t - n_int - 1 >= 0 else 0.0
            b = mix[t - n_int] if t - n_int >= 0 else 0.0
            delayed = b if k0 == 0.0 else (k0 * a + (1.0 - k0) * b)
            mix[t] = (sig[t] + lp.fb_gain * delayed) * lp.mix_gain
        out += mix
    return out.astype(np.float32)


@pytest.mark.parametrize("seed", range(8))
def test_random_feedback_networks_match_per_sample_oracle(seed):
    length, loops = _random_spec(seed)
    got = np.asarray(
        _build_ctx(length, loops).start_rendering_sync().get_channel_data(0))
    ref = _oracle(length, loops)
    assert got.shape == ref.shape
    scale = max(float(np.abs(ref).max()), 1e-3)
    np.testing.assert_allclose(
        got, ref, atol=2e-4 * scale, rtol=0,
        err_msg=f"feedback network diverged from per-sample oracle "
                f"(seed {seed}, loops={len(loops)})")


@pytest.mark.parametrize("seed", range(4))
def test_two_rate_matches_flat_scan_bit_exact(seed):
    length, loops = _random_spec(seed)
    two = np.asarray(
        _build_ctx(length, loops).start_rendering_sync().get_channel_data(0))
    os.environ["WEBAUDIO_TWO_RATE"] = "0"
    try:
        flat = np.asarray(_build_ctx(length, loops)
                          .start_rendering_sync().get_channel_data(0))
    finally:
        os.environ.pop("WEBAUDIO_TWO_RATE", None)
    assert np.array_equal(two, flat), (
        f"two-rate and flat scans disagree (seed {seed}, "
        f"maxdiff {np.abs(two - flat).max()})")
