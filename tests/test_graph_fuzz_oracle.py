"""Whole-graph differential fuzz: the compiled trace-and-scan engine vs an
independent full-signal numpy oracle.

The existing oracle suites each cover one axis (node kernels vs scipy /
closed form, the automation walk vs a per-quantum interpreter, fusion vs
no-fusion). This one covers their *interactions*: random acyclic graph
soups of scheduled sources, gain chains with linear-ramp automation,
audio-rate param connections, fan-in mixing, and fractional delays must
render identically to a direct per-node evaluation over the full signal.

The oracle is deliberately naive — topological order, full-length f64
arrays per node, textbook formulas:

  - constant source: automation(offset) masked to [start_frame, stop_frame)
  - sine oscillator: sin(2*pi*f*(n - s0)/fs) masked (constant frequency)
  - gain: in * clip(automation(gain) + sum(param audio inputs))
  - delay: lerp of the input at continuous position n - d*fs, silent
    before the first input sample (reference: delay.rs:560-706 semantics)

Event/schedule times are frame-aligned (k/fs) so both sides agree on the
frame mapping exactly (the sub-sample cases are pinned by the transcribed
reference vectors; this file is about graph-level composition).
"""

import math

import numpy as np
import pytest

from webaudio_tpu import OfflineAudioContext

FS = 48000.0


def _frame_time(frame: int) -> float:
    return frame / FS


def _time_to_frame(t: float) -> int:
    # mirrors scheduled_source._time_to_frame: ceil with sticky snap
    f = t * FS
    r = round(f)
    if abs(f - r) <= 1.5e-8 * max(abs(f), 1.0):
        f = r
    return int(math.ceil(f))


def _automation_values(initial: float, events, length: int) -> np.ndarray:
    """Evaluate set_value_at_time / linear_ramp events per sample.

    events: sorted list of ("set"|"ramp", time_seconds, value).
    Reference semantics (param.rs): a set jumps at its frame; a ramp
    interpolates from the previous event's (time, value) anchor and holds
    its end value afterwards; a ramp with no previous event anchors at
    (0, initial).
    """
    out = np.full(length, initial, dtype=np.float64)
    anchor_t, anchor_v = 0.0, float(initial)
    n = np.arange(length, dtype=np.float64)
    t = n / FS
    for kind, et, ev in events:
        ef = _time_to_frame(et)
        if kind == "set":
            out[min(ef, length):] = ev
        else:  # ramp
            dur = et - anchor_t
            if dur <= 0:
                out[min(ef, length):] = ev
            else:
                seg = (t >= anchor_t) & (t < et)
                out[seg] = anchor_v + (ev - anchor_v) * (
                    (t[seg] - anchor_t) / dur)
                out[min(ef, length):] = ev
        anchor_t, anchor_v = et, float(ev)
    return out


def _oracle_delay(x: np.ndarray, d_seconds: float) -> np.ndarray:
    n = np.arange(x.shape[0], dtype=np.float64)
    p = n - d_seconds * FS
    lo = np.floor(p).astype(np.int64)
    frac = p - lo
    top = x.shape[0] - 1
    xa = np.where((lo >= 0) & (lo <= top), x[np.clip(lo, 0, top)], 0.0)
    hi = lo + 1
    xb = np.where((hi >= 0) & (hi <= top), x[np.clip(hi, 0, top)], 0.0)
    return (1.0 - frac) * xa + frac * xb


class _OracleGraph:
    """Full-signal per-node evaluation in creation (= topological) order."""

    def __init__(self, length: int):
        self.length = length
        self.specs = []          # (kind, payload, input_ids, param_inputs)
        self.dest_inputs = []

    def render(self) -> np.ndarray:
        outs = {}
        for idx, (kind, payload, input_ids, param_inputs) in enumerate(
                self.specs):
            mix = np.zeros(self.length, np.float64)
            for i in input_ids:
                mix += outs[i]
            if kind == "const":
                vals = _automation_values(payload["offset"],
                                          payload["events"], self.length)
                mask = np.zeros(self.length, bool)
                mask[payload["start_frame"]:payload["stop_frame"]] = True
                outs[idx] = np.where(mask, vals, 0.0)
            elif kind == "osc":
                n = np.arange(self.length, dtype=np.float64)
                s0 = payload["start_frame"]
                phase = (n - s0) * (payload["freq"] / FS)
                sig = np.sin(2.0 * np.pi * np.mod(phase, 1.0))
                mask = np.zeros(self.length, bool)
                mask[s0:payload["stop_frame"]] = True
                outs[idx] = np.where(mask, sig, 0.0)
            elif kind == "gain":
                g = _automation_values(payload["gain"], payload["events"],
                                       self.length)
                for pid in param_inputs:
                    g = g + outs[pid]
                outs[idx] = mix * g
            elif kind == "delay":
                outs[idx] = _oracle_delay(mix, payload["delay"])
            else:  # pragma: no cover
                raise AssertionError(kind)
        acc = np.zeros(self.length, np.float64)
        for i in self.dest_inputs:
            acc += outs[i]
        return acc.astype(np.float32)


def _build_random_pair(seed: int, ctx=None, offset_frames: int = 0):
    """Build (context, oracle) for one random graph.

    ctx/offset_frames let other driver tests (online loop, RenderSession)
    mount the same graph on a different context with every schedule and
    automation event shifted by offset_frames; the oracle stays at t=0, so
    the caller compares engine output from offset_frames onward.
    """
    rng = np.random.RandomState(seed)
    length = int(rng.randint(900, 6000))
    if ctx is None:
        ctx = OfflineAudioContext(1, length, FS)
    off_t = offset_frames / FS
    oracle = _OracleGraph(length)

    def rand_events(base, hi):
        events, t_prev = [], 0
        for _ in range(rng.randint(0, 4)):
            f = t_prev + int(rng.randint(1, max(2, length // 3)))
            if f >= length:
                break
            t = _frame_time(f)
            v = float(rng.uniform(0.0, hi))
            kind = "set" if rng.rand() < 0.4 else "ramp"
            events.append((kind, t, v))
            t_prev = f
        return events

    def apply_events(param, base, events):
        if not events:
            return
        # explicit anchor at the (shifted) origin: without it, a leading
        # ramp would anchor at the context's absolute t=0 instead of the
        # graph's shifted origin (the oracle's implicit (0, initial)
        # anchor); value == intrinsic, so at offset 0 it is a no-op
        param.set_value_at_time(base, off_t)
        for kind, t, v in events:
            if kind == "set":
                param.set_value_at_time(v, t + off_t)
            else:
                param.linear_ramp_to_value_at_time(v, t + off_t)

    n_src = rng.randint(2, 6)
    chains = []               # (engine tail node, oracle tail id)
    for _ in range(n_src):
        sf = int(rng.randint(0, length // 2))
        stopf = int(rng.randint(sf + 1, length + 200)) \
            if rng.rand() < 0.5 else length + 1000
        if rng.rand() < 0.5:
            offset = float(rng.uniform(-1.0, 1.0))
            src = ctx.create_constant_source(offset=offset)
            events = rand_events(offset, 1.0)
            apply_events(src.offset, offset, events)
            oracle.specs.append(("const", {
                "offset": offset, "events": events,
                "start_frame": sf, "stop_frame": min(stopf, length),
            }, [], []))
        else:
            freq = float(rng.uniform(30.0, 4000.0))
            src = ctx.create_oscillator(type="sine", frequency=freq)
            oracle.specs.append(("osc", {
                "freq": freq,
                "start_frame": sf, "stop_frame": min(stopf, length),
            }, [], []))
        oid = len(oracle.specs) - 1
        src.start(_frame_time(sf) + off_t)
        if stopf <= length + 200:
            src.stop(_frame_time(stopf) + off_t)

        node, tail = src, oid
        for _ in range(rng.randint(0, 3)):
            if rng.rand() < 0.6:
                g0 = float(rng.uniform(0.1, 1.2))
                g = ctx.create_gain(gain=g0)
                events = rand_events(g0, 1.5)
                apply_events(g.gain, g0, events)
                oracle.specs.append(("gain", {"gain": g0, "events": events},
                                     [tail], []))
            else:
                # include exact-integer, zero, and fractional delays
                choice = rng.randint(3)
                if choice == 0:
                    d = rng.randint(0, 700) / FS
                elif choice == 1:
                    d = 0.0
                else:
                    d = float(rng.uniform(0.0, 0.015))
                g = ctx.create_delay(max_delay_time=0.05, delay_time=d)
                oracle.specs.append(("delay", {"delay": d}, [tail], []))
            node.connect(g)
            node, tail = g, len(oracle.specs) - 1
        chains.append((node, tail))

    # route every chain into the destination through 1-2 mix gains; with
    # some probability a chain instead modulates a mix gain's gain param
    n_mix = rng.randint(1, 3)
    mixes = []
    for _ in range(n_mix):
        mg0 = float(rng.uniform(0.2, 0.8))
        m = ctx.create_gain(gain=mg0)
        m.connect(ctx.destination)
        oracle.specs.append(("gain", {"gain": mg0, "events": []}, [], []))
        mid = len(oracle.specs) - 1
        oracle.dest_inputs.append(mid)
        mixes.append((m, mid))

    for i, (node, tail) in enumerate(chains):
        m, mid = mixes[rng.randint(n_mix)]
        if i > 0 and rng.rand() < 0.25:
            node.connect(m.params["gain"])
            oracle.specs[mid][3].append(tail)
        else:
            node.connect(m)
            oracle.specs[mid][2].append(tail)

    return ctx, oracle


@pytest.mark.parametrize("seed", range(10))
def test_random_graph_matches_full_signal_oracle(seed):
    ctx, oracle = _build_random_pair(seed)
    got = np.asarray(ctx.start_rendering_sync().get_channel_data(0))
    ref = oracle.render()
    assert got.shape == ref.shape
    scale = max(float(np.abs(ref).max()), 1e-3)
    np.testing.assert_allclose(
        got, ref, atol=5e-5 * scale, rtol=0,
        err_msg=f"graph fuzz diverged from oracle (seed {seed})")
