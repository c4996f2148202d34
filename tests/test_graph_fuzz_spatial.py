"""Whole-graph differential fuzz #2: spatial + dynamics + shaping chains.

Extends the random-soup oracle coverage (test_graph_fuzz_oracle.py) to the
node families whose kernels carry the most hand-derived math (VERDICT r4
item 7): StereoPannerNode (a-rate pan automation), equal-power PannerNode
(static 3-D position, all three distance models), WaveShaperNode (curve
lerp, no oversampling), and DynamicsCompressorNode (knee gain computer +
branching level detector + lookahead delay).

The oracle is independent full-signal numpy in f64: textbook formulas
transcribed from the SPEC semantics the kernels implement
(reference: src/node/stereo_panner.rs:74, panner.rs:927-1055,
waveshaper.rs:556-573, dynamics_compressor.rs:364-470) — per-sample
sequential detector recurrence, explicit azimuth trigonometry, direct
curve lerp.  Any engine-side vectorization trick (chunked MXU detector,
two-hot curve matmul, branchless selects) must reproduce these to f32
tolerance through arbitrary random graphs.
"""

import math

import numpy as np
import pytest

from webaudio_tpu import OfflineAudioContext

from test_graph_fuzz_oracle import _automation_values, _frame_time

FS = 48000.0


# --- per-node oracles -------------------------------------------------------


def _oracle_waveshaper(curve: np.ndarray, x: np.ndarray) -> np.ndarray:
    """waveshaper.rs:556-573 / nodes/waveshaper.py apply_curve index math."""
    n = len(curve)
    v = (n - 1) / 2.0 * (x + 1.0)
    v = np.clip(v, 0.0, float(n - 1))
    ki = np.minimum(np.floor(v).astype(np.int64), n - 2)
    f = v - ki
    c = curve.astype(np.float64)
    return (1.0 - f) * c[ki] + f * c[ki + 1]


def _db_to_lin(v):
    return np.power(10.0, np.asarray(v, np.float64) / 20.0)


def _lin_to_db(v):
    v = np.asarray(v, np.float64)
    return np.where(v == 0.0, -1000.0, 20.0 * np.log10(np.maximum(v, 1e-45)))


def _oracle_compressor(x: np.ndarray, threshold: float, ratio: float,
                       knee: float, attack: float, release: float
                       ) -> np.ndarray:
    """dynamics_compressor.rs:364-470 semantics, mono, per-sample f64."""
    B = x.shape[0]
    half_knee = knee / 2.0
    knee_partial = (1.0 / ratio - 1.0) / (2.0 * max(knee, 1e-30))
    a_tau = 0.0 if attack == 0.0 else math.exp(-1.0 / (attack * FS))
    r_tau = 0.0 if release == 0.0 else math.exp(-1.0 / (release * FS))
    full_range_gain = threshold + (-threshold / ratio)
    full_range_makeup = 1.0 / _db_to_lin(full_range_gain)
    makeup = 20.0 * np.log10(full_range_makeup ** 0.6)

    sample_db = _lin_to_db(np.abs(x))
    over = sample_db - threshold
    knee_branch = sample_db + (over + half_knee) ** 2 * knee_partial
    attenuated = np.where(
        sample_db <= threshold - half_knee, sample_db,
        np.where(sample_db <= threshold + half_knee,
                 knee_branch, threshold + over / ratio))
    xl = sample_db - attenuated

    det = np.zeros(B, np.float64)
    y = 0.0
    for i in range(B):
        tau = a_tau if xl[i] > y else r_tau
        y = tau * y + (1.0 - tau) * xl[i]
        det[i] = y

    reduction = _db_to_lin(-det + makeup)
    delay = int(math.ceil(FS * 0.006 / 128)) * 128
    delayed = np.concatenate([np.zeros(delay), x])[:B]
    return delayed * reduction


def _oracle_stereo_pan(x: np.ndarray, pan: np.ndarray) -> np.ndarray:
    """stereo_panner.rs:60-305, mono input -> (2, B)."""
    p = np.clip(pan, -1.0, 1.0)
    xx = (p + 1.0) * 0.5
    gl = np.sin((1.0 - xx) * np.pi / 2.0)
    gr = np.sin(xx * np.pi / 2.0)
    return np.stack([x * gl, x * gr])


def _oracle_panner_equalpower(x: np.ndarray, pos, model: str,
                              ref_d: float, max_d: float, rolloff: float
                              ) -> np.ndarray:
    """panner.rs:927-1055 + spatial.rs:205-270, mono input, DEFAULT
    listener (origin, forward -z, up +y), default cone (disabled)."""
    px, py, pz = (float(v) for v in pos)
    d = math.sqrt(px * px + py * py + pz * pz)
    if d <= 1e-19:
        azimuth = 0.0
    else:
        sl = np.array([px, py, pz]) / d
        up = np.array([0.0, 1.0, 0.0])      # right x forward' for defaults
        right = np.array([1.0, 0.0, 0.0])
        forward = np.array([0.0, 0.0, -1.0])
        dot_up = float(np.clip(sl @ up, -1.0, 1.0))
        proj = sl - up * dot_up
        pl = float(np.linalg.norm(proj))
        if pl == 0.0:
            azimuth = 0.0
        else:
            projn = proj / pl
            azimuth = 180.0 * math.acos(
                float(np.clip(projn @ right, -1.0, 1.0))) / math.pi
            if projn @ forward < 0.0:
                azimuth = 360.0 - azimuth
            azimuth = (90.0 - azimuth if 0.0 <= azimuth <= 270.0
                       else 450.0 - azimuth)

    if model == "linear":
        ro = min(max(rolloff, 0.0), 1.0)
        d2ref, d2max = min(ref_d, max_d), max(ref_d, max_d)
        dcl = min(max(d, d2ref), d2max)
        dist_gain = 1.0 - ro * (dcl - d2ref) / (d2max - d2ref)
    elif model == "inverse":
        ro = max(rolloff, 0.0)
        dist_gain = (ref_d / (ref_d + ro * (max(d, ref_d) - ref_d))
                     if d > 0.0 else 1.0)
    else:  # exponential
        ro = max(rolloff, 0.0)
        dist_gain = (max(d, ref_d) / ref_d) ** (-ro)

    az = max(-180.0, min(180.0, azimuth))
    if az < -90.0:
        az = -180.0 - az
    elif az > 90.0:
        az = 180.0 - az
    xx = (az + 90.0) / 180.0
    gl = math.cos(xx * math.pi / 2.0)
    gr = math.sin(xx * math.pi / 2.0)
    return np.stack([x * gl * dist_gain, x * gr * dist_gain])


# --- random chain builder ---------------------------------------------------


def _build_random_pair(seed: int):
    rng = np.random.RandomState(1000 + seed)
    length = int(rng.randint(1500, 6000))
    ctx = OfflineAudioContext(2, length, FS)
    has_compressor = False

    def rand_events(hi, lo=0.0):
        events, t_prev = [], 0
        for _ in range(rng.randint(0, 4)):
            f = t_prev + int(rng.randint(1, max(2, length // 3)))
            if f >= length:
                break
            events.append(("set" if rng.rand() < 0.4 else "ramp",
                           _frame_time(f), float(rng.uniform(lo, hi))))
            t_prev = f
        return events

    def apply_events(param, events):
        if not events:
            return
        # explicit origin anchor: a leading ramp with no previous event
        # anchors differently in the engine (intrinsic at insertion) than
        # the oracle's implicit (0, initial) — same device as the base
        # fuzz suite (test_graph_fuzz_oracle.apply_events)
        param.set_value_at_time(param.value, 0.0)
        for kind, t, v in events:
            if kind == "set":
                param.set_value_at_time(v, t)
            else:
                param.linear_ramp_to_value_at_time(v, t)

    n_chains = rng.randint(2, 5)
    acc = np.zeros((2, length), np.float64)
    for _ in range(n_chains):
        sf = int(rng.randint(0, length // 2))
        stopf = int(rng.randint(sf + 1, length)) \
            if rng.rand() < 0.5 else length + 1000
        if rng.rand() < 0.5:
            offset = float(rng.uniform(-1.0, 1.0))
            node = ctx.create_constant_source(offset=offset)
            sig = np.full(length, offset, np.float64)
        else:
            freq = float(rng.uniform(30.0, 4000.0))
            node = ctx.create_oscillator(type="sine", frequency=freq)
            n = np.arange(length, dtype=np.float64)
            sig = np.sin(2.0 * np.pi * np.mod((n - sf) * (freq / FS), 1.0))
        mask = np.zeros(length, bool)
        mask[sf:min(stopf, length)] = True
        sig = np.where(mask, sig, 0.0)
        node.start(_frame_time(sf))
        if stopf <= length:
            node.stop(_frame_time(stopf))

        # body: 0-2 of gain / waveshaper / compressor, any order
        for _ in range(rng.randint(0, 3)):
            pickk = rng.randint(3)
            if pickk == 0:
                g0 = float(rng.uniform(0.1, 1.2))
                g = ctx.create_gain(gain=g0)
                events = rand_events(1.5)
                apply_events(g.gain, events)
                node.connect(g)
                node = g
                sig = sig * _automation_values(g0, events, length)
            elif pickk == 1:
                ncurve = int(rng.randint(2, 9))
                curve = rng.uniform(-1.0, 1.0, ncurve).astype(np.float32)
                w = ctx.create_wave_shaper(oversample="none")
                w.set_curve(curve)
                node.connect(w)
                node = w
                sig = _oracle_waveshaper(curve, sig)
            else:
                has_compressor = True
                thr = float(rng.uniform(-40.0, -5.0))
                rat = float(rng.uniform(1.5, 15.0))
                kn = float(rng.uniform(0.0, 30.0))
                # attack/release spanning both detector paths: the chunked
                # MXU solve needs tau^128 >= 1e-20 (attack >= ~0.5 ms);
                # shorter ones take the generic associative-scan path
                att = float(rng.choice([0.0, 0.003, 0.03, 0.0002]))
                rel = float(rng.uniform(0.05, 0.4))
                comp = ctx.create_dynamics_compressor(
                    threshold=thr, ratio=rat, knee=kn,
                    attack=att, release=rel)
                node.connect(comp)
                node = comp
                sig = _oracle_compressor(sig, thr, rat, kn, att, rel)

        # spatial tail: stereo-panner / equal-power panner / straight
        choice = rng.randint(3)
        if choice == 0:
            pan0 = float(rng.uniform(-1.0, 1.0))
            sp = ctx.create_stereo_panner(pan=pan0)
            events = rand_events(1.0, lo=-1.0)
            apply_events(sp.pan, events)
            node.connect(sp)
            node = sp
            st = _oracle_stereo_pan(
                sig, _automation_values(pan0, events, length))
        elif choice == 1:
            pos = rng.uniform(-4.0, 4.0, 3)
            while np.linalg.norm(pos) < 0.2:
                pos = rng.uniform(-4.0, 4.0, 3)
            model = ["linear", "inverse", "exponential"][rng.randint(3)]
            ro = float(rng.uniform(0.0, 2.0))
            p = ctx.create_panner(
                panning_model="equalpower", distance_model=model,
                position_x=float(pos[0]), position_y=float(pos[1]),
                position_z=float(pos[2]), rolloff_factor=ro)
            node.connect(p)
            node = p
            st = _oracle_panner_equalpower(sig, pos, model, 1.0, 10000.0, ro)
        else:
            st = np.stack([sig, sig])   # mono -> stereo upmix (L = R)

        node.connect(ctx.destination)
        acc += st

    return ctx, acc.astype(np.float32), has_compressor


@pytest.mark.parametrize("seed", range(12))
def test_spatial_dynamics_soup_matches_oracle(seed):
    ctx, ref, has_compressor = _build_random_pair(seed)
    out = ctx.start_rendering_sync()
    got = np.stack([np.asarray(out.get_channel_data(0)),
                    np.asarray(out.get_channel_data(1))])
    assert got.shape == ref.shape
    scale = max(float(np.abs(ref).max()), 1e-3)
    # compressor chains: the engine's f32 chunked detector vs the f64
    # sequential oracle carries ~1e-4 relative (test_effects tolerance);
    # pure spatial/shaping chains hold the tighter graph-fuzz bound
    atol = (1.5e-3 if has_compressor else 7e-5) * scale
    np.testing.assert_allclose(
        got, ref, atol=atol, rtol=0,
        err_msg=f"spatial/dynamics fuzz diverged (seed {seed})")
