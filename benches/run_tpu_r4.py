"""Round-4 one-process TPU bench driver.

Same protocol as run_tpu_r3.py (one process amortizes the remote
compiler's per-process cold start; quote medians across sessions), plus
the round-4 additions:

- the 1024-graph batch (BASELINE.json's literal target scale),
- the ScriptProcessor pure_callback probe (prove or fence on this
  backend),
- A/B phases for the round-4 perf work: granular per-lane envelopes
  (WEBAUDIO_LANE_ENV=0 = round-3 voice rows) and the two-rate cycle
  compiler (WEBAUDIO_TWO_RATE=0 = round-3 single-rate).

Usage: python benches/run_tpu_r4.py [case ...]   (default: everything)
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

MAIN_CASES = [
    "buffer_biquad", "many_oscillators", "many_oscillators_fused",
    "convolution_reverb", "hrtf_moving", "mastering_chain",
    "stereo_pan_automation", "iir_chain", "delay_network",
    "granular_grains", "granular_grains_800", "batched_graphs",
    "mixed_corpus", "script_processor_probe",
]
# run LAST (after the A/B phase): its 1024-lane remote compile blocked
# >45 min in session 6 with no exception to catch — a hang there must
# not cost the rest of the session's data
TAIL_CASES = ["batched_graphs_1024"]
AB_CURVE = ["mastering_chain"]
# Settled A/Bs (re-measure by passing the case name + env by hand):
#   two_rate_off      (s4: conv 517 vs 924, delay 727 vs 1127)
#   read_grouped_straight (s4: 896 vs 1012), unaligned (s4: 691 vs 1012)
#   curve_major       (s4: 487 vs 802), lane_env_off (~390), window (~200)
# Session-5 curve candidates (both kill the materialized two-hot
# intermediates, ~3 GB/render in the mastering case):
#   pallas3  — wide-row (8, 2048) fused kernel, gridded table (the one
#              shape the remote Mosaic compiles; smoke-gated below)
#   rowgather — XLA row gather + fused hat-reduce (gather-fusion bet)


def _emit(**kw):
    print(json.dumps(kw), flush=True)


def main():
    import jax
    import jax.numpy as jnp

    t0 = time.perf_counter()
    float(jax.jit(lambda a: (jnp.sin(a) * a).sum())(
        jnp.arange(128, dtype=jnp.float32)))
    _emit(stage="warmup", cold_start_s=round(time.perf_counter() - t0, 1))

    # dispatch-floor probe: a trivial program timed with the suite's own
    # 5-dispatch pipeline + single fence protocol.  stereo_pan (near-zero
    # real work) measures ~8 ms/render, and the session-4 profile showed
    # component removal doesn't move mastering below ~12 ms — this pins
    # how much of every case's wall is per-execute tunnel latency.
    triv = jax.jit(lambda a: (a * jnp.float32(1.000001)).sum())
    arg = jnp.arange(1024, dtype=jnp.float32)
    float(triv(arg))   # compile
    for depth in (1, 5, 25, 100):
        floors = []
        for _ in range(3):
            t0 = time.perf_counter()
            r = None
            for _ in range(depth):
                r = triv(arg)
            float(r)
            floors.append((time.perf_counter() - t0) / depth)
        floors.sort()
        _emit(stage="dispatch_floor", depth=depth,
              ms_per_exec=round(floors[1] * 1e3, 3),
              runs_ms=[round(f * 1e3, 3) for f in floors])

    rng = np.random.default_rng(2)

    # Pallas windowed-read smoke: exactness on the real chip
    try:
        from webaudio_tpu.ops.grain_read import (
            windowed_read_reference, windowed_read_tpu)
        C, L, Qs, W = 2, 4000, 128, 192
        NB = 23
        data = np.zeros((C, L + W + 2), np.float32)
        data[:, :L] = rng.standard_normal((C, L)).astype(np.float32)
        w0 = rng.integers(0, L - W, size=NB).astype(np.int32)
        loc = rng.integers(0, W - 2, size=(NB, Qs)).astype(np.int32)
        frac = rng.random((NB, Qs)).astype(np.float32)
        got = np.asarray(windowed_read_tpu(
            jnp.asarray(data), jnp.asarray(w0), jnp.asarray(loc),
            jnp.asarray(frac), Qs, W))
        ref = windowed_read_reference(data, w0, loc, frac)
        dev = float(np.abs(got - ref).max())
        assert dev < 2e-6, dev
        _emit(stage="pallas_smoke", ok=True, maxdev=dev)
    except Exception as exc:
        # informational only: the default read path (grouped_t) is pure
        # XLA; Pallas is reached only via WEBAUDIO_GRAIN_READ=window
        _emit(stage="pallas_smoke", ok=False,
              error=f"{type(exc).__name__}: {exc}"[:300])

    # curve-kernel smoke: gate the Pallas curve paths the same way.
    # pallas2 (the grain_read-shaped kernel, samples on lanes) is tried
    # first — its block geometry matches the one kernel family the remote
    # Mosaic demonstrably accepts; v1 second; transposed XLA otherwise.
    n, seg = 2048, 64
    grid = np.linspace(-1, 1, n)
    curve = np.tanh(2.0 * grid).astype(np.float32)
    nseg = -(-n // seg)
    npad = nseg * seg
    cpad = np.concatenate([curve, np.broadcast_to(curve[-1],
                                                  (npad + 1 - n,))])
    T = np.zeros((nseg, seg + 1), np.float32)
    T[:, :seg] = cpad[:npad].reshape(nseg, seg)
    T[:, seg] = cpad[seg::seg][:nseg]
    xs = rng.uniform(-1.2, 1.2, size=1 << 15).astype(np.float32)
    v = np.clip((n - 1) / 2.0 * (xs + 1.0), 0, n - 1)
    ki = np.minimum(np.floor(v).astype(np.int64), n - 2)
    f = (v - ki).astype(np.float32)
    ref = (1 - f) * curve[ki] + f * curve[ki + 1]

    from webaudio_tpu.ops import curve_kernel as ck

    # The XLA transposed two-hot stays the session default; pallas3
    # (tile-aligned, gridded table) COMPILES on the remote Mosaic
    # (trigger isolated: ungridded no-block-shape VMEM operands HTTP-500
    # the compile helper; v1/v2 both carry one).  Sessions 2-4 measured
    # the OLD (16, 128) row geometry slower in situ (~30k grid-serialized
    # tiny dots); session 5 A/Bs the wide-row (8, 2048) geometry below.
    smoked_ok = set()
    for mode, fn, tab in (
            ("pallas3", ck.curve_lookup_tpu_v3, None),
            ("pallas2", ck.curve_lookup_tpu_v2, T),
            ("pallas", ck.curve_lookup_tpu, T.T)):
        if mode == "pallas3":
            segk = 127
            nsegk = -(-n // segk)
            npadk = nsegk * segk
            cpk = np.concatenate(
                [curve, np.broadcast_to(curve[-1], (npadk + 1 - n,))])
            tab = np.zeros((nsegk, segk + 1), np.float32)
            tab[:, :segk] = cpk[:npadk].reshape(nsegk, segk)
            tab[:, segk] = cpk[segk::segk][:nsegk]
            segx = segk
        else:
            segx = seg
        try:
            got = np.asarray(fn(jnp.asarray(xs), jnp.asarray(tab), n, segx))
            dev = float(np.abs(got - ref).max())
            assert dev < 2e-6, dev
            smoked_ok.add(mode)
            _emit(stage="curve_smoke", ok=True, mode=mode, maxdev=dev)
        except Exception as exc:
            _emit(stage="curve_smoke", ok=False, mode=mode,
                  error=f"{type(exc).__name__}: {exc}"[:300])

    import suite

    requested = sys.argv[1:]
    names = requested or MAIN_CASES
    saved_argv = sys.argv
    try:
        sys.argv = ["suite.py"] + names
        suite.main()

        if not requested:
            # curve-formulation A/B for the mastering residual: since
            # session 6 the default is auto (probed pallas3 on this
            # backend), so the main phase already measures the fused
            # kernel; A/B the XLA two-hot to track the delta.
            # (rowgather settled in s5: 632 vs 920 xla — dead end.)
            variants = ["xla"]
            if "pallas3" not in smoked_ok:
                variants = ["rowgather"]
            for vmode in variants:
                _emit(stage="ab", variant=f"curve_{vmode}")
                os.environ["WEBAUDIO_CURVE"] = vmode
                os.environ["WEBAUDIO_BENCH_TAG"] = f":curve_{vmode}"
                sys.argv = ["suite.py"] + AB_CURVE
                suite.main()
            os.environ.pop("WEBAUDIO_CURVE", None)
            os.environ.pop("WEBAUDIO_BENCH_TAG", None)

            # aligned-read A/B: the r4 dynamic_slice fast path vs the
            # pair-gather formulation it replaced, in situ
            _emit(stage="ab", variant="buf_gather")
            os.environ["WEBAUDIO_BUF_ALIGNED"] = "0"
            os.environ["WEBAUDIO_BENCH_TAG"] = ":buf_gather"
            sys.argv = ["suite.py", "buffer_biquad", "iir_chain"]
            suite.main()
            os.environ.pop("WEBAUDIO_BUF_ALIGNED", None)
            os.environ.pop("WEBAUDIO_BENCH_TAG", None)

            # packed Pallas grouped-select candidate (kills the ~1.3 GB
            # of broadcast intermediates in the XLA select —
            # SUB1000_ANALYSIS round-4 addendum); opt-in until it wins
            # this A/B on a healthy session
            _emit(stage="ab", variant="grain_grouped_pl")
            os.environ["WEBAUDIO_GRAIN_READ"] = "grouped_pl"
            os.environ["WEBAUDIO_BENCH_TAG"] = ":grouped_pl"
            sys.argv = ["suite.py", "granular_grains", "granular_grains_800"]
            suite.main()
            os.environ.pop("WEBAUDIO_GRAIN_READ", None)
            os.environ.pop("WEBAUDIO_BENCH_TAG", None)

            sys.argv = ["suite.py"] + TAIL_CASES
            suite.main()

    finally:
        sys.argv = saved_argv


if __name__ == "__main__":
    main()
