"""Round-5 one-process TPU bench driver.

Protocol = run_tpu_r4.py (one process amortizes the remote compiler's
per-process cold start; quote medians across sessions) plus the round-5
measurement-integrity changes (VERDICT r4 items 1-2):

- SESSION-HEALTH GATE: the batched on-chip canary runs FIRST and LAST.
  It is the committed record's sharpest health discriminator (r4:
  9,087-11,240x in healthy s4-s6 vs 3,930x in the degraded final_s8);
  a session whose canary median falls under CANARY_MIN is marked
  degraded in a `session_health` record and aggregate_results.py
  excludes it.
- the aligned-read adjudication A/B (WEBAUDIO_BUF_ALIGNED=0) over every
  buffer-sourced case the default touches (buffer_biquad == bench.py's
  workload, iir_chain, convolution_reverb, delay_network,
  mastering_chain) — queued since round 4 (ROUND4_NOTES: "first action
  of round 5").
- the grouped_pl grain-select A/B re-queued (its only r4 measurement
  was the degraded s8).

Usage: python benches/run_tpu_r5.py [case ...]   (default: everything)
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
# run LAST (after the A/B phases): its 1024-lane remote compile blocked
# >45 min in r4 session 6 with no exception to catch — a hang there must
# not cost the rest of the session's data
TAIL_CASES = ["batched_graphs_1024"]

# healthy envelope (r4 sessions 4-6 batched_graphs on-chip: 9,087-11,240;
# degraded s8: 3,930).  60% of the healthy median per VERDICT r4 item 1a.
CANARY_MIN = 6000.0


def _emit(**kw):
    print(json.dumps(kw), flush=True)


def _canary(suite, tag):
    try:
        val, vals = suite.case_canary_batched()
        _emit(case=f"canary_batched:{tag}", metric="canary_batched_rtf",
              value=round(val, 1), runs=[round(v, 1) for v in vals])
        return val
    except Exception as exc:
        _emit(case=f"canary_batched:{tag}",
              error=f"{type(exc).__name__}: {exc}"[:300])
        return 0.0


def main():
    import jax
    import jax.numpy as jnp

    t0 = time.perf_counter()
    float(jax.jit(lambda a: (jnp.sin(a) * a).sum())(
        jnp.arange(128, dtype=jnp.float32)))
    _emit(stage="warmup", cold_start_s=round(time.perf_counter() - t0, 1))

    # dispatch-floor probe: pins how much of every case's wall is
    # per-execute tunnel latency (~23-29 ms fence RTT at depth 1)
    triv = jax.jit(lambda a: (a * jnp.float32(1.000001)).sum())
    arg = jnp.arange(1024, dtype=jnp.float32)
    float(triv(arg))   # compile
    floor25 = None
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
        if depth == 25:
            floor25 = floors[1] * 1e3
        _emit(stage="dispatch_floor", depth=depth,
              ms_per_exec=round(floors[1] * 1e3, 3),
              runs_ms=[round(f * 1e3, 3) for f in floors])

    import suite

    # session-health canary, FIRST (compile + on-chip loop only)
    canary_start = _canary(suite, "start")
    healthy = canary_start >= CANARY_MIN
    _emit(stage="session_health", when="start", healthy=healthy,
          canary=round(canary_start, 1), canary_min=CANARY_MIN,
          dispatch_floor_d25_ms=round(floor25, 3) if floor25 else None)

    requested = sys.argv[1:]
    names = requested or MAIN_CASES
    saved_argv = sys.argv
    try:
        sys.argv = ["suite.py"] + names
        suite.main()

        if not requested:
            # aligned-read adjudication (VERDICT r4 item 2): the
            # dynamic_slice fast path (default since r4) vs the pair
            # gather, on every case the default touches
            _emit(stage="ab", variant="buf_gather")
            os.environ["WEBAUDIO_BUF_ALIGNED"] = "0"
            os.environ["WEBAUDIO_BENCH_TAG"] = ":buf_gather"
            sys.argv = ["suite.py", "buffer_biquad", "iir_chain",
                        "convolution_reverb", "delay_network",
                        "mastering_chain"]
            suite.main()
            os.environ.pop("WEBAUDIO_BUF_ALIGNED", None)
            os.environ.pop("WEBAUDIO_BENCH_TAG", None)

            # joint (inner, m) two-rate plan A/B (r5): reverb inner
            # 96 x m36 / delay-net 125 x m30 (default) vs the legacy
            # sequential choice (64 x m54 / 128-quanta inner)
            _emit(stage="ab", variant="inner_legacy")
            os.environ["WEBAUDIO_INNER_FAST"] = "0"
            os.environ["WEBAUDIO_BENCH_TAG"] = ":inner_legacy"
            sys.argv = ["suite.py", "convolution_reverb", "delay_network"]
            suite.main()
            os.environ.pop("WEBAUDIO_INNER_FAST", None)
            os.environ.pop("WEBAUDIO_BENCH_TAG", None)

            # curve-formulation delta (default = auto -> pallas3 where
            # the backend accepts it; track the XLA two-hot)
            _emit(stage="ab", variant="curve_xla")
            os.environ["WEBAUDIO_CURVE"] = "xla"
            os.environ["WEBAUDIO_BENCH_TAG"] = ":curve_xla"
            sys.argv = ["suite.py", "mastering_chain"]
            suite.main()
            os.environ.pop("WEBAUDIO_CURVE", None)
            os.environ.pop("WEBAUDIO_BENCH_TAG", None)

            # grain-read A/B: the whole-bank fused VMEM kernel became
            # the probed TPU default late in r5 (runs_r05/probe_gf4:
            # 800 grains 999/2,025 vs grouped_t 640/1,006 at 5/ss25,
            # bit-exact on chip), so the contrast row forces the XLA
            # transposed select.  (grouped_v probe_gv; grouped_pl
            # s1/s2, grouped_dot s3, grouped_t2 s5-s7 — all settled.)
            _emit(stage="ab", variant="grain_grouped_t")
            os.environ["WEBAUDIO_GRAIN_READ"] = "grouped_t"
            os.environ["WEBAUDIO_BENCH_TAG"] = ":grouped_t"
            sys.argv = ["suite.py", "granular_grains", "granular_grains_800"]
            suite.main()
            os.environ.pop("WEBAUDIO_GRAIN_READ", None)
            os.environ.pop("WEBAUDIO_BENCH_TAG", None)

            sys.argv = ["suite.py"] + TAIL_CASES
            suite.main()

            # canary again: catches MID-session degradation (r4 s8's
            # sickness developed while running)
            canary_end = _canary(suite, "end")
            healthy = healthy and canary_end >= CANARY_MIN
            _emit(stage="session_health", when="end", healthy=healthy,
                  canary=round(canary_end, 1), canary_min=CANARY_MIN)
    finally:
        sys.argv = saved_argv


if __name__ == "__main__":
    main()
