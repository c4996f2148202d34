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
    "granular_grains", "batched_graphs", "batched_graphs_1024",
    "mixed_corpus", "script_processor_probe",
]
AB_TWO_RATE = ["convolution_reverb", "delay_network"]
AB_CURVE = ["mastering_chain"]   # vs WEBAUDIO_CURVE=major (r3) / gather
# session-4+ A/Bs: transposed grouped-row select (grouped_t, the new
# default) vs the straight round-3 layout, and quantum-aligned lane
# packing (single fetch) vs the legacy hi/lo packing.  (lane_env_off and
# read_window were settled twice in sessions 1-3: ~390x / ~200x.)
AB_READ_STRAIGHT = ["granular_grains"]   # WEBAUDIO_GRAIN_READ=grouped
AB_UNALIGNED = ["granular_grains"]       # WEBAUDIO_GRAIN_ALIGNED=0


def _emit(**kw):
    print(json.dumps(kw), flush=True)


def main():
    import jax
    import jax.numpy as jnp

    t0 = time.perf_counter()
    float(jax.jit(lambda a: (jnp.sin(a) * a).sum())(
        jnp.arange(128, dtype=jnp.float32)))
    _emit(stage="warmup", cold_start_s=round(time.perf_counter() - t0, 1))

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

    # Diagnostic only — the XLA transposed two-hot stays the session
    # default.  pallas3 (tile-aligned, gridded table) COMPILES on the
    # remote Mosaic (trigger isolated: ungridded no-block-shape VMEM
    # operands HTTP-500 the compile helper; v1/v2 both carry one) but
    # measured SLOWER in situ than the XLA formulation in three
    # same-process A/Bs (508 vs 617, 648/684 vs 802) — grid-serialized
    # dots vs overlap-friendly XLA streaming.
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
            # A/B: round-3 formulations, same process, same service health
            _emit(stage="ab", variant="two_rate_off")
            os.environ["WEBAUDIO_TWO_RATE"] = "0"
            os.environ["WEBAUDIO_BENCH_TAG"] = ":two_rate_off"
            sys.argv = ["suite.py"] + AB_TWO_RATE
            suite.main()
            os.environ.pop("WEBAUDIO_TWO_RATE", None)

            _emit(stage="ab", variant="read_grouped_straight")
            os.environ["WEBAUDIO_GRAIN_READ"] = "grouped"
            os.environ["WEBAUDIO_BENCH_TAG"] = ":read_grouped_straight"
            sys.argv = ["suite.py"] + AB_READ_STRAIGHT
            suite.main()
            os.environ.pop("WEBAUDIO_GRAIN_READ", None)

            _emit(stage="ab", variant="unaligned")
            os.environ["WEBAUDIO_GRAIN_ALIGNED"] = "0"
            os.environ["WEBAUDIO_BENCH_TAG"] = ":unaligned"
            sys.argv = ["suite.py"] + AB_UNALIGNED
            suite.main()
            os.environ.pop("WEBAUDIO_GRAIN_ALIGNED", None)

            # curve-formulation A/B for the mastering residual: the main
            # phase already ran the session's best mode (pallas2/pallas
            # when the smoke passed, else transposed XLA); measure the
            # round-3 major-axis layout and, when a Pallas mode won the
            # smoke, the transposed XLA layout too.
            chosen = os.environ.get("WEBAUDIO_CURVE", "xla")
            variants = ["major"]
            if chosen != "xla":
                variants.append("xla")
            for vmode in variants:
                _emit(stage="ab", variant=f"curve_{vmode}")
                os.environ["WEBAUDIO_CURVE"] = vmode
                os.environ["WEBAUDIO_BENCH_TAG"] = f":curve_{vmode}"
                sys.argv = ["suite.py"] + AB_CURVE
                suite.main()
            if chosen == "xla":
                os.environ.pop("WEBAUDIO_CURVE", None)
            else:
                os.environ["WEBAUDIO_CURVE"] = chosen
            os.environ.pop("WEBAUDIO_BENCH_TAG", None)

    finally:
        sys.argv = saved_argv


if __name__ == "__main__":
    main()
