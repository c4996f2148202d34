"""Headline benchmark: offline-render realtime factor on real hardware.

Workload = BASELINE.json config 1: AudioBufferSourceNode (sample.wav,
decoded+resampled host-side) -> BiquadFilterNode lowpass -> destination,
10 s @ 48 kHz stereo (the reference's benches/my_benchmark.rs buffer-src +
biquad cases and tests/offline.rs path).

Prints ONE json line: realtime factor (audio seconds rendered per wall
second per chip), steady-state (compile excluded via warmup; the graph is
compiled once and re-rendered, matching a serving deployment).
vs_baseline is measured against the north-star target of 1000x realtime
(BASELINE.json; the reference publishes no absolute numbers — see
BASELINE.md).
"""

import json
import os
import sys
import time

import numpy as np


def build_context():
    import webaudio_tpu as wa

    fs = 48000.0
    seconds = 10.0
    ctx = wa.OfflineAudioContext(2, int(fs * seconds), fs)

    sample_path = "/root/reference/samples/sample.wav"
    if os.path.exists(sample_path):
        buf = ctx.decode_audio_data_sync(sample_path)
    else:  # synthetic fallback when samples are unavailable
        buf = wa.AudioBuffer.from_array(
            np.sin(np.arange(2 * 48000) * 0.03, dtype=np.float32)[None]
            .repeat(2, 0), fs)
    src = ctx.create_buffer_source(loop=True)
    src.buffer = buf
    src.start()

    filt = ctx.create_biquad_filter(type="lowpass", frequency=2000.0, q=2.0)
    src.connect(filt)
    filt.connect(ctx.destination)
    return ctx, seconds


def _wait_for_backend(max_wait_s=1500):
    """The tunneled axon backend has transient multi-minute UNAVAILABLE
    windows (observed 2026-08-17: >2 h outage mid-round).  Retry init for
    a bounded window before giving up so a momentary blip doesn't zero
    the round's headline number."""
    import jax

    t0 = time.time()
    while True:
        try:
            jax.devices()
            return
        except Exception as exc:
            if time.time() - t0 > max_wait_s:
                raise
            print(f"# backend unavailable ({type(exc).__name__}); "
                  f"retrying...", file=sys.stderr, flush=True)
            time.sleep(60)


def main():
    from webaudio_tpu.graph import compiler as C

    _wait_for_backend()
    ctx, seconds = build_context()

    cg = C.compile_graph(dict(ctx._nodes), list(ctx._edges), ctx.sample_rate,
                         ctx.length, ctx._destination.node_id)

    # Timing methodology: on the tunneled axon backend block_until_ready()
    # returns at ENQUEUE, not completion, so timing with it measures RPC
    # dispatch latency rather than compute.  The reliable fence is a
    # dependent on-device scalar reduction read back to the host: the
    # device executes dispatches in order, so forcing the last render's
    # probe bounds all of them.  The probe doubles as the validity gate
    # (NaN propagates through max; silence reads 0).
    import jax
    import jax.numpy as jnp

    probe = jax.jit(lambda o: jnp.max(jnp.abs(o)))

    def force(make_scalar, retries=10):
        # transfers can fail UNIMPLEMENTED while the tunnel's transfer
        # path warms up or while heavy work is queued, and the failure is
        # sticky on the poisoned array — every retry must re-dispatch a
        # fresh probe
        for attempt in range(retries):
            try:
                return float(make_scalar())
            except Exception:
                if attempt == retries - 1:
                    raise
                time.sleep(min(2.0 * (attempt + 1), 20.0))

    # warmup: stage params/buffers + compile (remote compile on tunneled
    # backends takes tens of seconds, once) + validity gate
    out, _ = C.render_compiled(cg, ctx._nodes, ctx.length)
    peak = force(lambda: probe(out))
    assert np.isfinite(peak), "bench graph rendered NaN/Inf"
    assert peak > 0.0, "bench graph rendered silence"

    # steady-state throughput: pipeline the renders, fence once at the end
    # of each trial.  >=3 independent fenced trials so the artifact carries
    # the run-to-run spread (~±20% tunnel dispatch drift) instead of a
    # single number that may be quoted from a drift peak.  Depth 50: the
    # end-of-trial fence costs a FIXED ~29 ms tunnel readback RTT
    # regardless of depth (r4 dispatch_floor probe: 29.1 ms/exec at depth
    # 1 -> 0.46 at depth 100), so shallow pipelines measure the fence,
    # not the render; at depth 50 the artifact is <0.6 ms/render.
    trials, runs = 3, 50
    factors = []
    for _ in range(trials):
        t0 = time.perf_counter()
        for _ in range(runs):
            out, _ = C.render_compiled(cg, ctx._nodes, ctx.length)
        force(lambda: probe(out))
        wall = (time.perf_counter() - t0) / runs
        factors.append(seconds / wall)

    # 5-deep protocol too, so BENCH_r05+ is comparable with BOTH r03
    # (depth 5) and r04 (depth 50) — the depth change mid-round-4 made
    # those two incomparable (VERDICT r4 weak #4); see BASELINE.md
    factors5 = []
    for _ in range(trials):
        t0 = time.perf_counter()
        for _ in range(5):
            out, _ = C.render_compiled(cg, ctx._nodes, ctx.length)
        force(lambda: probe(out))
        factors5.append(seconds / ((time.perf_counter() - t0) / 5))
    factors5.sort()

    # Optional full-buffer validation (heavy on tunneled backends)
    if os.environ.get("WEBAUDIO_BENCH_VALIDATE"):
        full = np.asarray(out)
        assert full.shape[0] == 2 and np.isfinite(full).all()
        assert np.abs(full).max() > 0.0, "bench graph rendered silence"

    factors.sort()
    value = factors[len(factors) // 2]  # median of the fenced trials
    spread_pct = 100.0 * (factors[-1] - factors[0]) / value
    print(json.dumps({
        "metric": "offline_render_realtime_factor",
        "value": round(value, 1),
        "unit": "x_realtime_per_chip",
        "vs_baseline": round(value / 1000.0, 3),
        "runs": [round(f, 1) for f in factors],
        "spread_pct": round(spread_pct, 1),
        "pipeline_depth": 50,
        "value_5deep": round(factors5[len(factors5) // 2], 1),
        "runs_5deep": [round(f, 1) for f in factors5],
    }))


if __name__ == "__main__":
    main()
