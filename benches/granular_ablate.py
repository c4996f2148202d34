"""Granular residual ablation: where do the remaining milliseconds go?

Variants of the 400-grain bench (one warm process): full case, constant
gains (no envelope-row selection), no gain stage at all, and half the
grain density (fewer lanes).  Run after a suite session or standalone.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def _emit(**kw):
    print(json.dumps({k: (round(v, 2) if isinstance(v, float) else v)
                      for k, v in kw.items()}), flush=True)


def build(n_grains=400, env="ramped", seconds=10.0):
    import webaudio_tpu as wa

    fs = 44100.0
    ctx = wa.OfflineAudioContext(2, int(fs * seconds), fs)
    sample = ctx.decode_audio_data_sync(
        "/root/reference/samples/sample.wav")
    rng = np.random.RandomState(1)
    for i in range(n_grains):
        when = i * (seconds - 0.2) / n_grains
        offset = 0.3 + 2.0 * (i / n_grains) + rng.rand() * 0.05
        src = ctx.create_buffer_source(
            playback_rate=float(0.9 + 0.2 * rng.rand()))
        src.buffer = sample
        if env == "none":
            src.connect(ctx.destination)
        else:
            g = ctx.create_gain(gain=0.0)
            if env == "ramped":
                g.gain.set_value_at_time(0.0, when)
                g.gain.linear_ramp_to_value_at_time(0.4, when + 0.045)
                g.gain.linear_ramp_to_value_at_time(0.0, when + 0.09)
            else:  # constant gains (no dense envelope rows)
                g.gain.set_value(0.4)
            src.connect(g)
            g.connect(ctx.destination)
        src.start(when, float(offset), 0.09)
    return ctx, seconds


def main():
    import jax
    import jax.numpy as jnp

    t0 = time.perf_counter()
    float(jax.jit(lambda a: (jnp.sin(a) * a).sum())(
        jnp.arange(128, dtype=jnp.float32)))
    _emit(stage="warmup", cold_start_s=round(time.perf_counter() - t0, 1))

    import suite
    from webaudio_tpu.graph import compiler as C

    probe = jax.jit(lambda o: jnp.max(jnp.abs(o)))

    def measure(name, ctx, seconds, runs=5):
        try:
            cg = C.compile_graph(dict(ctx._nodes), list(ctx._edges),
                                 ctx.sample_rate, ctx.length,
                                 ctx._destination.node_id)
            out, _ = C.render_compiled(cg, ctx._nodes, ctx.length)
            suite._force(lambda: probe(out))
            vals = []
            for _ in range(3):
                t0 = time.perf_counter()
                for _ in range(runs):
                    out, _ = C.render_compiled(cg, ctx._nodes, ctx.length)
                suite._force(lambda: probe(out))
                vals.append(seconds / ((time.perf_counter() - t0) / runs))
            vals.sort()
            _emit(variant=name, rtf=vals[1], lo=vals[0], hi=vals[2])
        except Exception as exc:
            _emit(variant=name, error=f"{type(exc).__name__}: {exc}"[:160])

    for name, kw in [
        ("full_400_ramped", dict()),
        ("const_gains", dict(env="const")),
        ("no_gain_stage", dict(env="none")),
        ("half_density_200", dict(n_grains=200)),
        ("double_density_800", dict(n_grains=800)),
    ]:
        ctx, seconds = build(**kw)
        measure(name, ctx, seconds)

    # round-4 A/B: per-lane spliced envelopes (default) vs the round-3
    # per-voice dense rows + per-quantum row gathers (WEBAUDIO_LANE_ENV=0)
    os.environ["WEBAUDIO_LANE_ENV"] = "0"
    try:
        for name, kw in [
            ("r3_voice_rows_400", dict()),
            ("r3_voice_rows_800", dict(n_grains=800)),
        ]:
            ctx, seconds = build(**kw)
            measure(name, ctx, seconds)
    finally:
        os.environ.pop("WEBAUDIO_LANE_ENV", None)

    # round-4 residual splits (WRONG-OUTPUT study modes, measurement
    # only): cost of the predecessor-grain second fetch, and of the
    # whole fetch stage.  r5: both densities, 25-deep (the 5-deep fence
    # artifact is the same order as the splits being isolated)
    for n in (400, 800):
        ctx, seconds = build(n_grains=n)
        measure(f"baseline25_{n}", ctx, seconds, runs=25)
    for mode in ("single_variant", "no_read"):
        os.environ["WEBAUDIO_GRAIN_ABLATE"] = mode
        try:
            for n in (400, 800):
                ctx, seconds = build(n_grains=n)
                measure(f"ablate_{mode}_{n}", ctx, seconds, runs=25)
        finally:
            os.environ.pop("WEBAUDIO_GRAIN_ABLATE", None)

    # read-mode A/B at lane geometry (lane packing rewrote the window
    # shapes; round 3 judged these at voice-row geometry)
    for mode in ("window", "gather"):
        os.environ["WEBAUDIO_GRAIN_READ"] = mode
        try:
            ctx, seconds = build()
            measure(f"read_{mode}", ctx, seconds)
        finally:
            os.environ.pop("WEBAUDIO_GRAIN_READ", None)


if __name__ == "__main__":
    main()
