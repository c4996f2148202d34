"""Round-5 TPU profiling: where do the last two sub-1000x cases spend?

Run alone on the TPU (single-client backend!):

    python benches/profile_r5.py [section ...]

Sections: mastering, granular.  Uses 25-deep pipelining so the fixed
~25 ms end-of-trial fence RTT (dispatch_floor probe, r4) contributes
<1.1 ms/render — the r3/r4 profiles ran 5-deep and carried ~5 ms of
artifact in every ablation, which is the same order as the effects being
isolated.  Prints one JSON line per measurement.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import suite  # noqa: E402


def _emit(**kw):
    print(json.dumps({k: (round(v, 4) if isinstance(v, float) else v)
                      for k, v in kw.items()}), flush=True)


def _time_graph(ctx, seconds, depth=25, trials=3):
    import jax
    import jax.numpy as jnp
    from webaudio_tpu.graph import compiler as C

    probe = jax.jit(lambda o: jnp.max(jnp.abs(o)))
    cg = C.compile_graph(dict(ctx._nodes), list(ctx._edges), ctx.sample_rate,
                         ctx.length, ctx._destination.node_id)
    t0 = time.perf_counter()
    out, _ = C.render_compiled(cg, ctx._nodes, ctx.length)
    peak = suite._force(lambda: probe(out))
    compile_s = time.perf_counter() - t0
    assert np.isfinite(peak), "NaN render"
    walls = []
    for _ in range(trials):
        t0 = time.perf_counter()
        for _ in range(depth):
            out, _ = C.render_compiled(cg, ctx._nodes, ctx.length)
        suite._force(lambda: probe(out))
        walls.append((time.perf_counter() - t0) / depth)
    walls.sort()
    wall = walls[1]
    return seconds / wall, compile_s, wall, [w * 1e3 for w in walls]


def section_mastering():
    """Stage-by-stage ablation of the mastering chain, post-pallas3.

    The r4 session-4 profile predates the fused curve kernel; this
    isolates the CURRENT residual: compressor vs 4x shaper vs analyser
    vs the bare source, all at 25-deep."""
    import webaudio_tpu as wa

    fs, seconds = 48000.0, 10.0

    def base_ctx():
        ctx = wa.OfflineAudioContext(2, int(fs * seconds), fs)
        buf = ctx.decode_audio_data_sync(
            os.path.join(suite.SAMPLES, "sample.wav"))
        src = ctx.create_buffer_source(loop=True)
        src.buffer = buf
        src.start()
        return ctx, src

    def run(variant, build):
        ctx, src = base_ctx()
        tail = build(ctx, src)
        tail.connect(ctx.destination)
        rtf, cs, wall, walls = _time_graph(ctx, seconds)
        _emit(section="mastering", variant=variant, rtf=rtf,
              wall_ms=wall * 1e3, walls_ms=walls, compile_s=cs)
        return wall

    def full(ctx, src):
        shaper = ctx.create_wave_shaper(oversample="4x")
        shaper.set_curve(np.tanh(np.linspace(-2, 2, 2048)).astype(np.float32))
        comp = ctx.create_dynamics_compressor(threshold=-18.0, ratio=4.0)
        anal = ctx.create_analyser(fft_size=2048)
        src.connect(shaper)
        shaper.connect(comp)
        comp.connect(anal)
        return anal

    def bare(ctx, src):
        return src

    def shaper_only(factor):
        def build(ctx, src):
            shaper = ctx.create_wave_shaper(oversample=factor)
            shaper.set_curve(
                np.tanh(np.linspace(-2, 2, 2048)).astype(np.float32))
            src.connect(shaper)
            return shaper
        return build

    def comp_only(ctx, src):
        comp = ctx.create_dynamics_compressor(threshold=-18.0, ratio=4.0)
        src.connect(comp)
        return comp

    def anal_only(ctx, src):
        anal = ctx.create_analyser(fft_size=2048)
        src.connect(anal)
        return anal

    run("full", full)
    run("bare_src", bare)
    run("shaper4x_only", shaper_only("4x"))
    run("shaper2x_only", shaper_only("2x"))
    run("shaper1x_only", shaper_only("none"))
    run("comp_only", comp_only)
    run("anal_only", anal_only)

    # micro-ablations (measurement-only env flags, WRONG output):
    # isolate the analyser ring capture and the detector's fixed-point
    # iteration latency inside the full chain
    for variant, env in (
            ("full_no_ring", {"WEBAUDIO_ABLATE_ANALYSER_RING": "1"}),
            ("full_det2", {"WEBAUDIO_DETECTOR_MAX_ITERS": "2"}),
            ("full_no_ring_det2", {"WEBAUDIO_ABLATE_ANALYSER_RING": "1",
                                   "WEBAUDIO_DETECTOR_MAX_ITERS": "2"}),
            ("anal_only_no_ring", {"WEBAUDIO_ABLATE_ANALYSER_RING": "1"})):
        saved = {}
        for k, v in env.items():
            saved[k] = os.environ.get(k)
            os.environ[k] = v
        try:
            build = anal_only if variant.startswith("anal") else full
            run(variant, build)
        finally:
            for k, v in saved.items():
                if v is None:
                    os.environ.pop(k, None)
                else:
                    os.environ[k] = v


def section_granular():
    """Grain-read formulation A/B at both densities: grouped_t (default),
    grouped_pl (Pallas packed select), g=8 narrow rows (43% less select
    traffic, 2x descriptors)."""
    # read-formulation A/Bs settled: grouped_t stays the default
    # (s2: grouped_pl 751/518 vs 1389 at 400 grains, group8 1290;
    # s3: grouped_dot 919/508 vs 1873/1029 — the batched tiny dots and
    # the Pallas packed select both lose to the fused XLA select)
    variants = [("grouped_t", {})]
    for n in (400, 800):
        for name, env in variants:
            saved = {}
            for k, v in env.items():
                saved[k] = os.environ.get(k)
                os.environ[k] = v
            try:
                ctx, seconds = suite.case_granular_grains(n)
                rtf, cs, wall, walls = _time_graph(ctx, seconds)
                _emit(section="granular", grains=n, variant=name, rtf=rtf,
                      wall_ms=wall * 1e3, walls_ms=walls, compile_s=cs)
            except Exception as exc:
                _emit(section="granular", grains=n, variant=name,
                      error=f"{type(exc).__name__}: {exc}"[:300])
            finally:
                for k, v in saved.items():
                    if v is None:
                        os.environ.pop(k, None)
                    else:
                        os.environ[k] = v


def section_reverb():
    """Isolate the convolution-reverb residual: the acyclic part alone
    (convolver, no feedback branch), the cycle alone (delay+gain, no
    convolver), and the full graph under each cycle-compilation mode."""
    import webaudio_tpu as wa

    fs, seconds = 44100.0, 10.0

    def build(with_verb=True, with_cycle=True):
        ctx = wa.OfflineAudioContext(2, int(fs * seconds), fs)
        dry = ctx.decode_audio_data_sync(
            os.path.join(suite.SAMPLES, "sample.wav"))
        src = ctx.create_buffer_source(loop=True)
        src.buffer = dry
        src.start()
        if with_verb:
            ir = ctx.decode_audio_data_sync(
                os.path.join(suite.SAMPLES, "parking-garage-response.wav"))
            verb = ctx.create_convolver()
            verb.set_buffer(ir)
            src.connect(verb)
            verb.connect(ctx.destination)
        if with_cycle:
            d = ctx.create_delay(max_delay_time=1.0)
            d.delay_time.value = 0.31
            fb = ctx.create_gain(gain=0.4)
            src.connect(d)
            d.connect(fb)
            fb.connect(d)
            fb.connect(ctx.destination)
        return ctx

    for variant, env, kw in (
            ("full", {}, {}),
            ("acyclic_only", {}, {"with_cycle": False}),
            ("cycle_only", {}, {"with_verb": False}),
            ("full_flat", {"WEBAUDIO_TWO_RATE": "0"}, {}),
            ("full_legacy_inner", {"WEBAUDIO_INNER_FAST": "0"}, {})):
        saved = {}
        for k, v in env.items():
            saved[k] = os.environ.get(k)
            os.environ[k] = v
        try:
            ctx = build(**kw)
            rtf, cs, wall, walls = _time_graph(ctx, seconds)
            _emit(section="reverb", variant=variant, rtf=rtf,
                  wall_ms=wall * 1e3, walls_ms=walls, compile_s=cs)
        except Exception as exc:
            _emit(section="reverb", variant=variant,
                  error=f"{type(exc).__name__}: {exc}"[:300])
        finally:
            for k, v in saved.items():
                if v is None:
                    os.environ.pop(k, None)
                else:
                    os.environ[k] = v


def section_convfft():
    """Price the reverb convolver's parts on-chip: the batched 32k rfft,
    the K-term MAC, the irfft, the full FDL block, and the one-shot
    whole-render FFT alternative (valid when nb == 1)."""
    import jax
    import jax.numpy as jnp
    from webaudio_tpu.ops import fft_conv

    C, J, P, K = 2, 27, 16384, 10
    B = J * P
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((C, B)).astype(np.float32))
    ir = rng.standard_normal((C, 163170)).astype(np.float32) * 0.01
    H = jnp.asarray(fft_conv.partition_ir(ir, P))
    st = fft_conv.PartitionedConvState.init(C, K, P)

    segs = jnp.asarray(rng.standard_normal((C, J, 2 * P)).astype(np.float32))
    X = jnp.fft.rfft(segs, axis=-1).astype(jnp.complex64)
    Xfull = jnp.concatenate([st["spectra"], X], axis=1)

    def mac(Xf, Hb):
        Y = None
        for k in range(K):
            term = Hb[:, k, None, :] * Xf[:, K - 1 - k: K - 1 - k + J, :]
            Y = term if Y is None else Y + term
        return Y

    fns = {
        "rfft_27x32k": (jax.jit(lambda s: jnp.fft.rfft(s, axis=-1)), (segs,)),
        "mac_K10": (jax.jit(mac), (Xfull, H)),
        "irfft_27x32k": (jax.jit(
            lambda Y: jnp.fft.irfft(Y, n=2 * P, axis=-1)), (mac(Xfull, H),)),
        "fdl_block": (jax.jit(
            lambda s, xx: fft_conv.partitioned_conv_block(s, xx, H, P)),
            (st, x)),
        "oneshot_1M": (jax.jit(
            lambda xx: jnp.fft.irfft(
                jnp.fft.rfft(xx, n=1 << 20, axis=-1)
                * jnp.fft.rfft(jnp.asarray(ir), n=1 << 20, axis=-1),
                n=1 << 20, axis=-1)[:, :B]), (x,)),
    }
    for name, (fn, args) in fns.items():
        try:
            out = fn(*args)
            leaf = jax.tree_util.tree_leaves(out)[0]
            suite._force(lambda: jnp.max(jnp.abs(
                leaf.real if jnp.iscomplexobj(leaf) else leaf)))
            walls = []
            for _ in range(3):
                t0 = time.perf_counter()
                for _ in range(25):
                    out = fn(*args)
                leaf = jax.tree_util.tree_leaves(out)[0]
                suite._force(lambda: jnp.max(jnp.abs(
                    leaf.real if jnp.iscomplexobj(leaf) else leaf)))
                walls.append((time.perf_counter() - t0) / 25)
            walls.sort()
            _emit(section="convfft", variant=name,
                  wall_ms=walls[1] * 1e3,
                  walls_ms=[w * 1e3 for w in walls])
        except Exception as exc:
            _emit(section="convfft", variant=name,
                  error=f"{type(exc).__name__}: {exc}"[:300])


SECTIONS = {"mastering": section_mastering, "granular": section_granular,
            "reverb": section_reverb, "convfft": section_convfft}


def main():
    import jax
    import jax.numpy as jnp

    t0 = time.perf_counter()
    float(jax.jit(lambda a: (jnp.sin(a) * a).sum())(
        jnp.arange(128, dtype=jnp.float32)))
    _emit(stage="warmup", cold_start_s=round(time.perf_counter() - t0, 1))
    for name in (sys.argv[1:] or list(SECTIONS)):
        SECTIONS[name]()


if __name__ == "__main__":
    main()
