"""Round-3 TPU profiling: locate the residual time in the sub-1000x cases.

Run alone on the TPU (single-client backend!):

    python benches/profile_r3.py [section ...]

Sections: cache, mastering, detector, gather, hrtf.
Prints one JSON line per measurement.  All timings use the dependent
scalar-readback fence (suite._force) — block_until_ready returns at
enqueue on the tunneled backend.
"""

import json
import os
import subprocess
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import suite  # noqa: E402  (reuses _force, cases, SAMPLES)


def _emit(**kw):
    print(json.dumps({k: (round(v, 4) if isinstance(v, float) else v)
                      for k, v in kw.items()}), flush=True)


def _time_graph(ctx, seconds, runs=5):
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
    t0 = time.perf_counter()
    for _ in range(runs):
        out, _ = C.render_compiled(cg, ctx._nodes, ctx.length)
    suite._force(lambda: probe(out))
    wall = (time.perf_counter() - t0) / runs
    return seconds / wall, compile_s, wall


def section_cache():
    """Persistent compile cache: does a second process compile warm?"""
    code = (
        "import time, json, sys\n"
        "sys.path.insert(0, '/root/repo')\n"
        "t_imp = time.perf_counter()\n"
        "import jax, jax.numpy as jnp\n"
        "import webaudio_tpu  # enables the persistent cache on axon\n"
        "x = jnp.arange(512 * 512, dtype=jnp.float32).reshape(512, 512)\n"
        "f = jax.jit(lambda a: (jnp.sin(a) @ a.T).sum() * 1.00000001)\n"
        "t0 = time.perf_counter()\n"
        "v = float(f(x))\n"
        "print(json.dumps({'compile_plus_run_s': time.perf_counter() - t0,\n"
        "                  'cache_dir': jax.config.jax_compilation_cache_dir}))\n"
    )
    for attempt in ("cold", "warm"):
        t0 = time.perf_counter()
        proc = subprocess.run([sys.executable, "-c", code],
                              capture_output=True, text=True, timeout=900)
        line = [ln for ln in proc.stdout.splitlines() if ln.startswith("{")]
        info = json.loads(line[-1]) if line else {"error": proc.stderr[-400:]}
        _emit(section="cache", attempt=attempt,
              wall_total_s=time.perf_counter() - t0, **info)


def section_mastering():
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

    # full chain (the committed case)
    ctx, seconds_ = suite.case_mastering_chain()
    rtf, cs, wall = _time_graph(ctx, seconds)
    _emit(section="mastering", variant="full", rtf=rtf, compile_s=cs,
          wall_ms=wall * 1e3)

    # ablations: drop one stage at a time
    ctx, src = base_ctx()
    shaper = ctx.create_wave_shaper(oversample="4x")
    shaper.set_curve(np.tanh(np.linspace(-2, 2, 2048)).astype(np.float32))
    anal = ctx.create_analyser(fft_size=2048)
    src.connect(shaper)
    shaper.connect(anal)
    anal.connect(ctx.destination)
    rtf, cs, wall = _time_graph(ctx, seconds)
    _emit(section="mastering", variant="no_compressor", rtf=rtf,
          compile_s=cs, wall_ms=wall * 1e3)

    ctx, src = base_ctx()
    comp = ctx.create_dynamics_compressor(threshold=-18.0, ratio=4.0)
    anal = ctx.create_analyser(fft_size=2048)
    src.connect(comp)
    comp.connect(anal)
    anal.connect(ctx.destination)
    rtf, cs, wall = _time_graph(ctx, seconds)
    _emit(section="mastering", variant="no_shaper", rtf=rtf, compile_s=cs,
          wall_ms=wall * 1e3)

    ctx, src = base_ctx()
    shaper = ctx.create_wave_shaper(oversample="2x")
    shaper.set_curve(np.tanh(np.linspace(-2, 2, 2048)).astype(np.float32))
    comp = ctx.create_dynamics_compressor(threshold=-18.0, ratio=4.0)
    anal = ctx.create_analyser(fft_size=2048)
    src.connect(shaper)
    shaper.connect(comp)
    comp.connect(anal)
    anal.connect(ctx.destination)
    rtf, cs, wall = _time_graph(ctx, seconds)
    _emit(section="mastering", variant="oversample_2x", rtf=rtf,
          compile_s=cs, wall_ms=wall * 1e3)


def section_detector():
    """Level-detector formulations at block size B."""
    import jax
    import jax.numpy as jnp
    from webaudio_tpu.nodes import dynamics_compressor as dc

    rng = np.random.default_rng(0)
    fs = 48000.0
    at = float(np.exp(-1.0 / (0.003 * fs)))
    rt = float(np.exp(-1.0 / (0.25 * fs)))
    probe = jax.jit(lambda o: jnp.max(jnp.abs(o)))
    for B in (16384, 131072):
        x = jnp.asarray(np.abs(rng.standard_normal(B)).astype(np.float32) * 10)
        atv = jnp.full((B,), at, jnp.float32)
        rtv = jnp.full((B,), rt, jnp.float32)
        y0 = jnp.zeros((), jnp.float32)
        for name, fn in (
            ("fixed_point", dc._detector_fixed_point),
            ("sequential", dc._detector_sequential),
        ):
            if name == "sequential" and B > 16384:
                continue  # minutes-slow; skip
            f = jax.jit(lambda y0, x, a, r, fn=fn: fn(y0, x, a, r))
            t0 = time.perf_counter()
            out = f(y0, x, atv, rtv)
            suite._force(lambda: probe(out))
            cs = time.perf_counter() - t0
            runs = 20
            t0 = time.perf_counter()
            for _ in range(runs):
                out = f(y0, x, atv, rtv)
            suite._force(lambda: probe(out))
            wall = (time.perf_counter() - t0) / runs
            _emit(section="detector", variant=name, B=B,
                  us_per_call=wall * 1e6, ns_per_sample=wall / B * 1e9,
                  compile_s=cs)


def section_gather():
    """Grain-read formulations: f32 pair rows vs int16 rows vs windowed
    two-hot matmul, at the granular bench's working set."""
    import jax
    import jax.numpy as jnp

    K, B, L, C = 6, 16384, 142187, 2
    rng = np.random.default_rng(1)
    data = rng.standard_normal((C, L)).astype(np.float32) * 0.3
    # playheads: each lane reads a linear span at rate ~1 from a random base
    bases = rng.integers(0, L - 20000, size=(K, 1))
    rates = rng.uniform(0.9, 1.1, size=(K, 1))
    pos = bases + rates * np.arange(B)[None, :]
    idx = np.floor(pos).astype(np.int32)
    frac = (pos - idx).astype(np.float32)
    idxj = jnp.asarray(idx)
    fracj = jnp.asarray(frac)
    probe = jax.jit(lambda o: jnp.max(jnp.abs(o)))

    from webaudio_tpu.ops.bufread import gather_pairs, pair_rows

    rows = jnp.asarray(pair_rows(data))                     # (L, 2C) f32

    def form_f32(idx, frac):
        a, b = gather_pairs(rows, idx)
        return a * (1 - frac)[None] + b * frac[None]

    # int16 pair rows (half the bytes per descriptor)
    scale = np.abs(data).max() / 32767.0
    rows16 = jnp.asarray(
        np.clip(np.round(pair_rows(data) / scale), -32768, 32767)
        .astype(np.int16))

    def form_i16(idx, frac):
        flat = rows16[idx.reshape(-1)].astype(jnp.float32) * scale
        g = flat.reshape(idx.shape + (2, C))
        g = jnp.moveaxis(g, (-2, -1), (0, 1))
        a, b = g[0], g[1]
        return a * (1 - frac)[None] + b * frac[None]

    # windowed two-hot: per (lane, quantum) gather one W-sample window row,
    # then select samples with a (Q, W) two-hot matmul on the MXU
    Q, W = 128, 256
    nq = B // Q
    datj = jnp.asarray(data)                                 # (C, L)
    padded = jnp.pad(datj, ((0, 0), (0, W + 2)))

    def form_window(idx, frac):
        i0 = idx.reshape(K, nq, Q)[:, :, 0]                  # (K, nq)
        # one descriptor per (lane, quantum): a (C, W) window
        starts = i0.reshape(-1)
        win = jax.vmap(
            lambda s: jax.lax.dynamic_slice(
                padded, (jnp.int32(0), s), (C, W))
        )(starts)                                            # (K*nq, C, W)
        loc = idx.reshape(K * nq, Q) - starts[:, None]       # in [0, W)
        fr = frac.reshape(K * nq, Q)
        lanes = jnp.arange(W, dtype=jnp.int32)[None, None, :]
        oh = (jnp.where(lanes == loc[:, :, None], (1 - fr)[:, :, None], 0.0)
              + jnp.where(lanes == loc[:, :, None] + 1, fr[:, :, None], 0.0))
        out = jax.lax.dot_general(
            oh, win, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)              # (K*nq, Q, C)
        return jnp.transpose(out, (2, 0, 1)).reshape(C, K, B)

    for name, fn in (("pair_rows_f32", form_f32),
                     ("pair_rows_i16", form_i16),
                     ("windowed_twohot", form_window)):
        f = jax.jit(fn)
        t0 = time.perf_counter()
        out = f(idxj, fracj)
        suite._force(lambda: probe(out))
        cs = time.perf_counter() - t0
        runs = 20
        t0 = time.perf_counter()
        for _ in range(runs):
            out = f(idxj, fracj)
        suite._force(lambda: probe(out))
        wall = (time.perf_counter() - t0) / runs
        _emit(section="gather", variant=name, K=K, B=B,
              us_per_call=wall * 1e6, ns_per_row=wall / (K * B) * 1e9,
              compile_s=cs)
    # exactness cross-check on device (f32 vs window)
    a = np.asarray(jax.jit(form_f32)(idxj, fracj))
    b = np.asarray(jax.jit(form_window)(idxj, fracj))
    _emit(section="gather", variant="window_vs_f32_maxdev",
          dev=float(np.abs(a - b).max()))


def section_hrtf():
    import webaudio_tpu as wa

    ctx, seconds = suite.case_hrtf_moving()
    rtf, cs, wall = _time_graph(ctx, seconds)
    _emit(section="hrtf", variant="full", rtf=rtf, compile_s=cs,
          wall_ms=wall * 1e3)

    # static listener: same graph without a-rate listener motion
    fs, seconds = 44100.0, 10.0
    ctx = wa.OfflineAudioContext(2, int(fs * seconds), fs)
    osc = ctx.create_oscillator(type="sawtooth", frequency=220.0)
    p = ctx.create_panner(panning_model="HRTF", position_z=-2.0)
    osc.connect(p)
    p.connect(ctx.destination)
    osc.start()
    rtf, cs, wall = _time_graph(ctx, seconds)
    _emit(section="hrtf", variant="static", rtf=rtf, compile_s=cs,
          wall_ms=wall * 1e3)

    # source only (what the graph costs without the panner)
    ctx = wa.OfflineAudioContext(2, int(fs * seconds), fs)
    osc = ctx.create_oscillator(type="sawtooth", frequency=220.0)
    osc.connect(ctx.destination)
    osc.start()
    rtf, cs, wall = _time_graph(ctx, seconds)
    _emit(section="hrtf", variant="osc_only", rtf=rtf, compile_s=cs,
          wall_ms=wall * 1e3)


SECTIONS = {
    "cache": section_cache,
    "mastering": section_mastering,
    "detector": section_detector,
    "gather": section_gather,
    "hrtf": section_hrtf,
}


def warmup():
    """Pay the per-process remote-compiler cold-start once, up front.

    Measured on this backend (PALLAS_AXON_REMOTE_COMPILE=1): the FIRST
    compile in a process takes 140-540 s regardless of program size or
    the persistent compilation cache (the cost is remote service spin-up,
    not compilation); every later compile in the same process is ~0.4 s.
    Run all cases in one process."""
    import jax
    import jax.numpy as jnp

    t0 = time.perf_counter()
    v = float(jax.jit(lambda a: (jnp.sin(a) * a).sum())(
        jnp.arange(128, dtype=jnp.float32)))
    _emit(section="warmup", cold_start_s=time.perf_counter() - t0)


def main():
    names = sys.argv[1:] or list(SECTIONS)
    warmup()
    for name in names:
        try:
            SECTIONS[name]()
        except Exception as exc:
            _emit(section=name, error=f"{type(exc).__name__}: {exc}"[:300])


if __name__ == "__main__":
    main()
