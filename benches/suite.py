"""Benchmark suite: the five BASELINE.json configs + padenot-style workloads.

reference: benches/my_benchmark.rs (offline render benches) and
examples/benchmarks.rs (speedup-vs-realtime harness).  Each case builds a
graph through the public API, compiles once, and measures steady-state
realtime factor (audio seconds per wall second per chip).  Run on the TPU:

    python benches/suite.py [case ...]

Prints one JSON line per case.  For clean numbers run cases in separate
processes (tunnel dispatch state drifts over a long process, ~2x
run-to-run variance; large host->device uploads can also hit the
backend's flaky transfer path — see CLAUDE.md).
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SAMPLES = "/root/reference/samples"


# nominal single-chip peaks for the roofline fractions (TPU v5e / v5 lite:
# ~819 GB/s HBM, ~197 TFLOP/s bf16 MXU — audio DSP is f32/VPU-heavy, so
# `mfu` is expected to be tiny and `bw_frac` is the meaningful number)
_PEAKS = {"tpu": (819e9, 197e12), "axon": (819e9, 197e12)}


def _cost_analysis(cg, length):
    """XLA's own (flops, bytes-accessed) estimate of the compiled render."""
    from webaudio_tpu.graph import compiler as C

    try:
        comp = cg.jit_scan.lower(*C.render_args(cg, length)).compile()
        ca = comp.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0] if ca else {}
        return float(ca.get("flops", 0.0)), \
            float(ca.get("bytes accessed", 0.0))
    except Exception:
        return 0.0, 0.0


def _roofline_fields(flops, nbytes, wall):
    import jax

    fields = {}
    if wall > 0 and (flops or nbytes):
        fields["gflops_per_s"] = round(flops / wall / 1e9, 2)
        fields["gbytes_per_s"] = round(nbytes / wall / 1e9, 2)
        platform = jax.devices()[0].platform
        peaks = _PEAKS.get(platform)
        if peaks:
            peak_bw, peak_flops = peaks
            fields["bw_frac"] = round(nbytes / wall / peak_bw, 4)
            fields["mfu"] = round(flops / wall / peak_flops, 6)
    return fields


def _force(make_scalar, retries=8):
    """Force completion of all device work enqueued so far.

    On the tunneled axon backend `block_until_ready()` returns at ENQUEUE
    time, not completion — timing with it measures dispatch latency, not
    compute.  A dependent scalar readback is the only reliable fence: the
    device executes dispatches in order, so reading back a scalar that
    depends on the last render forces everything before it.  Readbacks can
    fail UNIMPLEMENTED while the transfer path warms up and the failure is
    sticky on that array, so every retry re-dispatches a fresh probe (pass
    a thunk)."""
    for attempt in range(retries):
        try:
            return float(make_scalar())
        except Exception:
            if attempt == retries - 1:
                raise
            time.sleep(min(2.0 * (attempt + 1), 15.0))


def _measure(ctx, seconds, runs=5):
    import jax
    import jax.numpy as jnp
    from webaudio_tpu.graph import compiler as C

    probe = jax.jit(lambda o: jnp.max(jnp.abs(o)))
    cg = C.compile_graph(dict(ctx._nodes), list(ctx._edges), ctx.sample_rate,
                         ctx.length, ctx._destination.node_id)
    t0 = time.perf_counter()
    out, _ = C.render_compiled(cg, ctx._nodes, ctx.length)
    peak = _force(lambda: probe(out))
    compile_s = time.perf_counter() - t0
    assert np.isfinite(peak) and peak > 0.0, f"invalid render (peak={peak})"
    # throughput: >=3 independent fenced trials (tunnel dispatch-state
    # drift is ~±20-50% run-to-run; the artifact carries the spread);
    # within a trial, pipeline `runs` renders and fence once at the end
    # (the device stream is in-order, so the final probe bounds them all)
    factors = []
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(runs):
            out, _ = C.render_compiled(cg, ctx._nodes, ctx.length)
        _force(lambda: probe(out))
        factors.append(seconds / ((time.perf_counter() - t0) / runs))
    factors.sort()
    wall = seconds / factors[len(factors) // 2]
    flops, nbytes = _cost_analysis(cg, ctx.length)
    fields = _roofline_fields(flops, nbytes, wall)
    fields["runs"] = [round(f, 1) for f in factors]
    fields["spread_pct"] = round(
        100.0 * (factors[-1] - factors[0]) / factors[len(factors) // 2], 1)
    # steady-state throughput: same protocol with a 25-deep pipeline.
    # The end-of-trial fence costs one tunnel readback RTT (~tens of ms)
    # regardless of depth; at depth 5 that fixed cost is ~1/5 of every
    # case's wall (the ~8 ms/render floor trivial graphs measure).  A
    # serving deployment keeps the queue full, so the deeper pipeline is
    # the honest throughput number; `value` (depth 5) is kept for
    # round-over-round comparability.
    ss = []
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(25):
            out, _ = C.render_compiled(cg, ctx._nodes, ctx.length)
        _force(lambda: probe(out))
        ss.append(seconds / ((time.perf_counter() - t0) / 25))
    ss.sort()
    fields["value_ss25"] = round(ss[len(ss) // 2], 1)   # median, not max
    fields["ss25_runs"] = [round(f, 1) for f in ss]
    return factors[len(factors) // 2], compile_s, fields


def case_buffer_biquad():
    """Config 1: sample.wav -> biquad lowpass -> destination, 10 s."""
    import webaudio_tpu as wa

    fs, seconds = 48000.0, 10.0
    ctx = wa.OfflineAudioContext(2, int(fs * seconds), fs)
    buf = ctx.decode_audio_data_sync(os.path.join(SAMPLES, "sample.wav"))
    src = ctx.create_buffer_source(loop=True)
    src.buffer = buf
    src.start()
    f = ctx.create_biquad_filter(type="lowpass", frequency=2000.0, q=2.0)
    src.connect(f)
    f.connect(ctx.destination)
    return ctx, seconds


def case_many_oscillators(n_osc=500):
    """Config 2: 500 detuned oscillators + ADSR gain envelopes."""
    import webaudio_tpu as wa

    fs, seconds = 48000.0, 10.0
    ctx = wa.OfflineAudioContext(2, int(fs * seconds), fs)
    rng = np.random.RandomState(42)
    mix = ctx.create_gain(gain=1.0 / n_osc)
    mix.connect(ctx.destination)
    for i in range(n_osc):
        o = ctx.create_oscillator(
            frequency=float(80 + rng.rand() * 2000),
            detune=float(rng.randn() * 15))
        env = ctx.create_gain(gain=0.0)
        t0 = float(rng.rand() * 2.0)
        env.gain.set_value_at_time(0.0, t0)
        env.gain.linear_ramp_to_value_at_time(1.0, t0 + 0.05)       # attack
        env.gain.set_target_at_time(0.6, t0 + 0.05, 0.1)            # decay
        env.gain.set_target_at_time(0.0, t0 + 4.0, 0.3)             # release
        o.connect(env)
        env.connect(mix)
        o.start(t0)
    return ctx, seconds


def case_many_oscillators_fused(n_osc=500):
    """Config 2, TPU-first formulation: one fused voice-bank kernel
    (SURVEY.md §2.2: '500 oscillators = one vmapped voice tensor')."""
    import webaudio_tpu as wa

    fs, seconds = 48000.0, 10.0
    ctx = wa.OfflineAudioContext(2, int(fs * seconds), fs)
    rng = np.random.RandomState(42)
    bank = ctx.create_oscillator_bank(
        frequencies=80 + rng.rand(n_osc) * 2000,
        starts=rng.rand(n_osc) * 2.0,
        stops=rng.rand(n_osc) * 2.0 + 6.0,
        attacks=0.05, decays=0.1, sustains=0.6, releases=0.3,
        volumes=1.0 / n_osc, stereo=True,
        pans=rng.rand(n_osc) * 2 - 1)
    bank.connect(ctx.destination)
    return ctx, seconds


def case_convolution_reverb():
    """Config 3: convolution reverb (parking-garage IR) + feedback delay."""
    import webaudio_tpu as wa

    fs, seconds = 44100.0, 10.0
    ctx = wa.OfflineAudioContext(2, int(fs * seconds), fs)
    dry = ctx.decode_audio_data_sync(os.path.join(SAMPLES, "sample.wav"))
    ir = ctx.decode_audio_data_sync(
        os.path.join(SAMPLES, "parking-garage-response.wav"))
    src = ctx.create_buffer_source(loop=True)
    src.buffer = dry
    src.start()
    verb = ctx.create_convolver()
    verb.set_buffer(ir)
    src.connect(verb)
    verb.connect(ctx.destination)
    # feedback delay network on the dry path
    d = ctx.create_delay(max_delay_time=1.0)
    d.delay_time.value = 0.31
    fb = ctx.create_gain(gain=0.4)
    src.connect(d)
    d.connect(fb)
    fb.connect(d)
    fb.connect(ctx.destination)
    return ctx, seconds


def case_hrtf_moving():
    """Config 4: HRTF panner with a moving listener (a-rate automation)."""
    import webaudio_tpu as wa

    fs, seconds = 44100.0, 10.0
    ctx = wa.OfflineAudioContext(2, int(fs * seconds), fs)
    osc = ctx.create_oscillator(type="sawtooth", frequency=220.0)
    p = ctx.create_panner(panning_model="HRTF", position_z=-2.0)
    for t in np.linspace(0, seconds, 64):
        ang = 2 * np.pi * t / seconds
        ctx.listener.position_x.linear_ramp_to_value_at_time(
            float(np.sin(ang) * 3), float(t))
        ctx.listener.position_z.linear_ramp_to_value_at_time(
            float(np.cos(ang) * 3), float(t))
    osc.connect(p)
    p.connect(ctx.destination)
    osc.start()
    return ctx, seconds


def case_mastering_chain():
    """Config 5a: waveshaper (4x oversample) -> compressor -> analyser."""
    import webaudio_tpu as wa

    fs, seconds = 48000.0, 10.0
    ctx = wa.OfflineAudioContext(2, int(fs * seconds), fs)
    buf = ctx.decode_audio_data_sync(os.path.join(SAMPLES, "sample.wav"))
    src = ctx.create_buffer_source(loop=True)
    src.buffer = buf
    src.start()
    shaper = ctx.create_wave_shaper(oversample="4x")
    shaper.set_curve(np.tanh(np.linspace(-2, 2, 2048)).astype(np.float32))
    comp = ctx.create_dynamics_compressor(threshold=-18.0, ratio=4.0)
    anal = ctx.create_analyser(fft_size=2048)
    src.connect(shaper)
    shaper.connect(comp)
    comp.connect(anal)
    anal.connect(ctx.destination)
    return ctx, seconds


def _batched_cost(gb):
    """XLA (flops, bytes-accessed) for one batched render dispatch."""
    try:
        if gb._fn is None:
            gb._build_fn()
        comp = gb._fn.lower(*gb._stage()).compile()
        ca = comp.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0] if ca else {}
        return float(ca.get("flops", 0.0)), \
            float(ca.get("bytes accessed", 0.0))
    except Exception:
        return 0.0, 0.0


def _build_batched_ctx(batch, seconds=2.0):
    """The shared batched workload: looping sample -> biquad sweep, one
    dense per-instance frequency automation tensor per lane."""
    import webaudio_tpu as wa
    from webaudio_tpu.parallel.batch import GraphBatch

    fs = 48000.0
    ctx = wa.OfflineAudioContext(2, int(fs * seconds), fs)
    buf = ctx.decode_audio_data_sync(os.path.join(SAMPLES, "sample.wav"))
    src = ctx.create_buffer_source(loop=True)
    src.buffer = buf
    src.start()
    f = ctx.create_biquad_filter(type="lowpass", q=3.0)
    f.frequency.set_value_at_time(200.0, 0.0)
    f.frequency.exponential_ramp_to_value_at_time(8000.0, seconds)
    src.connect(f)
    f.connect(ctx.destination)

    gb = GraphBatch(ctx, batch=batch)
    sweeps = np.linspace(0.5, 2.0, batch, dtype=np.float32)
    base = np.geomspace(200.0, 8000.0, ctx.length, dtype=np.float32)
    gb.override_param(f, "frequency", sweeps[:, None] * base[None, :])
    return gb, seconds


def case_canary_batched(batch=256):
    """Session-health canary: the batched_graphs on-chip loop, nothing
    else (no e2e readback phases).  The batched throughput is the
    committed record's sharpest health discriminator (r4: 9,087-11,240x
    healthy s4-s6 vs 3,930x in the degraded final_s8) — run this FIRST
    and LAST in a session so aggregation can exclude sick sessions."""
    import jax
    import jax.numpy as jnp

    gb, seconds = _build_batched_ctx(batch)
    probe = jax.jit(lambda o: jnp.max(jnp.abs(o)))
    out = gb.render()
    peak = _force(lambda: probe(out))
    assert np.isfinite(peak) and peak > 0.0
    vals = []
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(10):
            out = gb.render()
        _force(lambda: probe(out))
        vals.append(batch * seconds / ((time.perf_counter() - t0) / 10))
    vals.sort()
    return vals[1], vals


def case_batched_graphs(batch=256):
    """Config 5b: batched independent graphs (vmapped filter sweeps)."""
    gb, seconds = _build_batched_ctx(batch)

    import jax
    import jax.numpy as jnp

    probe = jax.jit(lambda o: jnp.max(jnp.abs(o)))
    out = gb.render()
    _force(lambda: probe(out))  # compile + run + fence
    # warm the device->host path for this shape: the tunneled axon backend
    # pays a one-time per-shape transfer setup and its FIRST attempts can
    # fail UNIMPLEMENTED while the path warms up
    warmed = False
    for attempt in range(6):
        try:
            np.asarray(out)
            warmed = True
            break
        except Exception as exc:
            print(f"# f32 readback warm-up attempt {attempt}: "
                  f"{type(exc).__name__}: {exc}", file=sys.stderr)
            time.sleep(min(5.0 * (attempt + 1), 30.0))
    runs = 3
    # on-chip throughput: 10-deep pipeline — the end-of-trial fence costs
    # a fixed ~29 ms tunnel readback RTT (dispatch_floor probe), which at
    # depth 3 would be ~18% of a 256-graph render's wall
    runs_chip = 10
    t0 = time.perf_counter()
    for _ in range(runs_chip):
        out = gb.render()
    _force(lambda: probe(out))
    wall = (time.perf_counter() - t0) / runs_chip
    # roofline for the flagship scale number (VERDICT r4 weak #8): XLA's
    # own cost model for ONE batched dispatch against the chip's nominal
    # peaks — states where the batch sits vs the HBM roof
    flops, nbytes = _batched_cost(gb)
    roof = _roofline_fields(flops, nbytes, wall)
    if nbytes:
        # bandwidth-roof throughput: instances*audio-seconds per wall
        # second if the case were exactly HBM-bound at the nominal peak
        import jax as _jax

        peaks = _PEAKS.get(_jax.devices()[0].platform)
        if peaks:
            roof["bw_roof_batched_rtf"] = round(
                batch * seconds * peaks[0] / nbytes, 1)
    if not warmed:
        return {"value": batch * seconds / wall,
                "graphs_per_second": batch / wall, **roof}
    # end-to-end: render + full host readback of the (batch, 2, n) block
    t0 = time.perf_counter()
    for _ in range(runs):
        host = np.asarray(gb.render())
    wall_e2e = (time.perf_counter() - t0) / runs
    assert np.isfinite(host).all() and np.abs(host).max() > 0.0
    # end-to-end with on-device dithered int16 quantization (halves
    # readback bytes; the Pallas dither kernel, GraphBatch.render_i16)
    wall_i16 = None
    # the int16 shape pays its own one-time transfer setup; retry like
    # the f32 warm-up above
    for attempt in range(6):
        try:
            hosti = np.asarray(gb.render_i16())
            assert hosti.dtype == np.int16 and np.abs(hosti).max() > 0
            t0 = time.perf_counter()
            for _ in range(runs):
                hosti = np.asarray(gb.render_i16())
            wall_i16 = (time.perf_counter() - t0) / runs
            break
        except Exception as exc:
            # log so a real regression in the int16 bounce path (shape
            # error, Pallas failure) is distinguishable from transient
            # transfer-setup flakiness on the tunneled backend
            print(f"# render_i16 attempt {attempt}: "
                  f"{type(exc).__name__}: {exc}", file=sys.stderr)
            time.sleep(min(5.0 * (attempt + 1), 30.0))
    results = {
        "value": batch * seconds / wall,
        "graphs_per_second": batch / wall,
        **roof,
        "value_end_to_end": batch * seconds / wall_e2e,
        "value_end_to_end_i16":
            None if wall_i16 is None else batch * seconds / wall_i16,
    }
    # double-buffered serving (render k+1 dispatched before fetching k:
    # transfer hides under the next batch's compute) at i16 and u-law u8
    # bounce depths
    for fetch in ("i16", "u8"):
        key = f"value_end_to_end_{fetch}_pipelined"
        results[key] = None
        try:
            for _ in gb.render_stream(2, fetch=fetch):
                pass  # warm the bounce + transfer path for this dtype
            cnt = 6
            t0 = time.perf_counter()
            for host in gb.render_stream(cnt, fetch=fetch):
                assert np.abs(host).max() > 0
            wallp = (time.perf_counter() - t0) / cnt
            results[key] = batch * seconds / wallp
        except Exception as exc:
            print(f"# render_stream({fetch}) failed: "
                  f"{type(exc).__name__}: {exc}", file=sys.stderr)
    return results


def case_stereo_pan_automation():
    """padenot suite: stereo panning with a-rate automation
    (reference: examples/benchmarks.rs stereo panning cases)."""
    import webaudio_tpu as wa

    fs, seconds = 48000.0, 10.0
    ctx = wa.OfflineAudioContext(2, int(fs * seconds), fs)
    buf = ctx.decode_audio_data_sync(os.path.join(SAMPLES, "sample.wav"))
    src = ctx.create_buffer_source(loop=True)
    src.buffer = buf
    src.start()
    pan = ctx.create_stereo_panner()
    for t in np.linspace(0, seconds, 100):
        pan.pan.linear_ramp_to_value_at_time(
            float(np.sin(2 * np.pi * t)), float(t))
    src.connect(pan)
    pan.connect(ctx.destination)
    return ctx, seconds


def case_iir_chain():
    """padenot suite: IIR filtering (reference: examples/benchmarks.rs
    iir_filter case) — order-4 filter on sampled audio."""
    import webaudio_tpu as wa

    fs, seconds = 48000.0, 10.0
    ctx = wa.OfflineAudioContext(2, int(fs * seconds), fs)
    buf = ctx.decode_audio_data_sync(os.path.join(SAMPLES, "sample.wav"))
    src = ctx.create_buffer_source(loop=True)
    src.buffer = buf
    src.start()
    from scipy.signal import butter

    b, a = butter(4, 0.2)
    f = ctx.create_iir_filter(feedforward=b, feedback=a)
    src.connect(f)
    f.connect(ctx.destination)
    return ctx, seconds


def case_delay_network():
    """padenot suite: feedback delay (reference: examples/benchmarks.rs
    delay case) — forces one-quantum scan steps (cycle)."""
    import webaudio_tpu as wa

    fs, seconds = 48000.0, 10.0
    ctx = wa.OfflineAudioContext(2, int(fs * seconds), fs)
    buf = ctx.decode_audio_data_sync(os.path.join(SAMPLES, "sample.wav"))
    src = ctx.create_buffer_source(loop=True)
    src.buffer = buf
    src.start()
    d = ctx.create_delay(max_delay_time=1.0)
    d.delay_time.value = 0.35
    fb = ctx.create_gain(gain=0.5)
    src.connect(ctx.destination)
    src.connect(d)
    d.connect(fb)
    fb.connect(d)
    fb.connect(ctx.destination)
    return ctx, seconds


def case_granular_grains(n_grains=400):
    """Granular synthesis: 400 enveloped grains of one sample, auto-fused
    into a single (V, B) grain-bank kernel (reference: examples/granular.rs
    pattern at production density)."""
    import webaudio_tpu as wa

    fs, seconds = 44100.0, 10.0
    ctx = wa.OfflineAudioContext(2, int(fs * seconds), fs)
    sample_path = "/root/reference/samples/sample.wav"
    if os.path.exists(sample_path):
        sample = ctx.decode_audio_data_sync(sample_path)
    else:
        sample = wa.AudioBuffer.from_array(
            np.sin(np.arange(2 * 44100) * 0.05, dtype=np.float32)[None]
            .repeat(2, 0), fs)
    rng = np.random.RandomState(1)
    for i in range(n_grains):
        when = i * (seconds - 0.2) / n_grains
        offset = 0.3 + 2.0 * (i / n_grains) + rng.rand() * 0.05
        src = ctx.create_buffer_source(
            playback_rate=float(0.9 + 0.2 * rng.rand()))
        src.buffer = sample
        env = ctx.create_gain(gain=0.0)
        env.gain.set_value_at_time(0.0, when)
        env.gain.linear_ramp_to_value_at_time(0.4, when + 0.045)
        env.gain.linear_ramp_to_value_at_time(0.0, when + 0.09)
        src.connect(env)
        env.connect(ctx.destination)
        src.start(when, float(offset), 0.09)
    return ctx, seconds


def case_mixed_corpus(per=32, seconds=2.0):
    """Heterogeneous corpus: three topologies x `per` instances rendered in
    ONE MixedGraphBatch call (bucketed compile cache, SURVEY §7 item 8).
    Per-instance variation is dense automation, so each topology is one
    bucket/one compile."""
    import webaudio_tpu as wa
    from webaudio_tpu.parallel.batch import MixedGraphBatch

    fs = 48000.0
    n = int(fs * seconds)
    sample = None

    def topo_filter(i):
        nonlocal sample
        ctx = wa.OfflineAudioContext(2, n, fs)
        if sample is None:
            sample = ctx.decode_audio_data_sync(
                os.path.join(SAMPLES, "sample.wav"))
        src = ctx.create_buffer_source(loop=True)
        src.buffer = sample
        src.start()
        f = ctx.create_biquad_filter(type="lowpass", q=3.0)
        f.frequency.set_value_at_time(200.0, 0.0)
        f.frequency.exponential_ramp_to_value_at_time(
            1000.0 + 250.0 * i, seconds)
        src.connect(f)
        f.connect(ctx.destination)
        return ctx

    def topo_synth(i):
        ctx = wa.OfflineAudioContext(2, n, fs)
        o = ctx.create_oscillator(type="sawtooth", frequency=110.0)
        o.frequency.linear_ramp_to_value_at_time(
            110.0 + 10.0 * i, seconds)  # dense per-instance pitch ramp
        env = ctx.create_gain(gain=0.0)
        env.gain.linear_ramp_to_value_at_time(1.0, 0.02 + 0.001 * i)
        env.gain.set_target_at_time(0.0, 0.5, 0.2)
        o.connect(env)
        env.connect(ctx.destination)
        o.start()
        return ctx

    def topo_pan(i):
        ctx = wa.OfflineAudioContext(2, n, fs)
        o = ctx.create_oscillator(frequency=440.0)
        o.frequency.linear_ramp_to_value_at_time(440.0 + i, seconds)
        p = ctx.create_stereo_panner()
        p.pan.set_value_at_time(-1.0, 0.0)
        p.pan.linear_ramp_to_value_at_time(1.0, seconds / (i + 1))
        o.connect(p)
        p.connect(ctx.destination)
        o.start()
        return ctx

    ctxs = [topo_filter(i) for i in range(per)] \
        + [topo_synth(i) for i in range(per)] \
        + [topo_pan(i) for i in range(per)]
    mb = MixedGraphBatch(ctxs)

    import jax
    import jax.numpy as jnp

    probe = jax.jit(lambda o: jnp.max(jnp.abs(o)))
    # warm: compile every bucket, gate validity
    outs = [gb.render() for _, gb in mb._buckets]
    for out in outs:
        peak = _force(lambda: probe(out))
        assert np.isfinite(peak) and peak > 0.0, "invalid bucket render"
    # 10-deep pipeline: the end-of-trial fence is a fixed ~29 ms tunnel
    # RTT (dispatch_floor probe); the in-order device stream lets one
    # probe bound all buckets of all runs
    runs = 10
    t0 = time.perf_counter()
    for _ in range(runs):
        outs = [gb.render() for _, gb in mb._buckets]
    _force(lambda: probe(outs[-1]))
    wall = (time.perf_counter() - t0) / runs
    total_audio = seconds * len(ctxs)
    costs = [_batched_cost(gb) for _, gb in mb._buckets]
    roof = _roofline_fields(sum(c[0] for c in costs),
                            sum(c[1] for c in costs), wall)
    return total_audio / wall, len(ctxs), mb.num_buckets, roof


CASES = {
    "buffer_biquad": case_buffer_biquad,
    "many_oscillators": case_many_oscillators,
    "many_oscillators_fused": case_many_oscillators_fused,
    "convolution_reverb": case_convolution_reverb,
    "hrtf_moving": case_hrtf_moving,
    "mastering_chain": case_mastering_chain,
    "stereo_pan_automation": case_stereo_pan_automation,
    "iir_chain": case_iir_chain,
    "delay_network": case_delay_network,
    "granular_grains": case_granular_grains,
    # VERDICT r3 done-criterion: 800-grain density >= 600x (the r3 code
    # scaled badly with density: ~430x at 800 grains)
    "granular_grains_800": lambda: case_granular_grains(800),
}


def case_script_processor_probe():
    """VERDICT r3 item 7: prove (or fence) jax.pure_callback on the real
    backend.  A tiny ScriptProcessorNode graph whose host callback doubles
    the signal; returns the realtime factor, or raises so the suite
    records the error path."""
    import webaudio_tpu as wa

    fs, seconds = 48000.0, 1.0
    ctx = wa.OfflineAudioContext(1, int(fs * seconds), fs)
    src = ctx.create_constant_source(offset=0.25)
    src.start()
    sp = ctx.create_script_processor(4096, 1, 1)

    def onaudioprocess(ev):
        ev.output_buffer[:] = ev.input_buffer * 2.0

    sp.set_onaudioprocess(onaudioprocess)
    src.connect(sp)
    sp.connect(ctx.destination)
    t0 = time.perf_counter()
    out = ctx.start_rendering_sync().get_channel_data(0)
    wall = time.perf_counter() - t0
    # exact two-buffer latency: the doubled signal appears after 2*4096
    tail = out[3 * 4096:]
    assert np.abs(tail - 0.5).max() < 1e-6, float(np.abs(tail).max())
    return seconds / wall


def main():
    names = sys.argv[1:] or list(CASES) + ["batched_graphs", "mixed_corpus"]
    tag = os.environ.get("WEBAUDIO_BENCH_TAG", "")
    for raw in names:
        name = raw
        try:
            if name == "script_processor_probe":
                rtf = case_script_processor_probe()
                print(json.dumps({
                    "case": name + tag, "metric": "script_processor_probe",
                    "ok": True, "value": round(rtf, 1),
                }), flush=True)
                continue
            if name == "canary_batched":
                val, vals = case_canary_batched()
                print(json.dumps({
                    "case": name + tag, "metric": "canary_batched_rtf",
                    "value": round(val, 1),
                    "runs": [round(v, 1) for v in vals],
                }), flush=True)
                continue
            if name == "batched_graphs_1024":
                res = case_batched_graphs(batch=1024)
                print(json.dumps({
                    "case": name + tag, "metric": "batched_realtime_factor",
                    "batch": 1024,
                    **{k: (None if v is None else
                           round(v, 1) if abs(v) >= 10 else v)
                       for k, v in res.items()},
                }), flush=True)
                continue
            if name == "mixed_corpus":
                rtf, n_graphs, n_buckets, roof = case_mixed_corpus()
                print(json.dumps({
                    "case": name + tag, "metric": "mixed_corpus_realtime_factor",
                    "value": round(rtf, 1), "graphs": n_graphs,
                    "buckets": n_buckets, **roof,
                }), flush=True)
                continue
            if name == "batched_graphs":
                res = case_batched_graphs()
                print(json.dumps({
                    "case": name + tag, "metric": "batched_realtime_factor",
                    **{k: (None if v is None else
                           round(v, 1) if abs(v) >= 10 else v)
                       for k, v in res.items()},
                }), flush=True)
                continue
            ctx, seconds = CASES[name]()
            rtf, compile_s, roofline = _measure(ctx, seconds)
            print(json.dumps({
                "case": name + tag, "metric": "offline_render_realtime_factor",
                "value": round(rtf, 1), "compile_seconds": round(compile_s, 1),
                **roofline,
            }), flush=True)
        except Exception as exc:
            print(json.dumps({"case": name + tag, "error": str(exc)[:200]}),
                  flush=True)


if __name__ == "__main__":
    main()
