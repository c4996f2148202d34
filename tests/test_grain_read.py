"""ops/grain_read.py: the fused Pallas windowed-read kernel (interpret
mode on CPU) against the numpy oracle."""

import os

import numpy as np
import jax.numpy as jnp

from webaudio_tpu.ops.grain_read import (
    G, windowed_read_reference, windowed_read_tpu)


def test_windowed_read_kernel_interpret_matches_oracle():
    rng = np.random.default_rng(5)
    C, L, Qs, W = 2, 5000, 128, 192
    NB = 37  # exercises the G-padding path
    data = np.zeros((C, L + W + 2), np.float32)
    data[:, :L] = rng.standard_normal((C, L)).astype(np.float32)
    w0 = rng.integers(0, L - W, size=NB).astype(np.int32)
    loc = rng.integers(0, W - 2, size=(NB, Qs)).astype(np.int32)
    frac = rng.random((NB, Qs)).astype(np.float32)

    got = np.asarray(windowed_read_tpu(
        jnp.asarray(data), jnp.asarray(w0), jnp.asarray(loc),
        jnp.asarray(frac), Qs, W, interpret=True))
    ref = windowed_read_reference(data, w0, loc, frac)
    assert got.shape == ref.shape == (C, NB, Qs)
    np.testing.assert_allclose(got, ref, atol=2e-6)
    assert NB % G != 0  # padding actually exercised


def _bufsrc_render(mode, loop, rate=1.0, buf_rate=44100.0, offset=0.1,
                   stop=None, n=8192, fs=48000.0):
    import os

    from webaudio_tpu import OfflineAudioContext

    os.environ["WEBAUDIO_GRAIN_READ"] = mode
    try:
        ctx = OfflineAudioContext(2, n, fs)
        L = 9000
        buf = ctx.create_buffer(2, L, buf_rate)
        rng = np.random.default_rng(9)
        for c in range(2):
            buf.copy_to_channel(
                rng.standard_normal(L).astype(np.float32) * 0.5, c)
        src = ctx.create_buffer_source(loop=loop, playback_rate=rate)
        src.buffer = buf
        src.connect(ctx.destination)
        src.start(64.5 / fs, offset)
        if stop:
            src.stop(stop)
        from webaudio_tpu.graph import compiler as C

        cg = C.compile_graph(dict(ctx._nodes), list(ctx._edges),
                             ctx.sample_rate, ctx.length,
                             ctx._destination.node_id)
        kern = next(k for k in cg.kernels.values()
                    if type(k).__name__ == "_BufferSourceKernel")
        return ctx.start_rendering_sync().to_array(), kern.win_W
    finally:
        os.environ.pop("WEBAUDIO_GRAIN_READ", None)


def test_bufsrc_windowed_matches_gather():
    """Const-rate buffer source: the windowed read must match the pair
    gathers (whole-buffer loop incl. the wrap seam, non-loop incl. the
    end-of-buffer extrapolation, sub-sample start, early stop)."""
    for loop in (True, False):
        for rate in (1.0, 0.937, 1.21):
            g, wg = _bufsrc_render("gather", loop, rate)
            assert wg == 0
            assert np.abs(g).max() > 0.01
            for mode in ("window", "grouped"):
                w, ww = _bufsrc_render(mode, loop, rate)
                assert ww > 0, (mode, loop, rate)
                np.testing.assert_allclose(
                    w, g, atol=3e-6,
                    err_msg=f"{mode} loop={loop} rate={rate}")
    # early stop + offset deep into the buffer
    g, _ = _bufsrc_render("gather", True, 1.05, offset=0.15, stop=0.08)
    assert np.abs(g).max() > 0.01
    for mode in ("window", "grouped"):
        w, _ = _bufsrc_render(mode, True, 1.05, offset=0.15, stop=0.08)
        np.testing.assert_allclose(w, g, atol=3e-6, err_msg=mode)


def test_bufsrc_partial_loop_keeps_gather():
    """Partial loops (fractional loop length) are ineligible for the
    windowed read even when forced."""
    import os

    from webaudio_tpu import OfflineAudioContext

    os.environ["WEBAUDIO_GRAIN_READ"] = "window"
    try:
        fs = 48000.0
        ctx = OfflineAudioContext(1, 4096, fs)
        buf = ctx.create_buffer(1, 8000, fs)
        buf.copy_to_channel(np.sin(np.arange(8000) * 0.01).astype(np.float32), 0)
        src = ctx.create_buffer_source(loop=True)
        src.buffer = buf
        src.loop_start = 0.01
        src.loop_end = 0.05
        src.connect(ctx.destination)
        src.start()
        from webaudio_tpu.graph import compiler as C

        cg = C.compile_graph(dict(ctx._nodes), list(ctx._edges),
                             ctx.sample_rate, ctx.length,
                             ctx._destination.node_id)
        kern = next(k for k in cg.kernels.values()
                    if type(k).__name__ == "_BufferSourceKernel")
        assert kern.win_W == 0
    finally:
        os.environ.pop("WEBAUDIO_GRAIN_READ", None)


def test_bufsrc_windowed_reverse_loop():
    g, _ = _bufsrc_render("gather", True, -0.98, offset=0.1)
    assert np.abs(g).max() > 0.01
    for mode in ("window", "grouped"):
        w, _ = _bufsrc_render(mode, True, -0.98, offset=0.1)
        np.testing.assert_allclose(w, g, atol=3e-6, err_msg=mode)


def test_curve_kernel_interpret_matches_apply_curve():
    """ops/curve_kernel.py (interpret mode) vs the XLA apply_curve path."""
    import jax.numpy as jnp

    from webaudio_tpu.nodes.waveshaper import _SEG, apply_curve
    from webaudio_tpu.ops.curve_kernel import curve_lookup_tpu

    rng = np.random.default_rng(13)
    x = rng.uniform(-1.3, 1.3, size=3000).astype(np.float32)
    for n in (3, 257, 2049):
        grid = np.linspace(-1, 1, n)
        curve = np.tanh(2.5 * grid).astype(np.float32)
        ref = np.asarray(apply_curve(jnp.asarray(curve), jnp.asarray(x)))
        # rebuild the segment table exactly as apply_curve does
        nseg = -(-n // _SEG)
        npad = nseg * _SEG
        cpad = np.concatenate([curve, np.broadcast_to(curve[-1],
                                                      (npad + 1 - n,))])
        T = np.zeros((nseg, _SEG + 1), np.float32)
        T[:, :_SEG] = cpad[:npad].reshape(nseg, _SEG)
        T[:, _SEG] = cpad[_SEG::_SEG][:nseg]
        got = np.asarray(curve_lookup_tpu(
            jnp.asarray(x), jnp.asarray(T.T), n, _SEG, interpret=True))
        np.testing.assert_allclose(got, ref, atol=2e-6, err_msg=str(n))


def test_curve_kernel_v2_interpret_matches_apply_curve():
    """The grain_read-shaped curve kernel (ops/curve_kernel.py::_kernel_v2,
    samples on lanes) must match apply_curve exactly like v1."""
    import jax.numpy as jnp

    from webaudio_tpu.nodes.waveshaper import _SEG, apply_curve
    from webaudio_tpu.ops.curve_kernel import curve_lookup_tpu_v2

    rng = np.random.default_rng(29)
    x = rng.uniform(-1.3, 1.3, size=5000).astype(np.float32)
    for n in (3, 257, 2049):
        grid = np.linspace(-1, 1, n)
        curve = np.tanh(2.5 * grid).astype(np.float32)
        ref = np.asarray(apply_curve(jnp.asarray(curve), jnp.asarray(x)))
        nseg = -(-n // _SEG)
        npad = nseg * _SEG
        cpad = np.concatenate([curve, np.broadcast_to(curve[-1],
                                                      (npad + 1 - n,))])
        T = np.zeros((nseg, _SEG + 1), np.float32)
        T[:, :_SEG] = cpad[:npad].reshape(nseg, _SEG)
        T[:, _SEG] = cpad[_SEG::_SEG][:nseg]
        got = np.asarray(curve_lookup_tpu_v2(
            jnp.asarray(x), jnp.asarray(T), n, _SEG, interpret=True))
        np.testing.assert_allclose(got, ref, atol=2e-6, err_msg=str(n))


def test_curve_kernel_v3_interpret_matches_apply_curve():
    """The tile-aligned wide-row kernel (ops/curve_kernel.py::_kernel_v3)
    — the TPU DEFAULT since WEBAUDIO_CURVE=auto — vs apply_curve, at the
    SEG=127 table geometry waveshaper.py stages for it."""
    import jax.numpy as jnp

    from webaudio_tpu.nodes.waveshaper import apply_curve
    from webaudio_tpu.ops.curve_kernel import curve_lookup_tpu_v3

    rng = np.random.default_rng(41)
    x = rng.uniform(-1.3, 1.3, size=5000).astype(np.float32)
    segk = 127
    for n in (3, 257, 2049):
        grid = np.linspace(-1, 1, n)
        curve = np.tanh(2.5 * grid).astype(np.float32)
        ref = np.asarray(apply_curve(jnp.asarray(curve), jnp.asarray(x)))
        nseg = -(-n // segk)
        npad = nseg * segk
        cpad = np.concatenate([curve, np.broadcast_to(curve[-1],
                                                      (npad + 1 - n,))])
        T = np.zeros((nseg, segk + 1), np.float32)
        T[:, :segk] = cpad[:npad].reshape(nseg, segk)
        T[:, segk] = cpad[segk::segk][:nseg]
        got = np.asarray(curve_lookup_tpu_v3(
            jnp.asarray(x), jnp.asarray(T), n, segk, interpret=True))
        np.testing.assert_allclose(got, ref, atol=2e-6, err_msg=str(n))


def test_curve_modes_match_default():
    """WEBAUDIO_CURVE=major/gather must render identically to the default
    transposed formulation (in-situ A/B prerequisite)."""
    import jax.numpy as jnp

    from webaudio_tpu.nodes.waveshaper import apply_curve

    rng = np.random.default_rng(31)
    x = rng.uniform(-1.4, 1.4, size=4096).astype(np.float32)
    curve = np.tanh(np.linspace(-2, 2, 2048)).astype(np.float32)
    ref = np.asarray(apply_curve(jnp.asarray(curve), jnp.asarray(x)))
    for mode in ("major", "gather", "rowgather"):
        os.environ["WEBAUDIO_CURVE"] = mode
        try:
            got = np.asarray(apply_curve(jnp.asarray(curve),
                                         jnp.asarray(x)))
        finally:
            os.environ.pop("WEBAUDIO_CURVE", None)
        np.testing.assert_allclose(got, ref, atol=2e-6, err_msg=mode)


def test_grouped_pl_kernel_bit_matches_grouped_t():
    """The packed Pallas grouped-select (ops/grain_read.py::
    grouped_row_lerp_pl, interpret mode) must reproduce the XLA
    transposed select bit-for-bit across channel counts, group sizes,
    row widths, padding remainders, and the loop-wrap path."""
    import jax.numpy as jnp

    from webaudio_tpu.ops.grain_read import (
        grouped_row_lerp_pl, grouped_row_lerp_t, stage_rows)

    rng = np.random.default_rng(5)
    for (C, g, w, R, B, wrap) in [(2, 16, 21, 9, 7040, 0),
                                  (1, 16, 21, 3, 4096, 0),
                                  (2, 8, 11, 4, 2048, 0),
                                  (2, 16, 30, 2, 1024, 500),
                                  (1, 8, 32, 1, 64, 0)]:
        L = 4000
        ext = rng.standard_normal((C, L + w + 2)).astype(np.float32)
        rows_g = jnp.asarray(stage_rows(ext, w))
        base = rng.integers(0, L - w, size=(R, B // g)).astype(np.int32)
        step = rng.random((R, B // g)).astype(np.float32) * ((w - 3) / g)
        offs = np.arange(g, dtype=np.float32)[None, None, :] * \
            step[:, :, None]
        pif = base[:, :, None] + offs
        pi = np.floor(pif).astype(np.int32).reshape(R, B)
        fr = (pif - np.floor(pif)).astype(np.float32).reshape(R, B)
        a = np.asarray(grouped_row_lerp_t(
            rows_g, jnp.asarray(pi), jnp.asarray(fr), g, w, wrap))
        b = np.asarray(grouped_row_lerp_pl(
            rows_g, jnp.asarray(pi), jnp.asarray(fr), g, w, wrap,
            interpret=True))
        np.testing.assert_array_equal(a, b, err_msg=str((C, g, w, wrap)))


def test_grouped_v_kernel_matches_grouped_t_to_one_ulp():
    """The VMEM grouped-select (ops/grain_read.py::grouped_row_lerp_v,
    interpret mode) computes the same two-hot lerp products as the XLA
    transposed select, but the backend may FMA-contract the
    mul+accumulate (XLA:CPU does, for every formulation of this shape —
    see _kernel_grouped_v), so the guarantee is <=1 ulp of the LERP
    OPERANDS per element rather than bit equality.  Checked across
    channel counts, group sizes, row widths, padding remainders, and
    the loop-wrap path — same corpus as the _pl test."""
    import jax.numpy as jnp

    from webaudio_tpu.ops.grain_read import (
        grouped_row_lerp_t, grouped_row_lerp_v, stage_rows)

    rng = np.random.default_rng(7)
    for (C, g, w, R, B, wrap) in [(2, 16, 21, 9, 7040, 0),
                                  (1, 16, 21, 3, 4096, 0),
                                  (2, 8, 11, 4, 2048, 0),
                                  (2, 16, 30, 2, 1024, 500),
                                  (3, 16, 21, 2, 2048, 0),
                                  (1, 8, 32, 1, 64, 0)]:
        L = 4000
        ext = rng.standard_normal((C, L + w + 2)).astype(np.float32)
        rows_g = jnp.asarray(stage_rows(ext, w))
        base = rng.integers(0, L - w, size=(R, B // g)).astype(np.int32)
        step = rng.random((R, B // g)).astype(np.float32) * ((w - 3) / g)
        offs = np.arange(g, dtype=np.float32)[None, None, :] * \
            step[:, :, None]
        pif = base[:, :, None] + offs
        pi = np.floor(pif).astype(np.int32).reshape(R, B)
        fr = (pif - np.floor(pif)).astype(np.float32).reshape(R, B)
        a = np.asarray(grouped_row_lerp_t(
            rows_g, jnp.asarray(pi), jnp.asarray(fr), g, w, wrap))
        b = np.asarray(grouped_row_lerp_v(
            rows_g, jnp.asarray(pi), jnp.asarray(fr), g, w, wrap,
            interpret=True))
        # per-element bound: 1 ulp of the larger lerp operand (the FMA
        # keeps the product exact, so the only divergence is one
        # product rounding of an O(|x|) value).  Reconstruct the fetched
        # operands exactly like the kernels do: per group, row start
        # w0 (mod wrap), lane loc in [0, w-2], values ext[w0+loc(+1)].
        S = B // g
        piq = pi.reshape(R * S, g)
        w0 = np.minimum(piq[:, 0], piq[:, -1])
        loc = np.clip(piq - w0[:, None], 0, w - 2)
        if wrap:
            w0 = w0 % wrap
        idx = (w0[:, None] + loc).reshape(R, B)               # (R, B)
        lo = ext[:, idx]                                      # (C, R, B)
        hi = ext[:, idx + 1]
        bound = np.spacing(np.maximum(np.abs(lo), np.abs(hi))
                           .astype(np.float32))
        err = np.abs(a - b)
        assert np.all(err <= bound), (
            (C, g, w, wrap), float(err.max()), float(bound.max()))
        # and the overwhelming majority must still be bit-equal
        assert np.mean(a == b) > 0.5, (C, g, w, wrap)


def test_grouped_v_render_matches_default():
    """Whole-render A/B: the fused grain bank under
    WEBAUDIO_GRAIN_READ=grouped_v must match the grouped_t default."""
    import webaudio_tpu as wa
    from webaudio_tpu.graph import compiler as C

    def render(mode):
        os.environ["WEBAUDIO_GRAIN_READ"] = mode
        try:
            fs = 44100.0
            ctx = wa.OfflineAudioContext(2, int(fs * 0.8), fs)
            L = 30000
            buf = ctx.create_buffer(2, L, fs)
            rng = np.random.default_rng(11)
            for c in range(2):
                buf.copy_to_channel(
                    rng.standard_normal(L).astype(np.float32) * 0.4, c)
            rs = np.random.RandomState(3)
            for i in range(40):
                when = i * 0.6 / 40
                src = ctx.create_buffer_source(
                    playback_rate=float(0.9 + 0.2 * rs.rand()))
                src.buffer = buf
                g = ctx.create_gain(gain=0.0)
                g.gain.set_value_at_time(0.0, when)
                g.gain.linear_ramp_to_value_at_time(0.4, when + 0.045)
                g.gain.linear_ramp_to_value_at_time(0.0, when + 0.09)
                src.connect(g)
                g.connect(ctx.destination)
                src.start(when, 0.1 + i * 0.002, 0.09)
            os.environ["WEBAUDIO_FUSE_THRESHOLD"] = "8"
            try:
                cg = C.compile_graph(dict(ctx._nodes), list(ctx._edges),
                                     ctx.sample_rate, ctx.length,
                                     ctx._destination.node_id)
            finally:
                os.environ.pop("WEBAUDIO_FUSE_THRESHOLD", None)
            fused = [k for k in cg.kernels.values()
                     if type(k).__name__ == "_FusedVoicesKernel"]
            out, _ = C.render_compiled(cg, ctx._nodes, ctx.length)
            return np.asarray(out), fused
        finally:
            os.environ.pop("WEBAUDIO_GRAIN_READ", None)

    ref, fused_t = render("grouped_t")
    got, fused_v = render("grouped_v")
    assert fused_t and fused_t[0].read_mode == "grouped_t"
    assert fused_v and fused_v[0].read_mode == "grouped_v"
    assert np.abs(ref).max() > 0.01
    # not bit-exact: grouped_v's products may FMA-contract, and the
    # pallas call is a fusion boundary so the downstream per-lane
    # envelope multiply + K-lane reduce contract differently too —
    # ulp-scale errors accumulate over the ~tens of packed lanes
    # (measured max 1.2e-5 on this corpus; a wrong grain would be
    # O(0.1)).  Per-element correctness is anchored by the kernel-level
    # ulp test above; this test checks the mode is actually engaged and
    # the render is audibly identical.
    np.testing.assert_allclose(got, ref, rtol=0.0, atol=3e-5)
    num = float(np.sum((got - ref) ** 2))
    den = float(np.sum(ref ** 2))
    assert num <= 1e-9 * den, (num, den)


def test_grain_fused_render_matches_grouped_t():
    """Whole-render A/B: the fully-fused bank kernel
    (WEBAUDIO_GRAIN_READ=fused, interpret mode on CPU) must match the
    grouped_t XLA path — including grains that run past the buffer end
    (edge-correction path) and pre-start masking."""
    import webaudio_tpu as wa
    from webaudio_tpu.graph import compiler as C

    def render(mode):
        os.environ["WEBAUDIO_GRAIN_READ"] = mode
        try:
            fs = 44100.0
            ctx = wa.OfflineAudioContext(2, int(fs * 0.8), fs)
            L = 30000
            buf = ctx.create_buffer(2, L, fs)
            rng = np.random.default_rng(11)
            for c in range(2):
                buf.copy_to_channel(
                    rng.standard_normal(L).astype(np.float32) * 0.4, c)
            rs = np.random.RandomState(3)
            for i in range(40):
                when = i * 0.6 / 40
                src = ctx.create_buffer_source(
                    playback_rate=float(0.9 + 0.2 * rs.rand()))
                src.buffer = buf
                g = ctx.create_gain(gain=0.0)
                g.gain.set_value_at_time(0.0, when)
                g.gain.linear_ramp_to_value_at_time(0.4, when + 0.045)
                g.gain.linear_ramp_to_value_at_time(0.0, when + 0.09)
                src.connect(g)
                g.connect(ctx.destination)
                # every 5th grain starts near the buffer end so its
                # playhead crosses L (edge constant + valid mask)
                off = (L / fs - 0.05) if i % 5 == 0 else 0.1 + i * 0.002
                src.start(when, off, 0.09)
            os.environ["WEBAUDIO_FUSE_THRESHOLD"] = "8"
            try:
                cg = C.compile_graph(dict(ctx._nodes), list(ctx._edges),
                                     ctx.sample_rate, ctx.length,
                                     ctx._destination.node_id)
            finally:
                os.environ.pop("WEBAUDIO_FUSE_THRESHOLD", None)
            fused = [k for k in cg.kernels.values()
                     if type(k).__name__ == "_FusedVoicesKernel"]
            out, _ = C.render_compiled(cg, ctx._nodes, ctx.length)
            return np.asarray(out), fused
        finally:
            os.environ.pop("WEBAUDIO_GRAIN_READ", None)

    ref, fused_t = render("grouped_t")
    got, fused_f = render("fused")
    assert fused_t and fused_t[0].read_mode == "grouped_t"
    assert fused_f and fused_f[0].read_mode == "fused"
    assert fused_f[0].lane_aligned and fused_f[0].lane_env
    assert np.abs(ref).max() > 0.01
    # same tolerance rationale as the grouped_v render A/B: the kernel
    # computes the identical f32 products but the backend may
    # FMA-contract select/envelope chains differently
    np.testing.assert_allclose(got, ref, rtol=0.0, atol=3e-5)
    num = float(np.sum((got - ref) ** 2))
    den = float(np.sum(ref ** 2))
    assert num <= 1e-9 * den, (num, den)


def test_grain_auto_mode_gates_on_backend_probe(monkeypatch):
    """`auto` resolves grouped_v only when the one-time backend probe
    passes (ops/grain_read.grouped_v_supported — False on CPU), else the
    XLA transposed select; forced modes bypass the probe.  Mirrors the
    curve kernel's pallas3 auto-probe contract."""
    import webaudio_tpu as wa
    from webaudio_tpu.graph import compiler as C
    from webaudio_tpu.ops import grain_read

    def fused_mode():
        fs = 44100.0
        ctx = wa.OfflineAudioContext(1, int(fs * 0.8), fs)
        L = 20000
        buf = ctx.create_buffer(1, L, fs)
        buf.copy_to_channel(
            np.random.default_rng(5).standard_normal(L)
            .astype(np.float32) * 0.3, 0)
        # 40 grains, ~7 concurrent -> K*4 <= V so the lane path engages
        for i in range(40):
            s = ctx.create_buffer_source(playback_rate=1.03)
            s.buffer = buf
            s.connect(ctx.destination)
            s.start(i * 0.6 / 40, 0.05 + i * 0.002, 0.09)
        os.environ["WEBAUDIO_FUSE_THRESHOLD"] = "8"
        try:
            cg = C.compile_graph(dict(ctx._nodes), list(ctx._edges),
                                 ctx.sample_rate, ctx.length,
                                 ctx._destination.node_id)
        finally:
            os.environ.pop("WEBAUDIO_FUSE_THRESHOLD", None)
        (k,) = [k for k in cg.kernels.values()
                if type(k).__name__ == "_FusedVoicesKernel"]
        out, _ = C.render_compiled(cg, ctx._nodes, ctx.length)
        assert np.abs(np.asarray(out)).max() > 0.01
        return k.read_mode   # set at prepare() inside compile/render

    os.environ.pop("WEBAUDIO_GRAIN_READ", None)
    assert not grain_read.grouped_v_supported()     # CPU backend
    assert fused_mode() == "grouped_t"
    monkeypatch.setattr(grain_read, "grouped_v_supported", lambda: True)
    assert fused_mode() == "grouped_v"


def test_curve_auto_mode_cpu_is_xla():
    """Default (auto) curve mode on CPU must take the XLA path bit-exactly
    (the pallas3 probe only fires on tpu/axon backends) — including at
    sizes past the pallas threshold."""
    import jax.numpy as jnp

    from webaudio_tpu.nodes.waveshaper import apply_curve
    from webaudio_tpu.ops.curve_kernel import pallas3_supported

    assert pallas3_supported() is False  # CPU backend
    rng = np.random.default_rng(32)
    x = rng.uniform(-1.4, 1.4, size=(1 << 15) + 17).astype(np.float32)
    curve = np.tanh(np.linspace(-2, 2, 1024)).astype(np.float32)
    auto = np.asarray(apply_curve(jnp.asarray(curve), jnp.asarray(x)))
    os.environ["WEBAUDIO_CURVE"] = "xla"
    try:
        ref = np.asarray(apply_curve(jnp.asarray(curve), jnp.asarray(x)))
    finally:
        os.environ.pop("WEBAUDIO_CURVE", None)
    np.testing.assert_array_equal(auto, ref)
