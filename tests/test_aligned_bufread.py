"""Aligned unit-step buffer-source fetch (the dynamic_slice fast path).

The reference's own fast track special-cases aligned unit-rate playback
as a memcpy (audio_buffer_source.rs:554-624); our analog replaces the
per-sample pair gather with one dynamic_slice from a pre-tiled layout
(nodes/buffer_source.py::_fetch_aligned).  These tests pin (a) bit-exact
equivalence against the gather formulation across schedule/loop/offset
shapes, (b) eligibility (fractional rates and rate mismatches must NOT
take the fast path), and (c) the GraphBatch override_buffer interplay.
"""

import os

import numpy as np
import pytest

import webaudio_tpu as wa

FS = 48000.0


def _render(loop, offset=0.0, start=0.0, stop=None, dur=None, rate=1.0,
            L=7919, buf_fs=None, seed=7, seconds=1.5):
    rng = np.random.default_rng(seed)
    ctx = wa.OfflineAudioContext(2, int(FS * seconds), FS)
    buf = ctx.create_buffer(2, L, buf_fs or FS)
    data = rng.standard_normal((2, L)).astype(np.float32)
    for c in range(2):
        buf.copy_to_channel(data[c], c)
    src = ctx.create_buffer_source(loop=loop, playback_rate=rate)
    src.buffer = buf
    src.connect(ctx.destination)
    if dur is not None:
        src.start(start, offset, dur)
    else:
        src.start(start, offset)
    if stop is not None:
        src.stop(stop)
    out = ctx.start_rendering_sync()
    return np.stack([out.get_channel_data(c) for c in range(2)])


CASES = [
    dict(loop=True),
    dict(loop=False),
    dict(loop=True, offset=0.05),
    dict(loop=False, offset=0.02, start=0.25, stop=1.2),
    dict(loop=True, start=0.5, dur=0.7),
    dict(loop=False, L=200),          # one-shot shorter than one block
    dict(loop=True, L=200),           # many wraps per block
]


@pytest.mark.parametrize("kw", CASES, ids=[str(i) for i in range(len(CASES))])
def test_aligned_matches_gather_bit_exact(kw):
    a = _render(**kw)
    os.environ["WEBAUDIO_BUF_ALIGNED"] = "0"
    try:
        b = _render(**kw)
    finally:
        os.environ.pop("WEBAUDIO_BUF_ALIGNED", None)
    np.testing.assert_array_equal(a, b)
    assert np.max(np.abs(a)) > 0.0


def test_aligned_eligibility():
    """Fast path engages exactly when the playhead step is 1.0 from an
    integral start position; fractional rates / sample-rate mismatches /
    partial loops keep the gather formulation."""
    from webaudio_tpu.graph import compiler as C

    def mode_for(rate=1.0, buf_fs=FS, loop=True, loop_start=0.0,
                 offset=0.0):
        ctx = wa.OfflineAudioContext(1, int(FS), FS)
        buf = ctx.create_buffer(1, 4000, buf_fs)
        src = ctx.create_buffer_source(loop=loop, playback_rate=rate)
        src.buffer = buf
        if loop_start:
            src.loop_start = loop_start
        src.connect(ctx.destination)
        src.start(0.0, offset)
        cg = C.compile_graph(dict(ctx._nodes), list(ctx._edges), FS,
                             ctx.length, ctx._destination.node_id,
                             start_frame=0)
        (kern,) = [k for k in cg.kernels.values()
                   if hasattr(k, "read_mode")]
        return kern.read_mode

    assert mode_for() == "aligned"
    assert mode_for(loop=False) == "aligned"
    assert mode_for(rate=0.5) == "gather"
    assert mode_for(buf_fs=44100.0) == "gather"
    assert mode_for(loop_start=0.01) == "gather"       # partial loop
    assert mode_for(offset=0.0100001) == "gather"      # fractional start pos
    os.environ["WEBAUDIO_BUF_ALIGNED"] = "0"
    try:
        assert mode_for() == "gather"
    finally:
        os.environ.pop("WEBAUDIO_BUF_ALIGNED", None)


@pytest.mark.parametrize("loop", [True, False])
def test_aligned_across_suspend_retrace(loop):
    """A suspend_sync re-trace restarts the compiled segment at a nonzero
    start_frame; the aligned slice (global frame0 math) must continue the
    stream bit-exactly vs an uninterrupted render."""
    def build(suspend):
        rng = np.random.default_rng(11)
        ctx = wa.OfflineAudioContext(2, int(FS), FS)
        L = 7919 if loop else 30000
        buf = ctx.create_buffer(2, L, FS)
        for c in range(2):
            buf.copy_to_channel(rng.standard_normal(L).astype(np.float32), c)
        src = ctx.create_buffer_source(loop=loop)
        src.buffer = buf
        src.connect(ctx.destination)
        if loop:
            src.start()
        else:
            src.start(0.1, 0.05)
        if suspend:
            ctx.suspend_sync(0.37, lambda c: None)
        out = ctx.start_rendering_sync()
        return np.stack([out.get_channel_data(c) for c in range(2)])

    np.testing.assert_array_equal(build(False), build(True))


def test_aligned_graph_batch_override_buffer():
    """override_buffer must restage the tiled layout per instance so each
    lane plays its own audio through the aligned path."""
    ctx = wa.OfflineAudioContext(1, int(FS * 0.5), FS)
    L = 5000
    buf = ctx.create_buffer(1, L, FS)
    src = ctx.create_buffer_source(loop=True)
    src.buffer = buf
    src.connect(ctx.destination)
    src.start()
    gb = wa.GraphBatch(ctx, batch=3)
    rng = np.random.default_rng(11)
    stacked = rng.standard_normal((3, 1, L)).astype(np.float32)
    gb.override_buffer(src, stacked)
    out = np.asarray(gb.render())
    for i in range(3):
        # lane i must reproduce a solo render of its own audio
        solo = wa.OfflineAudioContext(1, int(FS * 0.5), FS)
        sb = solo.create_buffer(1, L, FS)
        sb.copy_to_channel(stacked[i, 0], 0)
        ss = solo.create_buffer_source(loop=True)
        ss.buffer = sb
        ss.connect(solo.destination)
        ss.start()
        ref = solo.start_rendering_sync().get_channel_data(0)
        np.testing.assert_array_equal(out[i, 0, :len(ref)], ref)
