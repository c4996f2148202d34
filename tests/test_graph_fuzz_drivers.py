"""Driver differential fuzz: every render driver must agree on the same
random graphs.

The five drivers share one compiled graph but each assembles the dense
param tensor itself (CLAUDE.md layout invariant): render_compiled (covered
by test_graph_fuzz_oracle), GraphBatch / segments (test_graph_fuzz_batch),
and here the remaining two — RenderSession's streaming incremental steps
(+ a save/restore roundtrip) and the online context's render loop (graphs
mounted at a nonzero start time, schedules shifted accordingly).
"""

import time

import numpy as np
import pytest

from webaudio_tpu import AudioContext
from webaudio_tpu.checkpoint import RenderSession

from test_graph_fuzz_oracle import FS, _build_random_pair


@pytest.mark.parametrize("seed,qpb", [(0, 1), (2, 2), (4, 4), (6, 1)])
def test_render_session_matches_oracle_with_restore(seed, qpb, tmp_path):
    ctx, oracle = _build_random_pair(seed)
    ref = oracle.render()
    length = ref.shape[0]
    block = qpb * 128

    s = RenderSession(ctx, quanta_per_block=qpb)
    block = s.block_frames  # cyclic clamp would shrink it; these are acyclic
    half = (length // (2 * block)) * block or block
    first = s.step(half)
    ck = str(tmp_path / "ck.npz")
    s.save(ck)

    ctx2, _ = _build_random_pair(seed)
    s2 = RenderSession(ctx2, quanta_per_block=qpb)
    s2.restore(ck)
    assert s2.frame == half
    rest = -(-(length - half) // block) * block
    second = s2.step(rest)

    got = np.concatenate([first[0], second[0]])[:length]
    scale = max(float(np.abs(ref).max()), 1e-3)
    np.testing.assert_allclose(
        got, ref, atol=5e-5 * scale, rtol=0,
        err_msg=f"RenderSession (qpb={qpb}) diverged (seed {seed})")


@pytest.mark.parametrize("seed", [1, 3, 5])
def test_online_loop_matches_oracle_at_offset(seed):
    chunks = []
    ctx = AudioContext(sample_rate=FS, number_of_channels=1,
                       sink_id=lambda c, ts: chunks.append(np.asarray(c)))
    try:
        ctx.set_realtime_pacing(False)
        ctx.suspend_sync()
        f0 = round(ctx.current_time * FS)
        _, oracle = _build_random_pair(seed, ctx=ctx, offset_frames=f0)
        length = oracle.length
        ctx.resume_sync()
        deadline = time.time() + 60
        while time.time() < deadline:
            if sum(c.shape[1] for c in chunks) >= f0 + length:
                break
            time.sleep(0.02)
        ctx.suspend_sync()
    finally:
        ctx.close_sync()
    data = np.concatenate(chunks, axis=1)[0]
    assert data.shape[0] >= f0 + length, "online loop under-rendered"
    got = data[f0:f0 + length]
    ref = oracle.render()
    scale = max(float(np.abs(ref).max()), 1e-3)
    np.testing.assert_allclose(
        got, ref, atol=5e-5 * scale, rtol=0,
        err_msg=f"online loop diverged from oracle (seed {seed}, f0={f0})")
