"""Batching / time-sharding differential fuzz.

Reuses the random-graph generator from test_graph_fuzz_oracle and asserts
the two parallel drivers reproduce each context's own sequential render:

  - MixedGraphBatch over a random heterogeneous corpus (mixed topologies,
    mixed lengths, duplicate structures that must share a bucket) — the
    bucketing-fingerprint layer is where round-3's two high-severity bugs
    lived (parallel/batch.py graph_fingerprint), so it gets a randomized
    guard, not just enumerated cases.
  - render_time_sharded over the 8-virtual-device mesh vs the flat scan.
"""

import numpy as np
import pytest

from webaudio_tpu.parallel.batch import GraphBatch, MixedGraphBatch
from webaudio_tpu.parallel.segments import (
    render_time_sharded, NotTimeShardableError,
)

from test_graph_fuzz_oracle import _build_random_pair


def _fresh_ctx(seed: int):
    ctx, _oracle = _build_random_pair(seed)
    return ctx


@pytest.mark.parametrize("base", [0, 3, 7])
def test_mixed_batch_matches_individual_renders(base):
    # corpus: four distinct random graphs plus a structural duplicate of
    # the first (same generator seed => identical topology; it must bucket
    # with its twin and still render ITS OWN audio)
    seeds = [base, base + 1, base + 2, base + 4, base]
    ctxs = [_fresh_ctx(s) for s in seeds]
    refs = [np.asarray(_fresh_ctx(s).start_rendering_sync().to_array())
            for s in seeds]

    mb = GraphBatch.from_contexts(ctxs)
    outs = mb.render() if isinstance(mb, MixedGraphBatch) else [mb.render()]
    if isinstance(mb, MixedGraphBatch):
        assert mb.num_buckets < len(seeds)  # the twins shared a bucket
    assert len(outs) == len(seeds)
    for i, (out, ref) in enumerate(zip(outs, refs)):
        out = np.asarray(out)
        assert out.shape == ref.shape, f"context {i} (seed {seeds[i]})"
        scale = max(float(np.abs(ref).max()), 1e-3)
        np.testing.assert_allclose(
            out, ref, atol=5e-5 * scale, rtol=0,
            err_msg=f"batched lane {i} (seed {seeds[i]}) diverged from "
                    f"its own sequential render")


@pytest.mark.parametrize("seed", [1, 2, 5, 8])
def test_time_sharded_matches_sequential_random_graphs(seed):
    seq_ctx = _fresh_ctx(seed)
    seq = np.asarray(seq_ctx.start_rendering_sync().to_array())
    try:
        sharded = render_time_sharded(_fresh_ctx(seed))
    except NotTimeShardableError as exc:
        pytest.skip(f"seed {seed} not time-shardable: {exc}")
    sharded = np.asarray(sharded)
    assert sharded.shape == seq.shape
    scale = max(float(np.abs(seq).max()), 1e-3)
    np.testing.assert_allclose(
        sharded, seq, atol=5e-5 * scale, rtol=0,
        err_msg=f"time-sharded render diverged (seed {seed})")
