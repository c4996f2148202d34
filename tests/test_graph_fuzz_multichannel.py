"""Multichannel differential fuzz: channel-count propagation + up/down-mix
through random graphs vs an independent spec-rule oracle.

The mono graph fuzz (test_graph_fuzz_oracle.py) pins scheduling/automation
composition; this file pins the *channel* axis: random buffer sources with
1/2/4/6 channels flow through gain chains with random channel configs
(count-mode max / clamped-max / explicit, interpretation speakers /
discrete) and fan in at shared mix points; the engine must match an
oracle that re-implements the W3C mixing rules (and the reference's
quantum.rs:285-535 semantics) directly from the spec text.
"""

import numpy as np
import pytest

from webaudio_tpu import OfflineAudioContext

FS = 48000.0
SQ5 = np.sqrt(0.5)


def _spec_mix(x: np.ndarray, c_out: int, interp: str) -> np.ndarray:
    """Up/down-mix (c_in, N) -> (c_out, N) per the Web Audio spec."""
    c_in, n = x.shape
    if c_in == c_out:
        return x
    out = np.zeros((c_out, n), x.dtype)
    pair = (c_in, c_out)
    if interp == "speakers":
        if pair == (1, 2):
            out[0] = out[1] = x[0]; return out
        if pair == (1, 4):
            out[0] = out[1] = x[0]; return out
        if pair == (1, 6):
            out[2] = x[0]; return out
        if pair == (2, 4):
            out[0], out[1] = x[0], x[1]; return out
        if pair == (2, 6):
            out[0], out[1] = x[0], x[1]; return out
        if pair == (4, 6):
            out[0], out[1], out[4], out[5] = x[0], x[1], x[2], x[3]; return out
        if pair == (2, 1):
            out[0] = 0.5 * (x[0] + x[1]); return out
        if pair == (4, 1):
            out[0] = 0.25 * (x[0] + x[1] + x[2] + x[3]); return out
        if pair == (6, 1):
            out[0] = SQ5 * (x[0] + x[1]) + x[2] + 0.5 * (x[4] + x[5])
            return out
        if pair == (4, 2):
            out[0] = 0.5 * (x[0] + x[2]); out[1] = 0.5 * (x[1] + x[3])
            return out
        if pair == (6, 2):
            out[0] = x[0] + SQ5 * (x[2] + x[4])
            out[1] = x[1] + SQ5 * (x[2] + x[5])
            return out
        if pair == (6, 4):
            out[0] = x[0] + SQ5 * x[2]
            out[1] = x[1] + SQ5 * x[2]
            out[2], out[3] = x[4], x[5]
            return out
    # discrete (and any non-enumerated speaker pair): copy/truncate + pad
    k = min(c_in, c_out)
    out[:k] = x[:k]
    return out


def _computed_channels(mode: str, count: int, max_in: int) -> int:
    if mode == "max":
        return max_in
    if mode == "clamped-max":
        return min(count, max_in)
    return count  # explicit


def _build_random_pair(seed: int):
    rng = np.random.RandomState(1000 + seed)
    length = int(rng.randint(700, 3000))
    dest_c = int(rng.choice([1, 2, 4, 6]))
    ctx = OfflineAudioContext(dest_c, length, FS)

    counts = [1, 2, 4, 6]
    specs = []          # oracle: (kind, payload, input_ids)
    chains = []

    for _ in range(rng.randint(2, 5)):
        c = int(rng.choice(counts))
        blen = int(rng.randint(200, length))
        data = rng.standard_normal((c, blen)).astype(np.float32) * 0.5
        buf = ctx.create_buffer(c, blen, FS)
        for ch in range(c):
            buf.copy_to_channel(data[ch], ch)
        src = ctx.create_buffer_source()
        src.buffer = buf
        sf = int(rng.randint(0, length // 2))
        src.start(sf / FS)
        sig = np.zeros((c, length), np.float64)
        take = min(blen, length - sf)
        sig[:, sf:sf + take] = data[:, :take]
        specs.append(("src", {"sig": sig}, []))
        node, tail = src, len(specs) - 1

        for _ in range(rng.randint(0, 3)):
            g0 = float(rng.uniform(0.3, 1.0))
            g = ctx.create_gain(gain=g0)
            mode = str(rng.choice(["max", "clamped-max", "explicit"]))
            cnt = int(rng.choice(counts))
            interp = str(rng.choice(["speakers", "discrete"]))
            g.set_channel_count(cnt)
            g.set_channel_count_mode(mode)
            g.set_channel_interpretation(interp)
            node.connect(g)
            specs.append(("gain", {"gain": g0, "mode": mode, "count": cnt,
                                   "interp": interp}, [tail]))
            node, tail = g, len(specs) - 1
        chains.append((node, tail))

    # converge chains into 1-2 shared mix gains (random configs) so fan-in
    # mixing happens at a node with a non-default channel config
    mix_ids = []
    mixes = []
    for _ in range(rng.randint(1, 3)):
        m = ctx.create_gain(gain=0.5)
        mode = str(rng.choice(["max", "clamped-max", "explicit"]))
        cnt = int(rng.choice(counts))
        interp = str(rng.choice(["speakers", "discrete"]))
        m.set_channel_count(cnt)
        m.set_channel_count_mode(mode)
        m.set_channel_interpretation(interp)
        m.connect(ctx.destination)
        specs.append(("gain", {"gain": 0.5, "mode": mode, "count": cnt,
                               "interp": interp}, []))
        mixes.append(m)
        mix_ids.append(len(specs) - 1)

    for i, (node, tail) in enumerate(chains):
        j = rng.randint(len(mixes))
        node.connect(mixes[j])
        specs[mix_ids[j]][2].append(tail)

    return ctx, specs, mix_ids, dest_c, length


def _oracle_render(specs, mix_ids, dest_c, length):
    outs = {}
    for idx, (kind, payload, input_ids) in enumerate(specs):
        if kind == "src":
            outs[idx] = payload["sig"]
            continue
        max_in = max((outs[i].shape[0] for i in input_ids), default=1)
        c = _computed_channels(payload["mode"], payload["count"], max_in)
        acc = np.zeros((c, length), np.float64)
        for i in input_ids:
            acc += _spec_mix(outs[i], c, payload["interp"])
        outs[idx] = acc * payload["gain"]
    dest = np.zeros((dest_c, length), np.float64)
    for i in mix_ids:
        dest += _spec_mix(outs[i], dest_c, "speakers")
    return dest.astype(np.float32)


@pytest.mark.parametrize("seed", range(10))
def test_random_multichannel_graph_matches_spec_oracle(seed):
    ctx, specs, mix_ids, dest_c, length = _build_random_pair(seed)
    got = ctx.start_rendering_sync().to_array()
    ref = _oracle_render(specs, mix_ids, dest_c, length)
    assert got.shape == ref.shape
    scale = max(float(np.abs(ref).max()), 1e-3)
    np.testing.assert_allclose(
        got, ref, atol=5e-5 * scale, rtol=0,
        err_msg=f"multichannel fuzz diverged (seed {seed})")
