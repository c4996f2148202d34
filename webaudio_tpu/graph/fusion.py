"""Automatic fusion of homogeneous oscillator(+gain) chains.

The reference renders each node as a separate processor on its audio
thread (graph.rs per-node `process` calls); a literal translation makes a
500-oscillator additive-synth graph trace to ~20k HLO ops — XLA compile
time is bound by graph size, and per-node (1, B) work leaves the VPU
idle.  This pass rewrites groups of identical-topology source chains

    osc_i -> gain_i -> common targets        (envelope chains)
    osc_i -> common targets                  (plain banks)

into ONE fused node computing all V voices as (V, B) tensors — phases in
closed form when frequencies are constant, a vmapped f64-carry cumsum
otherwise — and pre-summing into the shared mix targets (sum_inputs is
additive, so summing V mono signals before the edge is exactly the
per-edge sum the unfused graph computes).

Semantics per voice are unchanged: sub-sample start phase correction,
start/stop masks, nyquist muting, per-voice AudioParam automation
(frequency / detune / gain timelines compile to packed dense rows exactly
as before — the fused kernel slices its group's contiguous rows in one
op instead of gathering 3V separate tensors).

Fusion is topology-deterministic (fused ids derive from member ids), so
suspend/resume re-traces and checkpoints keep matching state keys.
Disable or tune with WEBAUDIO_FUSE_THRESHOLD (<=0 disables; default 32).
"""

from __future__ import annotations

import os
from collections import defaultdict

import numpy as np
import jax
import jax.numpy as jnp

from ..constants import RENDER_QUANTUM_SIZE
from .ir import Edge


def fuse_threshold() -> int:
    try:
        return int(os.environ.get("WEBAUDIO_FUSE_THRESHOLD", "32"))
    except ValueError:
        return 32


def fuse_sources(nodes: dict, edges: list, dest_id: int,
                 sample_rate: float | None = None):
    """-> (nodes', edges', param_alias) where param_alias maps each fused
    member's (node_id, param_name) to its (fused_id, alias) row key.

    sample_rate enables fuse-time grain-lane planning for buffer-source
    banks (lane-packed kernels + per-lane spliced envelope params)."""
    threshold = fuse_threshold()
    if threshold <= 0 or len(nodes) < threshold:
        return nodes, edges, {}

    from ..nodes.oscillator import OscillatorNode
    from ..nodes.constant_source import ConstantSourceNode
    from ..nodes.buffer_source import AudioBufferSourceNode
    from ..nodes.biquad_filter import BiquadFilterNode
    from ..nodes.gain import GainNode
    from ..nodes.stereo_panner import StereoPannerNode
    from ..nodes.waveshaper import WaveShaperNode, OverSampleType
    from ..ops.mixing import ChannelCountMode

    out_edges: dict = defaultdict(list)
    audio_in: dict = defaultdict(int)
    param_in: set = set()
    for e in edges:
        out_edges[e.src].append(e)
        if e.param is not None:
            param_in.add((e.dst, e.param))
        else:
            audio_in[e.dst] += 1

    def _const(p):
        # constructor-time .value setters queue SetValue(t=0) events;
        # those still compile to a constant
        from ..automation import SET_VALUE
        return all(e.event_type == SET_VALUE and e.time == 0.0
                   for e in p._timeline.events)

    # candidate chains: (source_id, filter_id_or_None, gain_id_or_None,
    #                    targets)
    chains = []
    for nid, node in nodes.items():
        if isinstance(node, OscillatorNode):
            kind = node._type  # custom waves fuse too (stacked tables)
            if (nid, "frequency") in param_in or (nid, "detune") in param_in:
                continue
        elif isinstance(node, ConstantSourceNode):
            kind = "const_src"
            if (nid, "offset") in param_in:
                continue
        elif isinstance(node, AudioBufferSourceNode):
            # v1: same buffer, constant compound rate, no loop (the
            # granular-synthesis shape: many short grains of one sample)
            if (node.buffer is None or node.loop
                    or (nid, "playback_rate") in param_in
                    or (nid, "detune") in param_in
                    or not _const(node.params["playback_rate"])
                    or not _const(node.params["detune"])):
                continue
            kind = ("bufsrc", id(node.buffer))
        else:
            continue
        outs = out_edges.get(nid, [])
        if not outs or any(e.src_output != 0 for e in outs):
            continue
        # optional waveshaper stage (no oversampling, curve set): voice
        # distortion banks; mono sources only
        shaper = None
        if (not (isinstance(kind, tuple) and kind[0] == "bufsrc")
                and len(outs) == 1 and outs[0].param is None
                and outs[0].dst_input == 0
                and isinstance(nodes.get(outs[0].dst), WaveShaperNode)):
            wcand = outs[0].dst
            wnode = nodes[wcand]
            if (wcand != dest_id and audio_in[wcand] == 1
                    and wnode.curve is not None
                    and wnode.oversample == OverSampleType.NONE
                    and wnode._channel_config.mode == ChannelCountMode.MAX
                    and out_edges.get(wcand)):
                shaper = wcand
                outs = out_edges[wcand]
        # optional constant-coefficient biquad stage (subtractive-synth
        # chains; mono sources only — buffer sources keep gain-only chains)
        filt = None
        if (not (isinstance(kind, tuple) and kind[0] == "bufsrc")
                and len(outs) == 1 and outs[0].param is None
                and outs[0].dst_input == 0
                and isinstance(nodes.get(outs[0].dst), BiquadFilterNode)):
            fcand = outs[0].dst
            fnode = nodes[fcand]
            if (fcand != dest_id and audio_in[fcand] == 1
                    and all((fcand, pn) not in param_in
                            for pn in ("frequency", "detune", "q", "gain"))
                    and all(_const(fnode.params[pn])
                            for pn in ("frequency", "detune", "q", "gain"))
                    and fnode._channel_config.mode == ChannelCountMode.MAX
                    and out_edges.get(fcand)):
                filt = fcand
                outs = out_edges[fcand]
        gain = None
        if (len(outs) == 1 and outs[0].param is None
                and outs[0].dst_input == 0
                and isinstance(nodes.get(outs[0].dst), GainNode)):
            g = outs[0].dst
            gcfg = nodes[g]._channel_config
            if (g != dest_id and audio_in[g] == 1
                    and (g, "gain") not in param_in
                    and out_edges.get(g)
                    # an explicit/clamped channel count up-mixes *inside*
                    # the chain and changes downstream channel propagation;
                    # only Max-mode (pass-through width) gains fuse
                    and gcfg.mode == ChannelCountMode.MAX):
                gain = g
                outs = out_edges[g]
        # optional constant-pan stereo spread tail (poly-synth voicing);
        # mono chains only, so the panner takes its mono equal-power path
        pan = None
        if (not (isinstance(kind, tuple) and kind[0] == "bufsrc")
                and len(outs) == 1 and outs[0].param is None
                and outs[0].dst_input == 0
                and isinstance(nodes.get(outs[0].dst), StereoPannerNode)):
            pcand = outs[0].dst
            pnode = nodes[pcand]
            pcfg = pnode._channel_config
            if (pcand != dest_id and audio_in[pcand] == 1
                    and (pcand, "pan") not in param_in
                    and _const(pnode.params["pan"])
                    # an explicit channel count up-mixes the mono chain
                    # and takes the stereo pan path when unfused; the
                    # fused kernel always applies mono equal-power gains
                    and (pcfg.mode != ChannelCountMode.EXPLICIT
                         or pcfg.count == 1)
                    and out_edges.get(pcand)):
                pan = pcand
                outs = out_edges[pcand]
        targets = tuple(sorted(
            (e.dst, e.dst_input, e.param or "") for e in outs))
        if not targets:
            continue
        chains.append((nid, shaper, filt, gain, pan, targets, kind))

    # group by (source kind / waveform type, chain shape, target signature)
    groups: dict = defaultdict(list)
    for nid, shaper, filt, gain, pan, targets, kind in chains:
        clen = len(nodes[shaper].curve) if shaper is not None else 0
        groups[(kind, clen, filt is not None, gain is not None,
                pan is not None, targets)].append(
            (nid, shaper, filt, gain, pan))

    # drop groups whose targets point at nodes another group removes
    # (rare: an env gain feeding another candidate's gain); iterate to a
    # fixed point
    live = {k: v for k, v in groups.items() if len(v) >= threshold}
    while True:
        removed = set()
        for members in live.values():
            for nid, shaper, filt, gain, pan in members:
                removed.add(nid)
                for extra in (shaper, filt, gain, pan):
                    if extra is not None:
                        removed.add(extra)
        bad = [k for k in live
               if any(t[0] in removed for t in k[5])]
        if not bad:
            break
        for k in bad:
            del live[k]
    if not live:
        return nodes, edges, {}

    nodes2 = dict(nodes)
    removed: set = set()
    param_alias: dict = {}
    fused_edges: list = []
    for (kind, _clen, has_filt, has_gain, has_pan, targets), members in \
            sorted(live.items(), key=lambda kv: min(m[0] for m in kv[1])):
        members = sorted(members)
        fid = -(1 + min(m[0] for m in members))  # deterministic, unique
        fnode = _FusedVoicesNode(
            fid, [nodes[m[0]] for m in members],
            [nodes[m[3]] if m[3] is not None else None for m in members],
            kind,
            filters=[nodes[m[2]] if m[2] is not None else None
                     for m in members],
            panners=[nodes[m[4]] if m[4] is not None else None
                     for m in members],
            shapers=[nodes[m[1]] if m[1] is not None else None
                     for m in members],
            sample_rate=sample_rate)
        nodes2[fid] = fnode
        for i, (onid, wnid, fnid, gnid, pnid) in enumerate(members):
            removed.add(onid)
            if kind == "const_src":
                param_alias[(onid, "offset")] = (fid, f"v{i}.offset")
            elif isinstance(kind, tuple) and kind[0] == "bufsrc":
                pass  # constant rates: no packed rows to remap
            else:
                param_alias[(onid, "frequency")] = (fid, f"v{i}.frequency")
                param_alias[(onid, "detune")] = (fid, f"v{i}.detune")
            if wnid is not None:
                removed.add(wnid)  # static curve: no packed rows
            if fnid is not None:
                removed.add(fnid)  # constant coefs: no packed rows
            if gnid is not None:
                removed.add(gnid)
                param_alias[(gnid, "gain")] = (fid, f"v{i}.gain")
            if pnid is not None:
                removed.add(pnid)  # constant pan: no packed rows
        for dst, dst_input, pname in targets:
            fused_edges.append(Edge(fid, 0, dst, dst_input, pname or None))

    for nid in removed:
        del nodes2[nid]
    edges2 = [e for e in edges
              if e.src not in removed and e.dst not in removed]
    edges2.extend(fused_edges)
    return nodes2, edges2, param_alias


class _GrainLanePlan:
    """Host-side grain-lane packing for a fused buffer-source bank.

    Computed at FUSE time (not kernel-build time) so the fused node can
    declare per-LANE envelope params before param compilation: grain
    schedules are compile-time-known when rates are constant — the same
    insight that made automation dense."""

    __slots__ = ("starts", "stops", "rates", "offsets", "durations",
                 "start_times", "offset_pos", "delta_elapsed", "dur_end",
                 "ends", "use_lanes", "K", "lane_start", "lane_end",
                 "lane_voice", "lanes", "aligned")


def _plan_grain_lanes(sources, fs: float) -> _GrainLanePlan:
    """Pack time-localized grains into K << V concurrency lanes.

    The naive (V, B) grain bank issues 2*V*B HBM gathers per block —
    ~600 Melem/s on v5e makes a 400-grain cloud GATHER-bound (the honest
    granular bench ran at 7x realtime).  Grains are short and sequential,
    so the peak overlap is tiny (~4 of 400): greedy interval partitioning
    (optimal for interval graphs) assigns each grain to a lane, and the
    kernel renders (K, B) instead of (V, B) — a ~V/K reduction in
    gathered samples.  Requires a conservative UPPER bound on each
    grain's audible end (buffer exit, duration cap, stop time); unbounded
    voices keep a dedicated lane."""
    import os

    p = _GrainLanePlan()
    V = len(sources)
    buf = sources[0].buffer
    buf_len = buf.length
    buf_rate = buf.sample_rate
    buf_duration = buf.length / buf.sample_rate
    ratio = buf_rate / fs
    INF = 2**31 - 1

    starts, stops = [], []
    rates, offsets, durations, start_times = [], [], [], []
    for o in sources:
        start, stop = o._schedule_frames(fs)
        starts.append(min(start, INF))
        stops.append(min(stop, INF))
        pr = np.float64(np.float32(o.playback_rate.value))
        dt_ = np.float64(np.float32(o.detune.value))
        rates.append(float(pr * np.exp2(dt_ / 1200.0)))
        offsets.append(float(o._offset))
        d = o._duration
        durations.append(np.inf if d is None else float(d))
        start_times.append(0.0 if o._start_time is None
                           else float(o._start_time))
    p.starts = np.asarray(starts, np.int32)
    p.stops = np.asarray(stops, np.int32)
    p.rates = np.asarray(rates, np.float64)
    p.offsets = np.asarray(offsets, np.float64)
    p.durations = np.asarray(durations, np.float64)
    p.start_times = np.asarray(start_times, np.float64)

    offset_pos = np.zeros(V, np.float64)
    delta_el = np.zeros(V, np.float64)
    ends = np.zeros(V, np.int64)
    for i in range(V):
        start = int(p.starts[i])
        if start >= INF:
            offset_pos[i] = 0.0
            ends[i] = start
            continue
        delta = start / fs - p.start_times[i]
        off_eff = min(max(p.offsets[i] + delta * p.rates[i], 0.0),
                      buf_duration)
        offset_pos[i] = off_eff * buf_rate
        delta_el[i] = abs(delta * p.rates[i]) * fs
        cand = [float(p.stops[i])]
        r_ = p.rates[i] * ratio  # buffer samples per frame
        if r_ > 0:
            cand.append(start + (buf_len - offset_pos[i]) / r_ + 2)
        elif r_ < 0:
            cand.append(start + offset_pos[i] / (-r_) + 2)
        if np.isfinite(p.durations[i]) and abs(p.rates[i]) > 0:
            cand.append(start + (p.durations[i] * fs - delta_el[i])
                        / abs(p.rates[i]) + 2)
        ends[i] = int(min(min(cand), INF))
    p.offset_pos = offset_pos
    p.delta_elapsed = delta_el
    p.ends = ends

    # duration cutoff frame per voice, computed to match the per-sample
    # f64 comparison `n_rel*|rate| + delta_el < dur*fs` exactly (probe
    # the three candidate frames around the analytic boundary)
    dur_end = np.full(V, INF, np.int64)
    for i in range(V):
        if not np.isfinite(p.durations[i]) or p.rates[i] == 0.0:
            continue
        rhs = (p.durations[i] * fs - delta_el[i]) / abs(p.rates[i])
        k0 = int(np.floor(rhs))
        cut = k0 + 2
        for kk in (max(k0 - 1, 0), k0, k0 + 1):
            if not (kk * abs(p.rates[i]) + delta_el[i]
                    < p.durations[i] * fs):
                cut = kk
                break
        dur_end[i] = min(int(p.starts[i]) + cut, INF)
    p.dur_end = dur_end.astype(np.int32)

    # Quantum-ALIGNED packing (default): a grain may only follow another
    # in the same lane when every possibly-audible frame of the old grain
    # (< ends) lies in an EARLIER quantum than the new grain's start.
    # Then any quantum sees at most one audible grain per lane, so the
    # kernel renders from a single per-quantum grain id — no predecessor
    # fetch/select at all (the second windowed fetch was ~25% of the
    # granular bench, benches/granular_ablate.py single_variant).  Costs
    # at most one extra quantum of lane occupancy per grain.  The legacy
    # packing (WEBAUDIO_GRAIN_ALIGNED=0) only requires ends <= start with
    # starts >= one quantum apart, and the kernel selects between the
    # quantum-end grain and its predecessor per sample.
    p.aligned = os.environ.get("WEBAUDIO_GRAIN_ALIGNED", "1") != "0"
    order = np.argsort(p.starts, kind="stable")
    lane_end: list = []
    lane_last_start: list = []
    lanes: list = []
    for i in order:
        s, e = int(p.starts[i]), int(ends[i])
        for k in range(len(lane_end)):
            fits = (lane_end[k] <= (s // 128) * 128 if p.aligned
                    else lane_end[k] <= s
                    and s - lane_last_start[k] >= 128)
            if fits:
                lanes[k].append(int(i))
                lane_end[k] = e
                lane_last_start[k] = s
                break
        else:
            lanes.append([int(i)])
            lane_end.append(e)
            lane_last_start.append(s)
    K = len(lanes)
    p.lanes = lanes
    p.K = K
    # extreme playback rates would overflow the lane path's i32 playhead
    # rebase (the dense (V, B) path stays f64 end-to-end)
    sane_rates = float(np.max(np.abs(p.rates))) * ratio <= 64.0
    p.use_lanes = (K * 4 <= V and sane_rates
                   and os.environ.get("WEBAUDIO_GRAIN_LANES", "1") != "0")
    if not p.use_lanes:
        return p
    G = max(len(m) for m in lanes)
    lane_start = np.full((K, G), INF, np.int32)
    lane_endv = np.zeros((K, G), np.int32)
    lane_voice = np.zeros((K, G), np.int32)
    for k, members in enumerate(lanes):
        for j, i in enumerate(members):
            lane_start[k, j] = p.starts[i]
            lane_endv[k, j] = min(int(ends[i]), INF)
            lane_voice[k, j] = i
    p.lane_start = lane_start
    p.lane_end = lane_endv
    p.lane_voice = lane_voice
    return p


class _LaneEnvParam:
    """Synthetic per-LANE gain param for a lane-packed grain bank.

    The dense-param path previously streamed one full-length row per
    VOICE (400 envelope rows = ~700 MB of automation per granular render)
    and selected rows per quantum on device.  Grain spans within a lane
    are disjoint by construction, so the K lane rows are spliced
    host-side from each member's own compiled envelope — the kernel then
    reads gain as a plain (K, B) xs slice with no selection at all.
    Rides the same dense-param machinery as real AudioParams: implements
    `compile_for_render` (offline/batch/segments/checkpoint drivers) and
    `advance_dense` (online streaming driver)."""

    def __init__(self, plan: _GrainLanePlan, k: int, gains):
        self._plan = plan
        self._members = list(plan.lanes[k])
        self._gains = gains
        g0 = gains[self._members[0]].params["gain"]
        self.min_value = g0.min_value
        self.max_value = g0.max_value
        self.default_value = 0.0

    def _splice(self, row, i, vals, gparam, start_frame, length):
        INF = 2**31 - 1
        s_abs = int(self._plan.starts[i])
        if s_abs >= INF:
            return
        e_abs = int(min(self._plan.ends[i], start_frame + length))
        s = max(s_abs - start_frame, 0)
        e = e_abs - start_frame
        if e <= s:
            return
        if np.isscalar(vals):
            row[s:e] = np.float32(
                min(max(vals, gparam.min_value), gparam.max_value))
        else:
            row[s:e] = np.clip(vals[s:e], gparam.min_value,
                               gparam.max_value)

    def compile_for_render(self, sample_rate: float, length: int,
                           start_frame: int = 0,
                           force_dense: bool = False):
        from .. import automation as _automation

        row = np.zeros(length, np.float32)
        for i in self._members:
            g = self._gains[i].params["gain"]
            mplan = g.compile_for_render(sample_rate, length, start_frame)
            vals = mplan.scalar if mplan.is_constant else mplan.dense
            self._splice(row, i, vals, g, start_frame, length)
        return _automation.CompiledParam(None, row, 0.0, None)

    def advance_dense(self, sample_rate: float, length: int,
                      start_frame: int = 0) -> np.ndarray:
        row = np.zeros(length, np.float32)
        for i in self._members:
            # advance EVERY member's live timeline each chunk (keeps their
            # state machines in lockstep with the render position)
            g = self._gains[i].params["gain"]
            vals = g.advance_dense(sample_rate, length, start_frame)
            self._splice(row, i, vals, g, start_frame, length)
        return row


class _FusedVoicesNode:
    """Synthetic graph node standing in for V fused source chains.

    Exposes exactly the protocol compile_graph consumes: node_id, params
    (the member AudioParams re-homed under per-voice aliases, so their
    timelines compile once as usual), channel config, and make_kernel."""

    number_of_inputs = 0
    number_of_outputs = 1

    def __init__(self, fid, sources, gains, kind, filters=None,
                 panners=None, shapers=None, sample_rate=None):
        self.node_id = fid
        # block-size budget: the kernel materializes ~(V, B) f64 temporaries
        # (phase math), i.e. ~4V times a single node's (1, B) f32 buffers
        self.compile_weight = 4 * len(sources)
        self.sources = sources
        self.gains = gains
        self.filters = filters or [None] * len(sources)
        self.panners = panners or [None] * len(sources)
        self.shapers = shapers or [None] * len(sources)
        self.kind = kind  # OscillatorType, "const_src", or ("bufsrc", id)
        self._channel_config = sources[0]._channel_config
        self.lane_plan = None
        self.lane_env = False
        if (isinstance(kind, tuple) and kind[0] == "bufsrc"
                and sample_rate is not None):
            self.lane_plan = _plan_grain_lanes(sources, float(sample_rate))
            if self.lane_plan.use_lanes:
                # lane-packed temporaries are (K, B), not (V, B): budget on
                # K so the block policy can pick render-sized blocks
                self.compile_weight = 4 * self.lane_plan.K + 4
        # aliases grouped by param KIND so each group's dense rows pack
        # contiguously in cg.dense_params (gather_params slices per group)
        self._params = {}
        if kind == "const_src":
            for i, src in enumerate(sources):
                self._params[f"v{i}.offset"] = src.params["offset"]
        elif isinstance(kind, tuple) and kind[0] == "bufsrc":
            pass  # rates are constant by the fusion predicate
        else:
            for i, src in enumerate(sources):
                self._params[f"v{i}.frequency"] = src.params["frequency"]
            for i, src in enumerate(sources):
                self._params[f"v{i}.detune"] = src.params["detune"]
        if (self.lane_plan is not None and self.lane_plan.use_lanes
                and gains[0] is not None
                and os.environ.get("WEBAUDIO_LANE_ENV", "1") != "0"
                and os.environ.get("WEBAUDIO_COMPACT_ENV", "0") != "1"):
            # per-LANE spliced envelopes instead of per-voice rows: K dense
            # rows in xs, read verbatim by the kernel (no device-side
            # selection; see _LaneEnvParam).  WEBAUDIO_COMPACT_ENV=1 opts
            # into the analytic-segment study path instead (per-voice rows
            # + compact tables).
            self.lane_env = True
            for k in range(self.lane_plan.K):
                self._params[f"lane{k}.gain"] = _LaneEnvParam(
                    self.lane_plan, k, gains)
        else:
            for i, g in enumerate(gains):
                if g is not None:
                    self._params[f"v{i}.gain"] = g.params["gain"]

    @property
    def params(self):
        return self._params

    def foreign_params(self):
        return {}

    def output_channel_count(self, input_counts):
        if self.panners[0] is not None:
            return [2]
        if isinstance(self.kind, tuple) and self.kind[0] == "bufsrc":
            return [self.sources[0].buffer.number_of_channels]
        return [1]

    def make_kernel(self, rc):
        return _FusedVoicesKernel(self, rc)


class _FusedVoicesKernel:
    """(V, B) vectorization of _OscillatorKernel x GainNode semantics
    (see nodes/oscillator.py:34-108; reference oscillator.rs:419-560)."""

    # read only via staged resources: data_host feeds data_rows/edge_vals/
    # window layouts; start_times feeds the staged offset_pos/delta_elapsed
    # and lane tables.  Same-shape different-value banks may bucket together
    # in MixedGraphBatch (their staged leaves stack per instance).
    _fp_staged_attrs = ("data_host", "start_times")

    def __init__(self, node: _FusedVoicesNode, rc):
        from ..nodes.oscillator import OscillatorType

        self.n = node
        self.fs = rc.sample_rate
        self.block_frames = rc.block_frames
        self.kind = node.kind
        self.is_const_src = node.kind == "const_src"
        self.is_bufsrc = (isinstance(node.kind, tuple)
                          and node.kind[0] == "bufsrc")
        self.is_custom = (not self.is_const_src and not self.is_bufsrc
                          and node.kind == OscillatorType.CUSTOM)
        self.V = len(node.sources)
        self.win_Qs = 0        # windowed-read geometry (_pick_window)
        self.win_W = 0
        self.has_gain = node.gains[0] is not None
        self.has_filter = node.filters[0] is not None
        self.has_pan = node.panners[0] is not None
        self.has_shaper = node.shapers[0] is not None
        fs = rc.sample_rate
        if self.has_shaper:
            self.curves = np.stack(
                [np.asarray(w.curve, np.float32) for w in node.shapers])
        if self.has_pan:
            # per-voice constant equal-power gains, mono input path
            # (nodes/stereo_panner.py:31-36)
            pans = np.asarray(
                [np.clip(np.float32(p.params["pan"]._timeline.intrinsic_value),
                         -1.0, 1.0) for p in node.panners], np.float32)
            x = (pans + 1.0) * np.float32(0.5)
            self.pan_gl = np.sin((1.0 - x) * np.float32(np.pi / 2.0)
                                 ).astype(np.float32)
            self.pan_gr = np.sin(x * np.float32(np.pi / 2.0)
                                 ).astype(np.float32)

        if self.has_filter:
            # per-voice constant-coefficient biquads -> truncated IRs ->
            # one partitioned-convolution bank with voices as channels
            # (mirrors _BiquadLTIKernel, nodes/biquad_filter.py:154-178)
            from ..nodes.biquad_filter import _np_coefs, _computed_freq
            from ..ops import fft_conv, recurrence
            self.partition = fft_conv.choose_partition(rc.block_frames)
            spectra = []
            for fl in node.filters:
                fp = fl.params
                f = _computed_freq(
                    np.float64(np.float32(
                        fp["frequency"]._timeline.intrinsic_value)),
                    np.float64(np.float32(
                        fp["detune"]._timeline.intrinsic_value)))
                b0, b1, b2, a1, a2 = _np_coefs(
                    fl._type, fs, f, fp["gain"]._timeline.intrinsic_value,
                    fp["q"]._timeline.intrinsic_value)
                h = recurrence.iir_impulse_response(
                    [b0, b1, b2], [1.0, a1, a2])
                spectra.append(fft_conv.partition_ir(h, self.partition)[0])
            kmax = max(sp.shape[0] for sp in spectra)
            stack = np.zeros((self.V, kmax, self.partition + 1), np.complex64)
            for i, sp in enumerate(spectra):
                stack[i, :sp.shape[0]] = sp
            self.h_stack = stack
            self.kparts = kmax

        starts, stops, ratios = [], [], []
        for o in node.sources:
            start, stop = o._schedule_frames(fs)
            starts.append(min(start, 2**31 - 1))
            stops.append(min(stop, 2**31 - 1))
            ratios.append(0.0 if start >= 2**31 - 1
                          else float(start - o._start_time * fs))
        self.starts = np.asarray(starts, np.int32)
        self.stops = np.asarray(stops, np.int32)
        self.ratios = np.asarray(ratios, np.float64)
        if self.is_custom:
            self.tables = np.stack(
                [np.asarray(o._periodic_wave.as_array(), np.float32)
                 for o in node.sources])
        self.use_lanes = False
        self.lane_env = node.lane_env
        if self.is_bufsrc:
            buf = node.sources[0].buffer
            self.buf_len = buf.length
            self.buf_rate = buf.sample_rate
            self.buf_duration = buf.length / buf.sample_rate
            self.data_host = buf.to_array()  # (C, L) shared by all voices
            # the lane plan (and every schedule-derived host array) comes
            # from the node, computed at fuse time — the same object whose
            # lane structure shaped the node's param declaration
            lp = node.lane_plan if node.lane_plan is not None else \
                _plan_grain_lanes(node.sources, fs)
            self.starts = lp.starts
            self.stops = lp.stops
            self.rates = lp.rates
            self.offsets = lp.offsets
            self.durations = lp.durations
            self.start_times = lp.start_times
            self.offset_pos = lp.offset_pos
            self.delta_elapsed = lp.delta_elapsed
            self.dur_end = lp.dur_end
            self.use_lanes = lp.use_lanes
            if self.use_lanes:
                self.K = lp.K
                self.lane_aligned = lp.aligned
                self.lane_start = lp.lane_start
                self.lane_end = lp.lane_end
                self.lane_voice = lp.lane_voice
                self._pick_window()

        plans = rc.param_plans

        def classify(alias_fmt, pobj_of):
            """-> (const_values (V,) f32 with dense slots 0, dense_pos,
                   n_dense) respecting row order == alias order."""
            const = np.zeros(self.V, np.float32)
            dense_pos = []
            for i in range(self.V):
                plan = plans[alias_fmt.format(i)]
                p = pobj_of(i)
                if plan.is_constant:
                    const[i] = np.float32(
                        min(max(plan.scalar, p.min_value), p.max_value))
                else:
                    dense_pos.append(i)
            return const, np.asarray(dense_pos, np.int32)

        if self.is_bufsrc:
            self.all_const_freq = True  # playhead is time-indexed
        elif self.is_const_src:
            self.off_const, self.off_dense = classify(
                "v{}.offset", lambda i: node.sources[i].params["offset"])
            o0 = node.sources[0].params["offset"]
            self.off_lim = (o0.min_value, o0.max_value)
            self.all_const_freq = True  # no phase state at all
        else:
            self.freq_const, self.freq_dense = classify(
                "v{}.frequency",
                lambda i: node.sources[i].params["frequency"])
            self.det_const, self.det_dense = classify(
                "v{}.detune", lambda i: node.sources[i].params["detune"])
            p0 = node.sources[0].params["frequency"]
            self.freq_lim = (p0.min_value, p0.max_value)
            d0 = node.sources[0].params["detune"]
            self.det_lim = (d0.min_value, d0.max_value)
            self.all_const_freq = (len(self.freq_dense) == 0
                                   and len(self.det_dense) == 0)
        self.compact_env = None
        if self.has_gain and self.lane_env:
            # gains compiled into spliced per-lane rows (_LaneEnvParam):
            # the kernel reads the (K, B) xs slice verbatim
            g0 = node.gains[0].params["gain"]
            self.gain_lim = (g0.min_value, g0.max_value)
            self.gain_dense = np.asarray([], np.int32)
        elif self.has_gain:
            self.gain_const, self.gain_dense = classify(
                "v{}.gain", lambda i: node.gains[i].params["gain"])
            g0 = node.gains[0].params["gain"]
            self.gain_lim = (g0.min_value, g0.max_value)
            self._build_compact_env(rc)
        if (self.all_const_freq and not self.is_const_src
                and not self.is_bufsrc):
            # bit-identical to _OscillatorKernel's host math
            # (nodes/oscillator.py make_kernel: f32 f * exp2(d / 1200))
            f = self.freq_const.astype(np.float32)
            d = self.det_const.astype(np.float32)
            self.computed_const = (
                f * np.exp2(d / np.float32(1200.0))).astype(np.float32)

    _ENV_MAX_SEGS = 12

    def _build_compact_env(self, rc):
        """Compact piecewise envelope tables for the grain bank.

        Grain envelopes are short const/linear-ramp timelines, yet the
        dense-param path streams one full-length (B,) row per voice
        (400 envelope rows = ~700 MB of automation per granular render)
        and selects rows per quantum.  When EVERY gain timeline walks to
        <= _ENV_MAX_SEGS const/linear segments, the kernel instead
        evaluates the envelope analytically from per-voice segment tables
        (begin frame, v0, v1, t0, 1/duration) — the packed dense rows
        stay allocated but are never read (no steady-state cost), so
        checkpoints / re-traces / the automation state machine are
        untouched.  WEBAUDIO_COMPACT_ENV=0 opts out (required if
        GraphBatch.override_param must target these envelope rows)."""
        import os

        from .. import automation as _automation

        self.compact_env = None
        if not self.is_bufsrc or not len(self.gain_dense):
            return
        # OPT-IN: analytically exact and it removes ~700 MB of dense-row
        # streaming, but the in-situ TPU measurement (granular_ablate.py
        # session 3: 419x vs 526x) shows the per-segment f64 phase math +
        # per-segment table gathers cost MORE than the per-quantum
        # row-gather default on v5e.  Kept as a numerically-verified
        # basis for a future split-precision evaluation.
        if os.environ.get("WEBAUDIO_COMPACT_ENV", "0") != "1":
            return
        S = self._ENV_MAX_SEGS
        n = self.n
        V = self.V
        pad_len = -(-rc.total_frames // rc.block_frames) * rc.block_frames
        begins = np.full((V, S), 2**31 - 1, np.int64)
        lin = np.zeros((V, S), bool)
        v0s = np.zeros((V, S), np.float32)
        v1s = np.zeros((V, S), np.float32)
        t0s = np.zeros((V, S), np.float64)
        idur = np.zeros((V, S), np.float64)
        for i in range(V):
            p = n.gains[i].params["gain"]
            segs: list = []
            _automation.compile_timeline(
                p._timeline.snapshot(), rc.sample_rate, pad_len,
                is_a_rate=True, start_frame=rc.start_frame,
                segments_out=segs)
            if len(segs) > S or any(s.kind not in ("const", "linear")
                                    for s in segs):
                return  # not compactable: keep the dense-row path
            for j, s in enumerate(segs):
                begins[i, j] = s.begin
                if s.kind == "linear":
                    lin[i, j] = True
                    v0s[i, j] = np.float32(s.v0)
                    # f64 difference then f32 cast, exactly as the dense
                    # evaluator's np.float32(v1 - v0)
                    v1s[i, j] = np.float32(np.float64(s.v1)
                                           - np.float64(s.v0))
                    t0s[i, j] = s.t0
                    idur[i, j] = 1.0 / s.duration
                else:
                    v0s[i, j] = np.float32(s.v0)
        self.compact_env = {
            "env_begin": np.minimum(begins, 2**31 - 1).astype(np.int32),
            "env_lin": lin,
            "env_v0": v0s,
            "env_dv": v1s,
            "env_t0": t0s,
            "env_idur": idur,
        }

    def _compact_env_eval(self, r, v, tq, t64):
        """Evaluate the compact envelopes for voice ids `v` (K, nq):
        tq (nq, Q) i32 global frames (exact segment activation), t64
        (nq, Q) f64 seconds (phase math) -> (K, B) f32 unclipped
        intrinsic, same formulas as automation._evaluate_segments."""
        K, nq = v.shape
        Q = tq.shape[1]
        t = t64[None]                                          # (1, nq, Q)
        val = jnp.zeros((K, nq, Q), jnp.float32)
        for s in range(self._ENV_MAX_SEGS):
            beg = r["env_begin"][v][:, :, s][..., None]        # (K, nq, 1)
            act = tq[None] >= beg                              # exact frames
            v0 = r["env_v0"][v][:, :, s][..., None]
            is_lin = r["env_lin"][v][:, :, s][..., None]
            phase = ((t - r["env_t0"][v][:, :, s][..., None])
                     * r["env_idur"][v][:, :, s][..., None]
                     ).astype(jnp.float32)
            linv = r["env_dv"][v][:, :, s][..., None] * phase + v0
            seg_val = jnp.where(is_lin, linv, v0)
            val = jnp.where(act, seg_val, val)
        return val.reshape(K, nq * Q)

    def _pick_window(self):
        """Choose the windowed-read geometry (sub-block Qs, window W).

        The lane path's per-sample pair gathers cost ~7 ns per gathered
        row on v5e (descriptor-latency-bound) — the granular bench's
        residual.  Instead, each lane's read span over a Qs-sample
        sub-block is covered by ONE (C, W) contiguous window slice, and
        per-sample selection + lerp becomes a (Qs, W) two-hot matmul on
        the MXU (the same formulation as the waveshaper curve lookup,
        nodes/waveshaper.py apply_curve — bit-identical to gather+lerp at
        HIGHEST precision).  HBM cost goes from 16 B/descriptor-latency
        per sample to ~W/Qs f32 lanes of streamed one-hot per sample.

        Larger Qs amortizes W toward Qs*|rate| (W/Qs -> rmax); the cap
        keeps the window in comfortable VMEM tiles.  Rates too large for
        a bounded window fall back to the gather path.
        """
        import os

        # Mode selection (see nodes/buffer_source._pick_window): 'grouped'
        # (default) amortizes one gathered row over g samples with an
        # elementwise lane select — the fastest measured formulation;
        # 'window' keeps the Pallas two-hot kernel (slower in situ on the
        # tunneled v5e: grid serialization); 'gather' forces per-sample
        # pair gathers.  The group/window is capped at one quantum: a
        # lane's grain identity (hi/lo variant) changes at quantum
        # boundaries and only one grain's span is monotone.
        mode = os.environ.get("WEBAUDIO_GRAIN_READ", "auto")
        self.win_Qs = 0
        self.win_W = 0
        self.read_mode = "gather"
        if mode == "gather" or not self.use_lanes:
            return
        from ..ops.grain_read import pick_group, pick_window

        ratio = self.buf_rate / self.fs
        rmax = float(np.max(np.abs(self.rates))) * ratio
        C = self.data_host.shape[0]
        if mode in ("auto", "grouped", "grouped_t", "grouped_pl",
                    "grouped_dot", "grouped_t2", "grouped_v", "fused"):
            g, w = pick_group(rmax, C, self.buf_len, self.block_frames)
            # 'fused' = whole-bank VMEM kernel (playhead + masks +
            # select + edge + envelope in one pass; probe_hlo2 showed
            # the XLA lane path materializing ~1.67 GB/render of
            # full-length intermediates on the 800-grain case).  It
            # runs its own WIDE geometry (g=32 halves the gather
            # descriptors: kernel path 2.25 ms vs 3.50 ms at g=16 —
            # benches/probe_gf3.py sweep).  Eligibility: aligned packing
            # (single hi variant), per-lane envelope rows, <= 2
            # channels, and no ablation study mode (those instrument
            # the XLA path).
            gw, ww = pick_group(rmax, C, self.buf_len,
                                self.block_frames, wide=True)
            fused_ok = (bool(gw) and self.lane_aligned and self.lane_env
                        and self.has_gain and C <= 2
                        and not os.environ.get("WEBAUDIO_GRAIN_ABLATE"))
            if mode == "fused" and not fused_ok:
                mode = "grouped_t"
            if mode == "fused":
                self.win_Qs, self.win_W = gw, ww
                self.read_mode = mode
                return
            if g:
                self.win_Qs, self.win_W = g, w
                # 'auto': the Pallas VMEM select on TPU backends whose
                # Mosaic accepts it (keeps the (w, C, s_tot) broadcast
                # expansion in a register accumulator; in-situ 2026-08-18
                # probe: wins both densities at both depths, bit-exact on
                # chip — ops/grain_read.grouped_v_supported), else the
                # transposed XLA select (sample axis minor — full 128-lane
                # tiles; the straight (R*S, g, w) layout ran its fused
                # select at ~w/128 lane utilization).
                # 'grouped_pl' = Pallas packed select (opt-in study mode;
                # needs C<=2, which pick_group's 32-lane bound implies
                # only for the row width — check channels here)
                if mode == "grouped_pl" and C > 2:
                    mode = "grouped_t"
                if mode == "auto":
                    from ..ops.grain_read import (grain_fused_supported,
                                                  grouped_v_supported)

                    if fused_ok and grain_fused_supported():
                        # re-enter with the wide fused geometry
                        self.win_Qs, self.win_W = gw, ww
                        self.read_mode = "fused"
                        return
                    mode = ("grouped_v" if grouped_v_supported()
                            else "grouped_t")
                self.read_mode = mode
            return
        if mode == "window":
            self.win_Qs, self.win_W = pick_window(rmax, self.block_frames)
            if self.win_W:
                self.read_mode = "window"

    def vector_params(self):
        """Contiguous packed-row groups (compile_graph slices each group
        from xs_params in one op instead of 3V gathers)."""
        if self.is_bufsrc:
            if self.lane_env:
                return {"gain": [f"lane{k}.gain" for k in range(self.K)]}
            groups = {}
        elif self.is_const_src:
            groups = {"offset": [f"v{i}.offset" for i in range(self.V)]}
        else:
            groups = {
                "frequency": [f"v{i}.frequency" for i in range(self.V)],
                "detune": [f"v{i}.detune" for i in range(self.V)],
            }
        if self.has_gain:
            groups["gain"] = [f"v{i}.gain" for i in range(self.V)]
        return groups

    def resources(self):
        from ..ops.bufread import edge_vals, pair_rows

        res = {"starts": self.starts, "stops": self.stops}
        if self.is_bufsrc:
            res["data_rows"] = pair_rows(self.data_host)
            res["edge_vals"] = edge_vals(self.data_host)  # non-loop chains
            res["rates"] = self.rates
            res["offsets"] = self.offsets
            res["durations"] = self.durations
            if not self.use_lanes:
                # closed-form playhead constants for the non-lane path,
                # staged (NOT baked into the trace) so MixedGraphBatch can
                # stack them per instance: two banks that differ only in
                # per-voice start offsets/times must not share one trace's
                # baked values
                fs64 = float(self.fs)
                started = self.starts < 2**31 - 1
                delta = np.where(started,
                                 self.starts / fs64 - self.start_times, 0.0)
                offset_eff = np.clip(self.offsets + delta * self.rates,
                                     0.0, self.buf_duration)
                res["offset_pos"] = offset_eff * self.buf_rate       # (V,) f64
                res["delta_elapsed"] = np.abs(delta * self.rates) * fs64
            if self.use_lanes:
                res["offset_pos"] = self.offset_pos
                res["dur_end"] = self.dur_end
                res["lane_start"] = self.lane_start
                res["lane_voice"] = self.lane_voice
                if self.win_W:
                    # contiguous window layout: (C, L + W + 2) with the
                    # end-of-buffer 'next tap' constant at column L
                    # (reached only by the +1 lerp lane when
                    # prev_i == L-1, i.e. the `beyond` case)
                    C, L = self.data_host.shape
                    dw = np.zeros((C, L + self.win_W + 2), np.float32)
                    dw[:, :L] = self.data_host
                    dw[:, L] = edge_vals(self.data_host)
                    if self.read_mode == "fused":
                        # FLAT pre-padded row matrix (N, Cwp): the 3-D
                        # (N, C, w) staging forced a 1.7 ms/render
                        # whole-resource layout copy on TPU (the gather
                        # wanted T(2,128) tiling; hlo_800_fused copy.5),
                        # and host-side Cw -> Cwp padding removes the
                        # 0.39 ms on-device pad of the gathered rows
                        from ..ops.grain_read import stage_rows

                        rows3 = stage_rows(dw, self.win_W)
                        N = rows3.shape[0]
                        Cw = rows3.shape[1] * rows3.shape[2]
                        Cwp = ((Cw + 7) // 8) * 8
                        flat = np.zeros((N, Cwp), np.float32)
                        flat[:, :Cw] = rows3.reshape(N, Cw)
                        res["data_rows_gf"] = flat
                    elif self.read_mode.startswith("grouped"):
                        from ..ops.grain_read import stage_rows

                        res["data_rows_g"] = stage_rows(dw, self.win_W)
                    else:
                        res["data_win"] = dw
                if self.has_gain and not self.lane_env:
                    # voice -> dense gain-row slot (-1 = constant gain)
                    lut = np.full(self.V, -1, np.int32)
                    for j, vv in enumerate(self.gain_dense):
                        lut[int(vv)] = j
                    res["gain_row"] = lut
                    if self.compact_env is not None:
                        res.update(self.compact_env)
        elif self.is_const_src:
            res["off_const"] = self.off_const
        else:
            res["ratios"] = self.ratios
            res["freq_const"] = self.freq_const
            res["det_const"] = self.det_const
            if self.all_const_freq:
                res["computed_const"] = self.computed_const
            if self.is_custom:
                res["tables"] = self.tables
        if self.has_gain and not self.lane_env:
            res["gain_const"] = self.gain_const
        if self.has_filter:
            res["h"] = self.h_stack
        if self.has_pan:
            res["pan_gl"] = self.pan_gl
            res["pan_gr"] = self.pan_gr
        if self.has_shaper:
            res["curves"] = self.curves
        return res

    def tail_frames(self):
        # closed-form phases are time-indexed; the cumsum path carries
        # unbounded phase state (same contract as _OscillatorKernel).
        # A fused filter stage carries (kparts+1)*partition frames of
        # partitioned-FDL history (same contract as _BiquadLTIKernel) —
        # without it, time-sharded shards would start with cold FDL state.
        if not self.all_const_freq:
            return None
        if self.has_filter:
            return (self.kparts + 1) * self.partition
        return 0

    def init_state(self):
        st = {"phase": jnp.zeros((self.V,), jnp.float64)}
        if self.has_filter:
            from ..ops import fft_conv
            fdl = fft_conv.PartitionedConvState.init(
                self.V, self.kparts, self.partition)
            st["fdl_spectra"] = fdl["spectra"]
            st["fdl_tail"] = fdl["tail"]
        return st

    def _windowed_fetch(self, data_win, pi, fr):
        """Two-hot windowed sample fetch (see _pick_window):
        out[c, k, n] = data[c, pi]*(1-fr) + data[c, pi+1]*fr, where column
        L of data_win carries the end-of-buffer edge constant.  pi (K, B)
        clipped to [0, L-1], monotonic within each Qs sub-block (one grain
        per variant per quantum); returns (C, K, B)."""
        import jax

        if self.read_mode == "grouped_t":
            from ..ops.grain_read import grouped_row_lerp_t

            return grouped_row_lerp_t(data_win, pi, fr, self.win_Qs,
                                      self.win_W)
        if self.read_mode == "grouped_pl":
            from ..ops.grain_read import grouped_row_lerp_pl

            return grouped_row_lerp_pl(data_win, pi, fr, self.win_Qs,
                                       self.win_W)
        if self.read_mode == "grouped_dot":
            from ..ops.grain_read import grouped_row_lerp_dot

            return grouped_row_lerp_dot(data_win, pi, fr, self.win_Qs,
                                        self.win_W)
        if self.read_mode == "grouped_t2":
            from ..ops.grain_read import grouped_row_lerp_t2

            return grouped_row_lerp_t2(data_win, pi, fr, self.win_Qs,
                                       self.win_W)
        if self.read_mode == "grouped_v":
            from ..ops.grain_read import grouped_row_lerp_v

            return grouped_row_lerp_v(data_win, pi, fr, self.win_Qs,
                                      self.win_W)
        if self.read_mode == "grouped":
            from ..ops.grain_read import grouped_row_lerp

            return grouped_row_lerp(data_win, pi, fr, self.win_Qs,
                                    self.win_W)
        from ..ops.grain_read import windowed_lerp

        return windowed_lerp(data_win, pi, fr, self.win_Qs, self.win_W)

    def _process_grain_lanes(self, scope, state, params):
        """Lane-packed grain rendering: (K, B) work instead of (V, B).

        Cost structure on TPU (honest fenced measurements): per-voice f64
        playhead math and HBM gathers dominate, so
        - the grain id is resolved per QUANTUM (searchsorted on (K, nq))
          plus one per-sample comparison — valid because lane packing
          keeps starts >= one quantum apart within a lane;
        - all per-voice scalars are gathered at TWO per-quantum candidates
          (the quantum-end grain and its predecessor) and selected per
          sample, instead of (K, B) gathers;
        - the playhead runs f64 only at quantum granularity (K, nq) and
          f32 within the quantum as (integer base, fractional offset) —
          within-quantum f32 error is <= B_q * rate * 2^-24 ~ 1e-5 samples.
        Output matches the (V, B) path to f32 summation order."""
        import jax
        from ..constants import RENDER_QUANTUM_SIZE as Q

        r = scope.node_resources
        fs = float(self.fs)
        B = scope.frames
        nq = B // Q
        t = scope.t_idx                                       # (B,) i32
        K, G = self.lane_start.shape
        ratio = self.buf_rate / fs
        L = self.buf_len

        tq = t.reshape(nq, Q)                                 # (nq, Q)
        t_end = tq[:, -1]                                     # (nq,)
        gid_hi = jax.vmap(
            lambda s: jnp.searchsorted(s, t_end, side="right") - 1
        )(r["lane_start"])                                    # (K, nq)

        krow = jnp.arange(K)[:, None]

        def variant(gid):
            """Gather all per-voice/grain scalars for one gid candidate."""
            ok = gid >= 0
            gc = jnp.clip(gid, 0, G - 1)
            gstart = r["lane_start"][krow, gc]                # (K, nq) i32
            v = r["lane_voice"][krow, gc]
            startv = r["starts"][v]
            stopv = jnp.minimum(r["stops"][v], r["dur_end"][v])
            rate64 = r["rates"][v] * ratio                    # f64 (K, nq)
            # f64 playhead at the quantum's first sample, split into
            # integer sample + f32 fraction
            n0 = (tq[None, :, 0] - startv).astype(jnp.float64)
            pos0 = r["offset_pos"][v] + rate64 * n0
            base_i = jnp.floor(pos0)
            base_f = (pos0 - base_i).astype(jnp.float32)
            fields = {
                "ok": ok, "gstart": gstart, "startv": startv,
                "stopv": stopv, "base_i": base_i.astype(jnp.int32),
                "base_f": base_f, "rate32": rate64.astype(jnp.float32),
                "v": v,
            }
            if self.has_gain and not self.lane_env:
                fields["grow"] = r["gain_row"][v]
                fields["gconst"] = r["gain_const"][v]
            return fields

        hi = variant(gid_hi)
        if self.read_mode == "fused":
            # fully-fused VMEM bank: per-sample playhead, schedule/bounds
            # masks, two-hot row select, end-of-buffer edge correction,
            # and the per-lane envelope all run inside one Pallas kernel
            # on (g, M) group tiles; XLA-side work is group-granular
            # only (ops/grain_read.grain_bank_fused).  Eligibility
            # (aligned packing + lane_env + C <= 2) is enforced at mode
            # selection in _pick_window.
            from ..ops.grain_read import grain_bank_fused

            out = grain_bank_fused(
                r["data_rows_gf"], t, hi["ok"].astype(jnp.float32),
                hi["startv"], hi["stopv"], hi["base_i"], hi["base_f"],
                hi["rate32"], params.get("gain"), r["edge_vals"],
                g=self.win_Qs, w=self.win_W, L=L, Q=Q,
                gl0=float(self.gain_lim[0]), gl1=float(self.gain_lim[1]))
            return state, [out]
        if self.lane_aligned:
            # aligned packing: the quantum-end grain is the quantum's ONLY
            # possibly-audible grain (any predecessor's frames < ends all
            # lie in earlier quanta), so its fields broadcast per quantum
            # — pre-start samples are masked by `sched` below and the
            # predecessor fetch/select machinery vanishes entirely
            lo = use_hi = None

            def sel(name):
                return jnp.broadcast_to(
                    hi[name][..., None], (K, nq, Q))
        else:
            lo = variant(gid_hi - 1)

            # per-sample: the quantum-end grain applies from its start
            # sample on; before that, the predecessor (legacy packing
            # guarantees at most one switch per quantum per lane)
            use_hi = tq[None] >= hi["gstart"][..., None]      # (K, nq, Q)

            def sel(name):
                a, b = hi[name], lo[name]
                return jnp.where(use_hi, a[..., None], b[..., None])

        ok = sel("ok")
        startv = sel("startv")
        stopv = sel("stopv")
        base_i = sel("base_i")
        base_f = sel("base_f")
        rate32 = sel("rate32")

        tkb = tq[None]                                        # (1, nq, Q)
        sched = ok & (tkb >= startv) & (tkb < stopv)
        j = jnp.arange(Q, dtype=jnp.float32)                  # within-quantum
        delta = base_f + rate32 * j[None, None, :]            # (K, nq, Q) f32
        dfloor = jnp.floor(delta)
        idx = base_i + dfloor.astype(jnp.int32)               # sample index
        frac = delta - dfloor
        valid = sched & (idx >= 0) & (idx <= L - 1)

        if self.win_W:
            # windowed two-hot read: fetch each variant's samples through
            # per-(lane, sub-block) contiguous windows + an MXU two-hot
            # contraction, then select per sample — bit-identical to the
            # pair-gather path but free of per-sample HBM descriptors
            def smp_of(var):
                d = var["base_f"][..., None] + \
                    var["rate32"][..., None] * j[None, None, :]
                dfl = jnp.floor(d)
                iv = var["base_i"][..., None] + dfl.astype(jnp.int32)
                frv = (d - dfl).reshape(K, B)
                piv = jnp.clip(iv, 0, L - 1).reshape(K, B)
                s = self._windowed_fetch(
                    r["data_rows_g" if self.read_mode.startswith("grouped")
                      else "data_win"], piv, frv)
                cond = (piv + 1 >= L) & ((frv >= 1.0 - 1e-6) | (piv == 0))
                return s - r["edge_vals"][:, None, None] * \
                    jnp.where(cond, frv, 0.0)[None]

            # WEBAUDIO_GRAIN_ABLATE: measurement-only study modes (WRONG
            # output; benches/granular_ablate.py) isolating the cost of
            # the second (predecessor-grain) fetch and of the fetch stage
            # itself — pre-switch samples in switching quanta are the only
            # consumers of the lo variant.
            _ablate = os.environ.get("WEBAUDIO_GRAIN_ABLATE", "")
            if _ablate == "no_read":
                smp = jnp.broadcast_to(
                    frac.reshape(K, B)[None],
                    (r["edge_vals"].shape[0], K, B))
            elif self.lane_aligned or _ablate == "single_variant":
                smp = smp_of(hi)
            else:
                smp = jnp.where(use_hi.reshape(K, B)[None],
                                smp_of(hi), smp_of(lo))
        else:
            prev_i = jnp.clip(idx, 0, L - 1).reshape(K, B)
            fr = frac.reshape(K, B)
            beyond = prev_i + 1 >= L
            # both lerp taps in one row gather (ops/bufread.py); the
            # end-of-buffer extrapolation 2*x[L-1]-x[L-2] is a staged
            # constant
            from ..ops.bufread import gather_pairs
            a, b = gather_pairs(r["data_rows"], prev_i)       # (C, K, B)
            edge = jnp.where(((fr >= 1.0 - 1e-6) | (prev_i == 0))[None],
                             0.0, r["edge_vals"][:, None, None])
            b = jnp.where(beyond[None], edge, b)
            smp = a * (1.0 - fr)[None] + b * fr[None]
        voices = jnp.where(valid.reshape(K, B)[None], smp, 0.0)

        if self.has_gain and self.lane_env:
            # per-LANE spliced envelope rows (_LaneEnvParam): gain is the
            # (K, B) xs slice itself — no device-side selection, and xs
            # shrinks from V rows to K (the 400-row granular case streamed
            # ~700 MB of automation per render through reshape/transpose/
            # row-gather machinery; the K-row splice removes all of it)
            g = jnp.clip(params.get("gain"),
                         self.gain_lim[0], self.gain_lim[1])
            voices = voices * g[None]
        elif self.has_gain:
            grow = sel("grow").reshape(K, B)
            gconst = sel("gconst").reshape(K, B)
            if self.compact_env is not None:
                # analytic envelope evaluation from compact per-voice
                # segment tables (_build_compact_env): no dense-row
                # streaming or selection at all
                t64 = tq.astype(jnp.float64) / jnp.float64(fs)
                dv_hi = self._compact_env_eval(r, hi["v"], tq, t64)
                if self.lane_aligned:
                    dense = dv_hi
                else:
                    dv_lo = self._compact_env_eval(r, lo["v"], tq, t64)
                    dense = jnp.where(use_hi.reshape(K, B),
                                      dv_hi, dv_lo)
                g = jnp.clip(dense, self.gain_lim[0], self.gain_lim[1])
            elif len(self.gain_dense):
                # per-quantum envelope-row selection as a per-QUANTUM row
                # gather: the row id is constant within (variant, quantum),
                # so K*nq descriptors of one quantum each fetch every
                # needed row.  (The previous one-hot batched contraction
                # over all D rows lowered to a broadcast-reduce that
                # materialized (nq, K, D, Q) — ~7 GB per granular render,
                # isolated as ~29% of the case by granular_ablate.py.
                # A PER-SAMPLE (K, B) gather is still the slow option;
                # per-quantum rows are 512 B slices.)
                rows = params.get("gain")                     # (D, B)
                D = rows.shape[0]
                flat = rows.reshape(D, nq, Q).transpose(1, 0, 2) \
                    .reshape(nq * D, Q)                       # (nq*D, Q)
                qidx = jnp.arange(nq, dtype=jnp.int32)[None, :]  # (1, nq)

                def qdense(growq):                            # (K, nq) i32
                    g_ = jnp.clip(growq, 0, D - 1)
                    sel_rows = flat[(qidx * D + g_).reshape(-1)]
                    return sel_rows.reshape(K, nq, Q)

                if self.lane_aligned:
                    dense = qdense(hi["grow"]).reshape(K, B)
                else:
                    dense = jnp.where(use_hi, qdense(hi["grow"]),
                                      qdense(lo["grow"])).reshape(K, B)
                dense = jnp.clip(dense, self.gain_lim[0], self.gain_lim[1])
                g = jnp.where(grow >= 0, dense, gconst)
            else:
                g = gconst
            voices = voices * g[None]
        out = jnp.sum(voices, axis=1, dtype=jnp.float32)      # (C, B)
        return state, [out]

    def _mixdown(self, voices, r):
        """(V, B) voices -> (1, B) mono sum, or (2, B) per-voice
        equal-power stereo spread when the chains end in panners."""
        if self.has_pan:
            left = jnp.sum(voices * r["pan_gl"][:, None], axis=0,
                           dtype=jnp.float32)
            right = jnp.sum(voices * r["pan_gr"][:, None], axis=0,
                            dtype=jnp.float32)
            return jnp.stack([left, right]).astype(jnp.float32)
        return jnp.sum(voices, axis=0, dtype=jnp.float32)[None, :]

    def _full(self, const, dense_pos, dense_rows, lim, B):
        """(V, B) param matrix from per-voice constants + packed rows."""
        if len(dense_pos) == self.V and np.array_equal(
                np.asarray(dense_pos), np.arange(self.V)):
            # every voice is dense in row order (the common every-voice-
            # enveloped case): the packed rows ARE the matrix — skip the
            # broadcast + 33 MB scatter
            return jnp.clip(dense_rows, lim[0], lim[1])
        full = jnp.broadcast_to(const[:, None], (self.V, B))
        if len(dense_pos):
            rows = jnp.clip(dense_rows, lim[0], lim[1])
            full = full.at[dense_pos].set(rows)
        return full

    def process(self, scope, state, inputs, params):
        from ..ops import oscillator as osc_ops

        r = scope.node_resources
        fs = self.fs
        B = scope.frames
        t = scope.t_idx                                        # (B,) i32
        mask = (t[None, :] >= r["starts"][:, None]) & (
            t[None, :] < r["stops"][:, None])                  # (V, B)

        if self.is_bufsrc and self.use_lanes:
            return self._process_grain_lanes(scope, state, params)

        if self.is_bufsrc:
            # vectorized constant-rate closed-form playhead
            # (nodes/buffer_source.py _process_closed_form); the playhead
            # constants (offset_pos, delta_elapsed) come through the staged
            # resources, never baked into the trace (see resources())
            fs64 = float(fs)
            ratio = self.buf_rate / fs64
            n_rel = (t[None, :] - r["starts"][:, None]).astype(jnp.float64)
            # sub-sample starts contribute |delta*rate| of elapsed duration
            # up front (nodes/buffer_source.py, reference rs:689)
            dur_ok = (n_rel * jnp.abs(r["rates"])[:, None]
                      + r["delta_elapsed"][:, None]
                      < r["durations"][:, None] * fs64)
            active = mask & dur_ok
            pos = (r["offset_pos"][:, None]
                   + (r["rates"] * ratio)[:, None] * n_rel)   # (V, B) f64
            valid = active & (pos >= 0.0) & (pos < float(self.buf_len))
            floored = jnp.floor(pos)
            prev_i = jnp.clip(floored.astype(jnp.int32), 0, self.buf_len - 1)
            frac = (pos - floored).astype(jnp.float32)
            # both lerp taps in one row gather (ops/bufread.py)
            from ..ops.bufread import gather_pairs
            a, b = gather_pairs(r["data_rows"], prev_i)       # (C, V, B)
            # non-loop end-of-buffer rule (nodes/buffer_source.py _fetch,
            # reference rs:795-815): zero when k~=1 / single-sample buffer,
            # else linear extrapolation from the last two samples (a
            # staged constant, since it only applies at prev_i == L-1)
            beyond = prev_i + 1 >= self.buf_len
            edge = jnp.where(((frac >= 1.0 - 1e-6) | (prev_i == 0))[None],
                             0.0, r["edge_vals"][:, None, None])
            b = jnp.where(beyond[None], edge, b)
            smp = a * (1.0 - frac)[None] + b * frac[None]     # (C, V, B)
            voices = jnp.where(valid[None], smp, 0.0)
            if self.has_gain:
                gain = self._full(r["gain_const"], self.gain_dense,
                                  params.get("gain"), self.gain_lim, B)
                voices = voices * gain[None]
            out = jnp.sum(voices, axis=1, dtype=jnp.float32)  # (C, B)
            return state, [out]

        if self.is_const_src:
            off = self._full(r["off_const"], self.off_dense,
                             params.get("offset"), self.off_lim, B)
            voices = jnp.where(mask, off, 0.0)
            new_state = dict(state)
            if self.has_shaper:
                from ..nodes.waveshaper import apply_curve
                voices = jax.vmap(apply_curve)(r["curves"], voices)
            if self.has_filter:
                from ..ops import fft_conv
                st = {"spectra": state["fdl_spectra"],
                      "tail": state["fdl_tail"]}
                st, voices = fft_conv.partitioned_conv_block(
                    st, voices.astype(jnp.float32), r["h"], self.partition)
                new_state["fdl_spectra"] = st["spectra"]
                new_state["fdl_tail"] = st["tail"]
            if self.has_gain:
                gain = self._full(r["gain_const"], self.gain_dense,
                                  params.get("gain"), self.gain_lim, B)
                voices = voices * gain
            return new_state, [self._mixdown(voices, r)]

        if self.all_const_freq:
            computed = r["computed_const"][:, None]            # (V, 1)
            incr_host = (r["computed_const"].astype(jnp.float64) / fs)
            # closed-form phase, f64 only at QUANTUM granularity (V, nq)
            # and f32 within the quantum: |incr*127| < 2^7 so the f32
            # rebase error is <= ~4e-7 of a cycle (vs ~2x wall-clock for
            # a full (V, B) f64 mod on TPU's software f64)
            from ..constants import RENDER_QUANTUM_SIZE as _Q
            nq = B // _Q
            q0 = t.reshape(nq, _Q)[:, 0]
            n0 = (q0[None, :] - r["starts"][:, None]).astype(jnp.float64)
            ph0 = jnp.mod((n0 + r["ratios"][:, None]) * incr_host[:, None],
                          1.0).astype(jnp.float32)             # (V, nq)
            j = jnp.arange(_Q, dtype=jnp.float32)
            incr32 = incr_host.astype(jnp.float32)
            ph = (ph0[:, :, None]
                  + incr32[:, None, None] * j[None, None, :])  # (V, nq, Q)
            phase = (ph - jnp.floor(ph)).reshape(self.V, B)
            incr = jnp.broadcast_to(incr32[:, None], (self.V, B))
            carry = state["phase"]
            sine_factors = (ph0, incr32, j, nq)
        else:
            freq = self._full(r["freq_const"], self.freq_dense,
                              params.get("frequency"), self.freq_lim, B)
            det = self._full(r["det_const"], self.det_dense,
                             params.get("detune"), self.det_lim, B)
            computed = osc_ops.computed_frequency(freq, det)   # (V, B)
            incr64 = computed.astype(jnp.float64) / fs
            incr = incr64.astype(jnp.float32)
            at_start = t[None, :] == r["starts"][:, None]
            corr = jnp.sum(jnp.where(at_start, incr64, 0.0),
                           axis=1) * r["ratios"]               # (V,)
            phase, carry = jax.vmap(osc_ops.accumulate_phase)(
                state["phase"], incr64, mask, corr)
            sine_factors = None

        from ..nodes.oscillator import OscillatorType
        if self.is_custom:
            wave = jax.vmap(osc_ops.wavetable_lookup)(
                phase, scope.node_resources["tables"])
        elif self.kind == OscillatorType.SINE:
            if sine_factors is not None:
                # sin(2pi(ph0 + incr*j)) via the angle-sum identity: the
                # per-sample transcendental drops to (V, nq) + (V, Q)
                # factors plus two multiplies (~2e-7 vs the direct sin)
                ph0_, incr32_, j_, nq_ = sine_factors
                two_pi = np.float32(2 * np.pi)
                sa = jnp.sin(two_pi * ph0_)[:, :, None]
                ca = jnp.cos(two_pi * ph0_)[:, :, None]
                bb = two_pi * incr32_[:, None] * j_[None, :]   # (V, Q)
                sb = jnp.sin(bb)[:, None, :]
                cb = jnp.cos(bb)[:, None, :]
                wave = (sa * cb + ca * sb).reshape(self.V, B)
            else:
                wave = osc_ops.sine(phase)
        elif self.kind == OscillatorType.SAWTOOTH:
            wave = osc_ops.sawtooth(phase, incr)
        elif self.kind == OscillatorType.SQUARE:
            wave = osc_ops.square(phase, incr)
        else:
            wave = osc_ops.triangle(phase)

        audible = jnp.abs(computed) < (fs / 2.0)
        voices = jnp.where(mask & audible, wave, 0.0)

        new_state = {"phase": carry}
        if self.has_shaper:
            from ..nodes.waveshaper import apply_curve
            voices = jax.vmap(apply_curve)(r["curves"], voices)
        if self.has_filter:
            from ..ops import fft_conv
            st = {"spectra": state["fdl_spectra"], "tail": state["fdl_tail"]}
            st, voices = fft_conv.partitioned_conv_block(
                st, voices.astype(jnp.float32), r["h"], self.partition)
            new_state["fdl_spectra"] = st["spectra"]
            new_state["fdl_tail"] = st["tail"]
        if self.has_gain:
            gain = self._full(r["gain_const"], self.gain_dense,
                              params.get("gain"), self.gain_lim, B)
            voices = voices * gain

        return new_state, [self._mixdown(voices, r)]
