"""Graph tracer/compiler: node topology -> one XLA computation.

This replaces the reference's per-quantum interpreted executor
(reference: src/render/graph.rs:490-587, src/render/thread.rs:260-396) with
trace-then-compile: the node DAG is ordered once, every node contributes a
pure ``process`` function, and the whole topology becomes a single block
function scanned over time with `lax.scan`:

    (states, frame0) , (param slices) -> (states', frame0+B), dest block

- Acyclic graphs use large blocks (DEFAULT_QUANTA_PER_BLOCK quanta) so each
  scan step is big enough to saturate the TPU.
- Graphs with feedback cycles render one quantum per step, matching the
  reference's >= 1-quantum cycle latency (delay.rs:535-542).
- AudioParam timelines arrive precompiled as dense tensors or baked scalars
  (see webaudio_tpu/automation.py); there is no event interpreter on the
  hot path.
"""

from __future__ import annotations

import math
import os
from dataclasses import dataclass, field
from typing import Any, Optional

import numpy as np
import jax
import jax.numpy as jnp

from ..constants import (
    RENDER_QUANTUM_SIZE, DEFAULT_QUANTA_PER_BLOCK, NotSupportedError,
)
from ..ops.mixing import (
    ChannelInterpretation, computed_number_of_channels, sum_inputs,
)
from .ir import Edge, order_graph


@dataclass
class RenderContext:
    """Static per-node compile info handed to `AudioNode.make_kernel`."""
    sample_rate: float
    block_frames: int
    input_channel_counts: list[int]
    output_channel_counts: list[int]
    in_cycle: bool = False
    total_frames: int = 0
    start_frame: int = 0
    # this node's compiled param timelines (name -> CompiledParam), so
    # kernels can pick const-specialized strategies and read baked values
    param_plans: dict = field(default_factory=dict)
    # per input port: does any edge feed it?  (the reference's
    # spec-compliant-worklet-inputs empty-vs-silent distinction,
    # worklet.rs:367-385)
    input_connected: list = field(default_factory=list)

    @property
    def dt(self) -> float:
        return 1.0 / self.sample_rate


class BlockScope:
    """Traced per-block values available to kernels (the analog of
    AudioWorkletGlobalScope, reference: src/render/processor.rs:20-27)."""

    __slots__ = ("frame0", "frames", "sample_rate", "dt", "_t_idx",
                 "node_resources")

    def __init__(self, frame0, frames: int, sample_rate: float):
        self.frame0 = frame0                  # traced i32 scalar
        self.frames = frames                  # static B
        self.sample_rate = sample_rate
        self.dt = 1.0 / sample_rate
        self._t_idx = None
        # per-node resource pytree (audio buffers, IR spectra, wavetables),
        # threaded through jit as arguments so device arrays are never
        # embedded as HLO constants (device->host readback is unavailable
        # on tunneled TPU backends, and constants bloat executables)
        self.node_resources = None

    @property
    def t_idx(self):
        """Global sample indices of this block, (B,) int32."""
        if self._t_idx is None:
            self._t_idx = self.frame0 + jnp.arange(self.frames, dtype=jnp.int32)
        return self._t_idx

    def active_mask(self, start_frame: int, stop_frame: int):
        """Sub-sample-exact scheduling mask: sample n is active iff
        n*dt >= start_time and n*dt < stop_time, reduced host-side to
        integer frame bounds (reference: constant_source.rs:232-249)."""
        t = self.t_idx
        return (t >= np.int32(min(start_frame, 2**31 - 1))) & (
            t < np.int32(min(stop_frame, 2**31 - 1)))


class Kernel:
    """Per-node functional processor.

    `process` maps (scope, state, inputs, params) -> (state', [outputs]).
    inputs: list over input ports of (C_in, B) f32 arrays (pre-mixed fan-in).
    params: dict name -> () or (B,) f32 (clamped, audio input summed).
    Cycle-breaker nodes implement `process_writer` / `process_reader`
    instead (reference's DelayWriter / DelayReader split,
    delay.rs:376-684)."""

    def init_state(self):
        return None

    def resources(self):
        """Static device data this kernel needs (numpy -> staged by the
        driver); read back in `process` via `scope.node_resources`."""
        return None

    def tail_frames(self):
        """How much history this kernel's state encodes, in frames, or
        None if unbounded/sequential (not time-shardable).  Kernels with a
        bounded tail can start from zero state `tail_frames` early and
        converge exactly — the basis of segment-parallel rendering
        (parallel/segments.py)."""
        return None

    def process(self, scope: BlockScope, state, inputs, params):
        raise NotImplementedError

    def process_writer(self, scope: BlockScope, state, inputs, params):
        raise NotImplementedError

    def process_reader(self, scope: BlockScope, state, params):
        raise NotImplementedError


@dataclass
class CompiledGraph:
    """A jitted render plan for one graph snapshot."""
    block_fn: Any
    order: list
    kernels: dict
    in_counts: dict
    out_counts: dict
    param_plan: dict          # (nid, pname) -> CompiledParam
    block_frames: int
    sample_rate: float
    n_dest_channels: int
    total_frames: int
    muted: set
    cycle_breakers: set
    jit_scan: Any = None
    scan_render: Any = None
    resource_cache: Any = None
    failed: dict = field(default_factory=dict)
    dense_params: list = field(default_factory=list)  # packed xs row order
    param_alias: dict = field(default_factory=dict)   # fused (nid,p) remaps
    param_objects: dict = field(default_factory=dict)  # (nid,p) -> AudioParam
    two_rate_m: int = 1        # inner sub-steps per block (1 = single-rate)
    inner_frames: int = 0      # delay-bounded inner block (frames)


def _propagate_channel_counts(nodes, edges):
    """Static fixpoint of the reference's dynamic per-quantum channel
    counting (graph.rs:524-535).  Counts only grow and are bounded by
    MAX_CHANNELS, so iteration converges."""
    out_counts = {nid: node.output_channel_count([1] * node.number_of_inputs)
                  for nid, node in nodes.items()}
    in_counts = {nid: [1] * node.number_of_inputs for nid, node in nodes.items()}
    in_edges = {nid: [[] for _ in range(node.number_of_inputs)]
                for nid, node in nodes.items()}
    for e in edges:
        if e.param is None and e.dst in in_edges and e.dst_input >= 0:
            in_edges[e.dst][e.dst_input].append(e)

    for _ in range(len(nodes) + 2):
        changed = False
        for nid, node in nodes.items():
            cfg = node._channel_config
            new_in = []
            for i in range(node.number_of_inputs):
                mx = 0
                for e in in_edges[nid][i]:
                    mx = max(mx, out_counts[e.src][e.src_output])
                new_in.append(computed_number_of_channels(cfg.mode, cfg.count, mx))
            new_out = node.output_channel_count(new_in)
            if new_in != in_counts[nid] or new_out != out_counts[nid]:
                changed = True
                in_counts[nid] = new_in
                out_counts[nid] = new_out
        if not changed:
            break
    return in_counts, out_counts, in_edges


def compile_graph(nodes: dict, edges: list[Edge], sample_rate: float,
                  total_frames: int, dest_id: int,
                  start_frame: int = 0,
                  quanta_per_block: Optional[int] = None,
                  force_dense_params: bool = False) -> CompiledGraph:
    """Trace a graph snapshot into a block function + scan driver."""
    from ..nodes.delay import DelayNode  # local import to avoid cycle
    from . import fusion as _fusion

    # rewrite homogeneous source chains into (V, B) fused banks before
    # anything looks at the topology (see graph/fusion.py)
    nodes, edges, param_alias = _fusion.fuse_sources(
        nodes, edges, dest_id, sample_rate=sample_rate)

    node_ids = list(nodes.keys())
    delay_ids = {nid for nid, n in nodes.items() if isinstance(n, DelayNode)}
    # ordering must also respect foreign-param subscriptions: if node X reads
    # node Y's param P, anything driving (Y, P) with audio must be ordered
    # before X (otherwise the signal is silently missing at X's gather)
    order_edges = list(edges)
    for xid, xnode in nodes.items():
        for alias, (src_node, pname) in xnode.foreign_params().items():
            for e in edges:
                if e.param == pname and e.dst == src_node.node_id:
                    order_edges.append(Edge(e.src, e.src_output, xid, -2))
    ordered = order_graph(node_ids, order_edges, delay_ids)

    total_quanta = -(-total_frames // RENDER_QUANTUM_SIZE)
    two_rate_m = 1          # inner sub-steps per block (two-rate compiler)
    inner_frames = None     # delay-bounded inner block (frames)
    fast_ids: set = set()   # nodes stepped at the inner rate
    if quanta_per_block is not None:
        qpb = min(quanta_per_block, total_quanta)
        if ordered.has_cycle:
            # explicit block sizes (RenderSession, online loop, segments)
            # must still respect the cycle-delay bound: a feedback read
            # inside one block would see unwritten ring samples.  Pick the
            # largest DIVISOR of the requested block within the bound so
            # callers stepping in multiples of their request stay aligned.
            bound = _cycle_delay_bound(nodes, edges, ordered.cycle_breakers,
                                       sample_rate)
            if os.environ.get("WEBAUDIO_CYCLE_BLOCKS", "auto") == "1":
                bound = 1
            if bound < qpb:
                qpb = next(d for d in range(bound, 0, -1)
                           if quanta_per_block % d == 0)
    elif ordered.has_cycle:
        # Feedback feeds back through the cycle-breaking delays; the spec
        # minimum latency is one quantum.  A CONSTANT delay of d frames
        # admits blocks up to d-1 (_cycle_safe_qpb proves it; the output is
        # bit-identical to one-quantum stepping, see
        # test_const_delay_cycle_runs_large_blocks_bit_exact).  Honest
        # fenced timing on TPU v5e: 41x -> 156x on the convolution-reverb
        # bench and 222x -> 453x on the delay network, plus ~15% on CPU.
        # WEBAUDIO_CYCLE_BLOCKS=1 opts back into one-quantum stepping.
        if os.environ.get("WEBAUDIO_CYCLE_BLOCKS", "auto") != "1":
            qpb = _cycle_safe_qpb(nodes, edges, ordered.cycle_breakers,
                                  sample_rate, total_quanta)
            # TWO-RATE: the delay bound applies only to nodes ON a cycle
            # (the reference's own writer/reader split exists precisely so
            # the rest of the graph is cycle-free, delay.rs:376-684,
            # graph.rs:418-487).  Step each broken SCC at the delay-bounded
            # rate inside an inner lax.scan while the acyclic majority
            # (sources, convolvers) runs m x larger outer blocks.  Inner
            # stepping is IDENTICAL to the flat scan for the cycle nodes,
            # so cycle semantics are bit-exact (test_two_rate).
            pow2_only = any(
                getattr(n, "block_constraint", lambda: None)() == "pow2"
                for n in nodes.values())
            if (qpb >= 2 and ordered.cycle_groups
                    and os.environ.get("WEBAUDIO_TWO_RATE", "1") != "0"
                    and not (pow2_only and (qpb & (qpb - 1)))
                    and _two_rate_eligible(nodes, edges, ordered)):
                fast_set = {nid for grp in ordered.cycle_groups
                            for (nid, _) in grp}
                if not pow2_only and \
                        os.environ.get("WEBAUDIO_INNER_FAST", "1") != "0":
                    # r5: choose (inner, m) JOINTLY (VERDICT r4 item 5).
                    # Only cycle members step at the inner rate, so the
                    # inner block is free up to the delay bound; picking
                    # it independently (largest <= bound) then m after
                    # can land on geometries that pad the outer render or
                    # shrink an outer convolver's FFT partitions.  The
                    # joint search charges padding, per-outer-step, and
                    # per-inner-substep costs together: the reverb moves
                    # from inner 64 x m 54 (one outer block) to
                    # inner 96 x m 36 — same single outer step and 16384
                    # partition content, 33% fewer inner substeps.
                    plan = _two_rate_plan(
                        nodes, edges, ordered.cycle_breakers, sample_rate,
                        total_quanta)
                    m = plan[1] if plan else 1
                    if m >= 2:
                        qpb_inner = plan[0]
                        two_rate_m = m
                        inner_frames = qpb_inner * RENDER_QUANTUM_SIZE
                        fast_ids = fast_set
                        qpb = qpb_inner * m
                else:
                    m = _two_rate_steps(nodes, total_quanta, qpb,
                                        pow2_only)
                    if m >= 2:
                        two_rate_m = m
                        inner_frames = qpb * RENDER_QUANTUM_SIZE
                        fast_ids = fast_set
                        qpb = qpb * m
        else:
            qpb = 1
    else:
        # pick the largest divisor of the total quantum count <= a
        # memory-aware cap, so the scan covers exactly ceil(T/128) quanta —
        # the same one-quantum padding semantics as the reference render
        # loop (thread.rs:278-295); stateful probe readbacks (analyser ring,
        # compressor reduction) then see the true final state.  Bigger
        # blocks mean fewer scan steps (a 10 s render in ONE step measures
        # ~20% faster than 30 steps on TPU v5e); the cap bounds live
        # intermediate (channels x B) buffers to ~128 MB across the graph.
        weight = sum(getattr(n, "compile_weight", 1) for n in nodes.values())
        budget_frames = (1 << 25) // max(weight, 1)
        max_qpb = max(DEFAULT_QUANTA_PER_BLOCK,
                      budget_frames // RENDER_QUANTUM_SIZE)
        qpb = 1
        best8 = 0
        pow2_only = any(getattr(n, "block_constraint", lambda: None)() == "pow2"
                        for n in nodes.values())
        # partitioned-FFT kernels (biquad/IIR truncated IR, convolver) want
        # blocks with a LARGE power-of-two factor: their partition is the
        # block's largest pow2 divisor (choose_partition), and per-sample
        # MAC cost scales with ir_len/partition.  A 125-quanta divisor
        # block degrades them to 128-sample partitions (~128x more MACs
        # than a padded 128-quanta block's 16384 partition).
        wants_pow2 = any(getattr(n, "wants_pow2_partitions", False)
                         for n in nodes.values())
        for d in range(min(max_qpb, total_quanta), 0, -1):
            if total_quanta % d == 0 and (not pow2_only or (d & (d - 1)) == 0):
                if qpb == 1:
                    qpb = d
                if d % 8 == 0:
                    best8 = d
                    break
                if not wants_pow2:
                    break
        if wants_pow2:
            # candidates: the largest exact divisor, the largest pow2 <=
            # cap, the first multiple-of-8 divisor, and the padded default.
            # Filter to blocks whose pow2 content supports a >= 4096-sample
            # partition (a low-content block multiplies the FDL MAC count
            # by ir_len/content), then minimize total padded work plus a
            # per-scan-step overhead of ~16 quanta (measured on v5e: a
            # 10 s render in 2 steps beats 30 steps by ~30%, while a
            # 256-instance batch amortizes step cost and wants minimal
            # padding — this one cost model picks correctly for both).
            cap = min(max_qpb, max(total_quanta, 1))
            cands = {qpb, 1 << (cap.bit_length() - 1)}
            if best8:
                cands.add(best8)
            if total_quanta > DEFAULT_QUANTA_PER_BLOCK:
                cands.add(DEFAULT_QUANTA_PER_BLOCK)

            def _content(q):
                bf = q * RENDER_QUANTUM_SIZE
                return bf & -bf

            good = [q for q in cands if _content(q) >= 4096]
            if good:
                cands = good

            def _cost(q):
                nb = -(-total_quanta // q)
                return (nb * q + 16 * nb, -_content(q))

            qpb = min(cands, key=_cost)
        if qpb < 24 and total_quanta > DEFAULT_QUANTA_PER_BLOCK:
            qpb = DEFAULT_QUANTA_PER_BLOCK
    block_frames = qpb * RENDER_QUANTUM_SIZE

    in_counts, out_counts, in_edges = _propagate_channel_counts(nodes, edges)

    # param audio connections: (dst_nid, param_name) -> [(src, src_output)]
    param_edges: dict = {}
    for e in edges:
        if e.param is not None:
            param_edges.setdefault((e.dst, e.param), []).append((e.src, e.src_output))

    # compile every param timeline over the render range
    param_plan = {}
    param_objects = {}
    for nid, node in nodes.items():
        for pname, p in node.params.items():
            param_objects[(nid, pname)] = p
            param_plan[(nid, pname)] = p.compile_for_render(
                sample_rate, _pad_len(total_frames, block_frames), start_frame,
                force_dense=force_dense_params)

    # dense params are PACKED into one (P, B) tensor per block so xs stays
    # a single leaf regardless of param count (500-param graphs otherwise
    # cost 500 pytree leaves + 500 dynamic-slices per scan step)
    dense_params = [key for key, plan in param_plan.items()
                    if not plan.is_constant]
    dense_index = {key: i for i, key in enumerate(dense_params)}

    # foreign params: a node can subscribe to another node's params (the
    # reference's hidden listener->panner port, concrete_base.rs:511-534)
    foreign: dict = {}
    for nid, node in nodes.items():
        fp = node.foreign_params()
        if fp:
            foreign[nid] = {alias: (src.node_id, pname)
                            for alias, (src, pname) in fp.items()
                            if src.node_id in nodes}

    # build kernels
    kernels = {}
    early_failed: dict = {}
    for nid, node in nodes.items():
        rc = RenderContext(
            sample_rate=sample_rate,
            # two-rate: cycle-group members process inner_frames at a time
            block_frames=(inner_frames if nid in fast_ids
                          else block_frames),
            input_channel_counts=in_counts[nid],
            output_channel_counts=out_counts[nid],
            in_cycle=(nid in ordered.cycle_breakers),
            total_frames=total_frames,
            start_frame=start_frame,
            param_plans={pname: param_plan[(nid, pname)]
                         for pname in node.params},
            input_connected=[bool(in_edges[nid][i])
                             for i in range(node.number_of_inputs)],
        )
        try:
            kernels[nid] = node.make_kernel(rc)
        except NotSupportedError:
            # platform-capability fences (e.g. ScriptProcessor on a
            # callback-free backend) are environment errors, not processor
            # bugs — muting the node would hide them; surface loudly
            raise
        except Exception as exc:
            # a processor whose CONSTRUCTION throws (e.g. a lazy worklet
            # ctor) is isolated exactly like a process()-time failure: its
            # outputs are silent, onprocessorerror fires, the rest of the
            # graph renders (reference: render-thread construction inside
            # the panic boundary, worklet.rs:301-321 + graph.rs:507-521)
            early_failed[nid] = exc
            kernels[nid] = Kernel()
            cb = getattr(node, "_onprocessorerror", None)
            if cb is not None:
                cb(exc)

    n_dest_channels = out_counts[dest_id][0] if nodes[dest_id].number_of_outputs else \
        in_counts[dest_id][0]
    interp_of = {nid: nodes[nid]._channel_config.interpretation for nid in nodes}

    def resolve_param(nid, node, pname, xs_params, scope):
        plan = param_plan[(nid, pname)]
        p = node.params[pname]
        if plan.is_constant:
            val = jnp.float32(min(max(plan.scalar, p.min_value), p.max_value))
        else:
            val = xs_params[dense_index[(nid, pname)]]  # (B,)
        aedges = param_edges.get((nid, pname))
        if aedges:
            return None, (val, aedges, p)  # resolved later with signals
        if not plan.is_constant:
            val = jnp.clip(val, p.min_value, p.max_value)
        return val, None

    # node id -> exception (processor failure isolation); seeded with
    # construction-time failures from the kernel-build loop above
    failed: dict = dict(early_failed)

    # execution plan: vertices in topological order, with each broken-SCC
    # group collapsed into one ("g", gi) step at its first vertex (the
    # groups are contiguous in ordered.order by construction, ir.py)
    if two_rate_m > 1:
        _gidx = {}
        for _gi, _grp in enumerate(ordered.cycle_groups):
            for _v in _grp:
                _gidx[_v] = _gi
        exec_plan = []
        _seen_groups: set = set()
        for _v in ordered.order:
            _gi = _gidx.get(_v)
            if _gi is None:
                exec_plan.append(("v", _v))
            elif _gi not in _seen_groups:
                _seen_groups.add(_gi)
                exec_plan.append(("g", _gi))
    else:
        exec_plan = [("v", _v) for _v in ordered.order]

    def block_fn(states, frame0, xs_params, resources=None):
        """One scan step: run every node in topological order."""
        scope = BlockScope(frame0, block_frames, sample_rate)
        resources = resources or {}
        signals: dict = {}
        new_states = dict(states)

        def gather_inputs(nid, node):
            ins = []
            for i in range(node.number_of_inputs):
                sigs = [signals[(e.src, e.src_output)]
                        for e in in_edges[nid][i]
                        if (e.src, e.src_output) in signals]
                ins.append(sum_inputs(sigs, in_counts[nid][i],
                                      interp_of[nid], block_frames))
            return ins

        def gather_params(nid, node):
            kern = kernels[nid]
            vp = getattr(kern, "vector_params", None)
            if vp is not None:
                # fused kernels consume whole packed-row groups: one static
                # slice per group instead of per-alias gathers (group rows
                # are contiguous by construction — the fused node registers
                # its aliases grouped by param kind)
                out = {}
                for gname, aliases in vp().items():
                    rows = [dense_index[(nid, a)] for a in aliases
                            if (nid, a) in dense_index]
                    if not rows:
                        out[gname] = None
                        continue
                    r0 = rows[0]
                    if rows != list(range(r0, r0 + len(rows))):
                        raise AssertionError(
                            "fused param rows not contiguous")
                    out[gname] = xs_params[r0:r0 + len(rows)]
                return out
            out = {}
            items = [(pname, nid, node, pname) for pname in node.params]
            for alias, (src_nid, src_pname) in foreign.get(nid, {}).items():
                items.append((alias, src_nid, nodes[src_nid], src_pname))
            for alias, pnid, pnode, pname in items:
                val, pending = resolve_param(pnid, pnode, pname, xs_params, scope)
                if pending is not None:
                    base, aedges, pp = pending
                    sigs = [signals[(s, o)] for (s, o) in aedges if (s, o) in signals]
                    audio = sum_inputs(sigs, 1, ChannelInterpretation.SPEAKERS,
                                       block_frames)[0]
                    if not pp.automation_rate.is_a_rate:
                        q = audio.reshape(-1, RENDER_QUANTUM_SIZE)[:, :1]
                        audio = jnp.broadcast_to(
                            q, (q.shape[0], RENDER_QUANTUM_SIZE)).reshape(-1)
                    val = base + audio
                    val = jnp.where(jnp.isnan(val), pp.default_value,
                                    jnp.clip(val, pp.min_value, pp.max_value))
                out[alias] = val
            return out

        def run_group(grp):
            """Two-rate inner scan: step one broken-SCC's members at the
            delay-bounded inner block while the enclosing block_fn runs
            m x larger blocks.  Outside signals/params slice per sub-step;
            in-group signals resolve inside the scan body; member states
            thread through the scan carry — identical math to the flat
            delay-bounded scan for these nodes, so cycle feedback is
            bit-exact vs single-rate stepping."""
            m = two_rate_m
            Bi = inner_frames
            mset = {nid for nid, _ in grp}
            active = [(nid, role) for nid, role in grp
                      if nid not in ordered.muted and nid not in failed]

            def split_steps(val):
                # (..., B_out) -> (m, ..., Bi) scan xs
                return jnp.moveaxis(
                    val.reshape(val.shape[:-1] + (m, Bi)), -2, 0)

            xs_list: list = []
            input_plan: dict = {}
            prm_plan: dict = {}
            built = []
            for nid, role in active:
                node = nodes[nid]
                try:
                    if role != "reader":
                        for i in range(node.number_of_inputs):
                            plan = []
                            for e in in_edges[nid][i]:
                                key = (e.src, e.src_output)
                                if e.src in mset:
                                    plan.append(("loc", key))
                                elif key in signals:
                                    xs_list.append(
                                        split_steps(signals[key]))
                                    plan.append(("xs", len(xs_list) - 1))
                            input_plan[(nid, i)] = plan
                    plan_p = {}
                    for alias, val in gather_params(nid, node).items():
                        if val is not None and getattr(val, "ndim", 0) >= 1 \
                                and val.shape[-1] == block_frames:
                            xs_list.append(split_steps(val))
                            plan_p[alias] = ("xs", len(xs_list) - 1)
                        else:
                            plan_p[alias] = ("const", val)
                    prm_plan[nid] = plan_p
                    built.append((nid, role))
                except Exception as exc:
                    failed[nid] = exc
                    cb = getattr(node, "_onprocessorerror", None)
                    if cb is not None:
                        cb(exc)

            carry0 = {_k(nid): states.get(_k(nid))
                      for nid in sorted({n for n, _ in built})}
            f0s = frame0 + jnp.arange(m, dtype=jnp.int32) * jnp.int32(Bi)
            out_keys = [(nid, oi) for nid, role in built if role != "writer"
                        for oi in range(len(out_counts[nid]))]

            def substep(carry, xs):
                f0, xs_vals = xs
                sc = BlockScope(f0, Bi, sample_rate)
                local: dict = {}
                new_carry = dict(carry)
                for nid, role in built:
                    node = nodes[nid]
                    kern = kernels[nid]
                    sc.node_resources = resources.get(_k(nid))
                    try:
                        ins = []
                        if role != "reader":
                            for i in range(node.number_of_inputs):
                                sigs = []
                                for kind, ref in input_plan[(nid, i)]:
                                    if kind == "loc":
                                        if ref in local:
                                            sigs.append(local[ref])
                                    else:
                                        sigs.append(xs_vals[ref])
                                ins.append(sum_inputs(
                                    sigs, in_counts[nid][i],
                                    interp_of[nid], Bi))
                        prm = {alias: (xs_vals[ref] if kind == "xs" else ref)
                               for alias, (kind, ref)
                               in prm_plan[nid].items()}
                        st = new_carry[_k(nid)]
                        if role == "node":
                            st, outs = kern.process(sc, st, ins, prm)
                        elif role == "reader":
                            st, outs = kern.process_reader(sc, st, prm)
                        else:
                            st = kern.process_writer(sc, st, ins, prm)
                            outs = []
                        new_carry[_k(nid)] = st
                        for oi, o in enumerate(outs):
                            local[(nid, oi)] = o
                    except Exception as exc:
                        failed[nid] = exc
                        cb = getattr(node, "_onprocessorerror", None)
                        if cb is not None:
                            cb(exc)
                for nid, oi in out_keys:
                    if (nid, oi) not in local:
                        local[(nid, oi)] = jnp.zeros(
                            (out_counts[nid][oi], Bi), jnp.float32)
                return new_carry, {f"{nid}:{oi}": local[(nid, oi)]
                                   for nid, oi in out_keys}

            final_carry, stacked = jax.lax.scan(
                substep, carry0, (f0s, tuple(xs_list)))
            for k_, v in final_carry.items():
                new_states[k_] = v
            for nid, oi in out_keys:
                s = stacked[f"{nid}:{oi}"]            # (m, C, Bi)
                signals[(nid, oi)] = jnp.moveaxis(s, 0, 1).reshape(
                    s.shape[1], m * Bi)
            # muted / failed / param-failed members emit block-level silence
            for nid, role in grp:
                if role == "writer":
                    continue
                for oi, c in enumerate(out_counts[nid]):
                    if (nid, oi) not in signals:
                        signals[(nid, oi)] = jnp.zeros(
                            (c, block_frames), jnp.float32)

        for tag, payload in exec_plan:
            if tag == "g":
                run_group(ordered.cycle_groups[payload])
                continue
            nid, role = payload
            node = nodes[nid]
            kern = kernels[nid]
            scope.node_resources = resources.get(_k(nid))
            if nid in ordered.muted or nid in failed:
                for oi, c in enumerate(out_counts[nid]):
                    signals[(nid, oi)] = jnp.zeros((c, block_frames), jnp.float32)
                continue
            # per-node failure isolation: a processor that throws during
            # tracing is removed from the graph (its outputs go silent) and
            # the rest keeps rendering — the compiled analog of the
            # reference's per-quantum catch_unwind (graph.rs:507-521,
            # tests/processor_error.rs)
            try:
                if role == "node":
                    ins = gather_inputs(nid, node)
                    prm = gather_params(nid, node)
                    st, outs = kern.process(scope, states.get(_k(nid)), ins, prm)
                    new_states[_k(nid)] = st
                    for oi, o in enumerate(outs):
                        signals[(nid, oi)] = o
                elif role == "reader":
                    prm = gather_params(nid, node)
                    st, outs = kern.process_reader(
                        scope, new_states.get(_k(nid), states.get(_k(nid))), prm)
                    new_states[_k(nid)] = st
                    for oi, o in enumerate(outs):
                        signals[(nid, oi)] = o
                else:  # writer
                    ins = gather_inputs(nid, node)
                    prm = gather_params(nid, node)
                    st = kern.process_writer(
                        scope, new_states.get(_k(nid), states.get(_k(nid))), ins, prm)
                    new_states[_k(nid)] = st
            except Exception as exc:
                failed[nid] = exc
                for oi, c in enumerate(out_counts[nid]):
                    signals[(nid, oi)] = jnp.zeros((c, block_frames), jnp.float32)
                cb = getattr(node, "_onprocessorerror", None)
                if cb is not None:
                    cb(exc)

        dest_sig = signals.get((dest_id, 0))
        if dest_sig is None:
            dest_sig = jnp.zeros((n_dest_channels, block_frames), jnp.float32)
        return new_states, dest_sig

    cg = CompiledGraph(
        block_fn=block_fn, order=ordered.order, kernels=kernels,
        in_counts=in_counts, out_counts=out_counts, param_plan=param_plan,
        block_frames=block_frames, sample_rate=sample_rate,
        n_dest_channels=n_dest_channels, total_frames=total_frames,
        muted=ordered.muted,
        cycle_breakers=ordered.cycle_breakers, failed=failed,
        dense_params=dense_params, param_alias=param_alias,
        param_objects=param_objects, two_rate_m=two_rate_m,
        inner_frames=inner_frames or 0)

    def scan_render(init_states, frame0s, xs_params, resources):
        def step(states, xs):
            f0, xp = xs
            states, out = block_fn(states, f0, xp, resources)
            return states, out

        if frame0s.shape[0] == 1:
            # single-block render (most acyclic graphs pick the whole
            # render as one block): skip lax.scan — a 1-trip loop only
            # adds carry-staging copies and an xs layout conversion
            # (runs_r05/hlo_800_fused.txt: the size-1 'xs_params' reduce
            # alone was backend-estimated at 0.85 ms/render)
            final_states, out1 = step(init_states,
                                      (frame0s[0], xs_params[0]))
            outs = out1[None]
        else:
            final_states, outs = jax.lax.scan(step, init_states,
                                              (frame0s, xs_params))
        # (nb, C, B) -> (C, nb*B)
        outs = jnp.transpose(outs, (1, 0, 2)).reshape(outs.shape[1], -1)
        return final_states, outs

    cg.scan_render = scan_render
    cg.jit_scan = jax.jit(scan_render)
    return cg


def collect_resources(cg: CompiledGraph) -> dict:
    """Gather each kernel's static device data (staged once, reused across
    renders)."""
    out = {}
    for nid, kern in cg.kernels.items():
        r = kern.resources()
        if r is not None:
            out[_k(nid)] = r
    return out


_complexify = None


def _stage_leaf(x):
    """Upload one resource leaf to the device.

    Complex leaves (FFT spectra: biquad/convolver FDLs, HRTF) are uploaded
    as real/imag float pairs and combined on-device: the tunneled axon
    backend does not support complex host->device transfers (UNIMPLEMENTED),
    and float-pair staging is portable everywhere else."""
    arr = np.asarray(x)
    if np.iscomplexobj(arr):
        global _complexify
        if _complexify is None:
            _complexify = jax.jit(lambda r, i: jax.lax.complex(r, i))
        re = jnp.asarray(np.ascontiguousarray(arr.real))
        im = jnp.asarray(np.ascontiguousarray(arr.imag))
        return _complexify(re, im)
    return jnp.asarray(x)


def stage_resources(tree):
    """Device-stage a resource pytree (the complex-safe tree_map(jnp.asarray)
    replacement — use this instead of staging resources directly)."""
    return jax.tree_util.tree_map(_stage_leaf, tree)


def _k(nid: int) -> str:
    return f"n{nid}"


def pack_dense_params(cg: CompiledGraph, padded: int,
                      plans: Optional[dict] = None) -> np.ndarray:
    """Stack the dense param arrays in `cg.dense_params` row order into one
    (P, padded) f32 array (edge-padded to `padded` frames)."""
    plans = plans or cg.param_plan
    rows = np.zeros((len(cg.dense_params), padded), np.float32)
    for i, key in enumerate(cg.dense_params):
        arr = plans[key].dense
        n = min(len(arr), padded)
        rows[i, :n] = arr[:n]
        if n < padded:
            rows[i, n:] = arr[-1]
    return rows


def _cycle_delay_bound(nodes, edges, cycle_breakers, sample_rate) -> int:
    """Max safe quanta-per-block for cyclic stepping: a cycle-breaking
    delay of (constant) d frames only ever reads samples written >= d
    frames ago, so any block <= d-1 frames keeps every in-cycle read
    inside the carried ring state.  Automated or audio-driven delays (read
    distance can shrink mid-render) pin the graph to one-quantum
    stepping."""
    from ..nodes.delay import DelayNode

    d_min = None
    for nid in cycle_breakers:
        node = nodes.get(nid)
        if not isinstance(node, DelayNode):
            return 1
        p = node.params["delay_time"]
        driven = any(e.param == "delay_time" and e.dst == nid for e in edges)
        if driven or not p.is_constant_schedule():
            return 1
        num = float(np.float32(p.value)) * sample_rate
        d_min = num if d_min is None else min(d_min, num)
    if d_min is None:
        return 1  # delay-free (muted) cycle
    return max(1, int((d_min - 1) // RENDER_QUANTUM_SIZE))


def _cycle_safe_qpb(nodes, edges, cycle_breakers, sample_rate,
                    total_quanta, constraint_ids=None) -> int:
    """Largest safe quanta-per-block for a cyclic graph (see
    _cycle_delay_bound), shaped to the render length (divisor / pow2
    preferences).  `constraint_ids` restricts the block-shape preference
    scan (pow2 constraint, FFT-partition content) to the nodes that will
    actually step at this block — the two-rate inner set — while the
    memory budget stays whole-graph."""
    max_by_delay = _cycle_delay_bound(nodes, edges, cycle_breakers,
                                      sample_rate)
    if max_by_delay < 2:
        return 1
    cons = (nodes.values() if constraint_ids is None
            else [nodes[i] for i in constraint_ids])
    weight = sum(getattr(n, "compile_weight", 1) for n in nodes.values())
    budget = max(1, ((1 << 25) // max(weight, 1)) // RENDER_QUANTUM_SIZE)
    cap = min(max_by_delay, budget, total_quanta)
    pow2_only = any(getattr(n, "block_constraint", lambda: None)() == "pow2"
                    for n in cons)
    qpb = 1
    for d in range(cap, 0, -1):
        if total_quanta % d == 0 and (not pow2_only or (d & (d - 1)) == 0):
            qpb = d
            break
    if (qpb < 24 or qpb % 8) and cap >= 24:
        # no good divisor: accept block padding.  With partitioned-FFT
        # kernels in the graph prefer the largest power of two <= cap (the
        # partition is the block's largest pow2 divisor, so e.g. a
        # 104-quanta block caps partitions at 512 while a 64-quanta block
        # gets 8192); otherwise just take the largest multiple of 8.
        wants_pow2 = any(getattr(n, "wants_pow2_partitions", False)
                         for n in cons)
        if pow2_only or wants_pow2:
            qpb = 1 << (cap.bit_length() - 1)
        else:
            qpb = max(cap - cap % 8, qpb)
    return qpb


def _two_rate_eligible(nodes, edges, ordered) -> bool:
    """Two-rate stepping requires every group-internal data dependency to
    be expressible inside the inner scan: audio-driven params whose source
    is IN the group, and foreign-param subscriptions by group members,
    fall back to single-rate (the flat delay-bounded scan)."""
    fast = {nid for grp in ordered.cycle_groups for (nid, _) in grp}
    if not fast:
        return False
    for e in edges:
        if e.param is not None and e.dst in fast and e.src in fast:
            return False
    for nid in fast:
        if nodes[nid].foreign_params():
            return False
    return True


def _two_rate_plan(nodes, edges, cycle_breakers, sample_rate,
                   total_quanta):
    """Joint (inner_qpb, m) choice for the two-rate compiler (r5).

    The inner block is constrained only by the cycle-delay bound (cycle
    members carry no FFT-partition or pow2 preferences; if they did the
    caller keeps the legacy path).  Candidates: divisors of the render,
    multiples of 8, and powers of two up to the bound.  For each, the
    best m minimizes  padded_total + 16*outer_steps + 4*inner_substeps
    (quanta-equivalents; 16/outer-step is the acyclic chooser's measured
    per-scan-step overhead, 4/substep its small-body analog), preferring
    outer blocks whose pow2 content keeps partitioned-FFT kernels on
    >= 4096-sample partitions.  Returns (inner_qpb, m) or None."""
    bound = _cycle_delay_bound(nodes, edges, cycle_breakers, sample_rate)
    weight = sum(getattr(n, "compile_weight", 1) for n in nodes.values())
    budget = max(1, ((1 << 25) // max(weight, 1)) // RENDER_QUANTUM_SIZE)
    cap = min(bound, budget, total_quanta)
    if cap < 2:
        return None
    wants_pow2 = any(getattr(n, "wants_pow2_partitions", False)
                     for n in nodes.values())

    cands = {cap}
    cands.update(q for q in range(8, cap + 1, 8))
    q = 1
    while q * 2 <= cap:
        q *= 2
    cands.add(q)
    for d in range(2, int(total_quanta ** 0.5) + 1):
        if total_quanta % d == 0:
            if d <= cap:
                cands.add(d)
            if total_quanta // d <= cap:
                cands.add(total_quanta // d)

    def _content(quanta):
        bf = quanta * RENDER_QUANTUM_SIZE
        return bf & -bf

    best = None
    best_good = None
    for qi in sorted(cands):
        max_m = min(budget // qi, -(-total_quanta // qi))
        for m in range(1, max_m + 1):
            outer = m * qi
            nb = -(-total_quanta // outer)
            cost = ((nb * outer + 16 * nb + 4 * nb * m,
                     -_content(outer) if wants_pow2 else 0), qi, m)
            if best is None or cost < best:
                best = cost
            # the FFT-partition content preference is GLOBAL: any plan
            # with >= 4096-sample pow2 content beats every plan without
            # one (a per-inner-candidate filter let inner blocks with no
            # good m win on raw cost while degrading the partitioned
            # kernels' FDL 32x — caught by test_block_policy)
            if wants_pow2 and _content(outer) >= 4096 and \
                    (best_good is None or cost < best_good):
                best_good = cost
    chosen = best_good if best_good is not None else best
    if chosen is None:
        return None
    return chosen[1], chosen[2]


def _two_rate_steps(nodes, total_quanta, qpb_in, pow2_only=False) -> int:
    """Inner sub-steps per outer block: minimize padded total + per-outer-
    step overhead (~16 quanta, the acyclic chooser's cost model), keeping
    partitioned-FFT kernels on >= 4096-sample pow2 content."""
    weight = sum(getattr(n, "compile_weight", 1) for n in nodes.values())
    budget_frames = (1 << 25) // max(weight, 1)
    max_qpb = max(DEFAULT_QUANTA_PER_BLOCK,
                  budget_frames // RENDER_QUANTUM_SIZE)
    max_m = max(1, min(max_qpb // qpb_in, -(-total_quanta // qpb_in)))
    wants_pow2 = any(getattr(n, "wants_pow2_partitions", False)
                     for n in nodes.values())

    def _content(q):
        bf = q * RENDER_QUANTUM_SIZE
        return bf & -bf

    cands = [m for m in range(1, max_m + 1)
             if not pow2_only or ((m * qpb_in) & (m * qpb_in - 1)) == 0]
    if wants_pow2:
        good = [m for m in cands if _content(m * qpb_in) >= 4096]
        if good:
            cands = good

    def _cost(m):
        q = m * qpb_in
        nb = -(-total_quanta // q)
        return (nb * q + 16 * nb, -_content(q) if wants_pow2 else 0)

    return min(cands, key=_cost) if cands else 1


def _pad_len(total_frames: int, block_frames: int) -> int:
    nb = -(-total_frames // block_frames)
    return nb * block_frames


def render_compiled(cg: CompiledGraph, nodes: dict, total_frames: int,
                    start_frame: int = 0, init_states: Optional[dict] = None):
    """Execute a compiled graph over [start_frame, start_frame+total_frames).

    Returns `(output (C, padded_frames) device array, final_states)` where
    padded_frames rounds total_frames up to the block size — callers slice
    host-side after transfer.  (Slicing on device would create a second XLA
    program per length, and remote-compile latency on tunneled TPU backends
    is tens of seconds per program.)"""
    args = render_args(cg, total_frames, start_frame, init_states)
    final_states, out = cg.jit_scan(*args)
    return out, final_states


def render_args(cg: CompiledGraph, total_frames: int, start_frame: int = 0,
                init_states: Optional[dict] = None):
    """Stage (init_states, frame0s, xs_params, resources) for cg.jit_scan —
    the exact argument tuple render_compiled dispatches with (also used by
    benches/suite.py to lower the same computation for XLA cost analysis)."""
    B = cg.block_frames
    padded = _pad_len(total_frames, B)
    nb = padded // B

    # dense params packed into one (nb, P, B) tensor, staged to device once
    # per compiled graph (re-uploading per render costs hundreds of MB for
    # many-param graphs)
    key = (total_frames, start_frame)
    if getattr(cg, "_xs_cache_key", None) == key:
        xs_params = cg._xs_cache
    else:
        if cg.dense_params:
            packed = pack_dense_params(cg, padded)         # (P, padded)
            # pad the row count to a sublane multiple: a (nb, 9, B)
            # stage gets compact T(1,128) tiling and the executable
            # re-tiles it to T(8,128) EVERY render (a size-1 reduce
            # backend-estimated at 0.85 ms on the 800-grain case —
            # benches/runs_r05/hlo_800_fused2.txt); trailing zero rows
            # are never indexed by block_fn
            P = packed.shape[0]
            Pp = ((P + 7) // 8) * 8
            if Pp > P:
                packed = np.concatenate(
                    [packed, np.zeros((Pp - P, padded), np.float32)])
            xs_params = jnp.asarray(
                packed.reshape(Pp, nb, B).transpose(1, 0, 2))
        else:
            xs_params = jnp.zeros((nb, 0, B), jnp.float32)
        cg._xs_cache = xs_params
        cg._xs_cache_key = key
        cg._frame0s_cache = jnp.asarray(
            start_frame + np.arange(nb, dtype=np.int32) * B)
        # fresh zero states are identical every render and jit args are
        # read-only, so stage them ONCE per compiled graph.  Rebuilding
        # them per call dispatched one eager device op per state leaf
        # through the tunnel — measured as ~1-2.6 ms of per-render
        # overhead PER NODE in the r5 session-3 ablation (the analyser's
        # 32k ring zeros alone cost ~1 ms/render), which dominated every
        # single-graph benchmark case.
        cg._zero_states_cache = {
            _k(nid): k.init_state() for nid, k in cg.kernels.items()}
    frame0s = cg._frame0s_cache

    if init_states is None:
        init_states = cg._zero_states_cache

    if cg.resource_cache is None:
        cg.resource_cache = stage_resources(collect_resources(cg))
    return init_states, frame0s, xs_params, cg.resource_cache
