"""Batched / multi-chip graph rendering.

The reference is a single-thread-per-graph engine with no parallelism
(SURVEY.md §2.2); the TPU rebuild's scale axis is *batches of independent
graphs*: one compiled topology, vmapped over stacked param tensors and
states, sharded over a device mesh along the batch axis (pure data
parallelism — graphs are independent, so no collectives are semantically
required and ICI carries no traffic except result gathering).
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..graph import compiler as _compiler


class GraphBatch:
    """Render `batch` instances of one graph topology in a single XLA
    computation, optionally sharded over a mesh's 'graphs' axis.

    Instances share the topology and any baked constants (audio buffers,
    schedules); per-instance variation comes from `override_param` (dense
    per-sample automation tensors differing per instance) and per-instance
    initial states.
    """

    def __init__(self, context, batch: int, mesh: Optional[Mesh] = None,
                 _cg=None):
        self.context = context
        self.batch = batch
        self.mesh = mesh
        total = context.length
        self.total_frames = total
        self.sample_rate = context.sample_rate
        self.cg = _cg if _cg is not None else _compiler.compile_graph(
            dict(context._nodes), list(context._edges), context.sample_rate,
            total, context._destination.node_id)
        B = self.cg.block_frames
        self.nb = -(-total // B)
        padded = self.nb * B

        # base param rows (shared across instances unless overridden),
        # packed (batch, nb, P, B)
        base = _compiler.pack_dense_params(self.cg, padded)  # (P, padded)
        P_rows = base.shape[0]
        base = base.reshape(P_rows, self.nb, B).transpose(1, 0, 2)
        self._xs = np.broadcast_to(
            base[None], (batch, self.nb, P_rows, B)).copy()
        # host numpy on purpose: the scan closes over it, and a *device*
        # array constant would need a device->host readback at lowering
        # (UNIMPLEMENTED on tunneled TPU backends)
        self.frame0s = np.arange(self.nb, dtype=np.int32) * B

        states = {_compiler._k(nid): k.init_state()
                  for nid, k in self.cg.kernels.items()}
        self._states = jax.tree_util.tree_map(
            lambda x: jnp.broadcast_to(x[None], (batch,) + x.shape), states)

        # static kernel data (audio buffers, IR spectra): shared across
        # instances (replicated) unless overridden per instance via
        # override_buffer (then batched along the graphs axis)
        self._resources = _compiler.collect_resources(self.cg)
        self._batched_resources: set = set()  # (node_key, leaf_key)
        self._fn = None

    def _build_fn(self):
        batched_keys = self._batched_resources

        def render_one(init_states, xs_params, resources):
            def step(st, xs_in):
                f0, xp = xs_in
                st, out = self.cg.block_fn(st, f0, xp, resources)
                return st, out

            final, outs = jax.lax.scan(step, init_states,
                                       (self.frame0s, xs_params))
            return jnp.transpose(outs, (1, 0, 2)).reshape(outs.shape[1], -1)

        res_axes = {nk: {lk: (0 if (nk, lk) in batched_keys else None)
                         for lk in leaves}
                    for nk, leaves in self._resources.items()}
        batched = jax.vmap(render_one, in_axes=(0, 0, res_axes))
        if self.mesh is not None:
            sh = NamedSharding(self.mesh, P("graphs"))
            repl = NamedSharding(self.mesh, P())
            spec_states = jax.tree_util.tree_map(lambda _: sh, self._states)
            spec_xs = sh
            spec_res = {nk: {lk: (sh if (nk, lk) in batched_keys else repl)
                             for lk in leaves}
                        for nk, leaves in self._resources.items()}
            self._fn = jax.jit(
                batched,
                in_shardings=(spec_states, spec_xs, spec_res),
                out_shardings=sh)
        else:
            self._fn = jax.jit(batched)

    @classmethod
    def from_contexts(cls, contexts, mesh: Optional[Mesh] = None
                      ) -> "MixedGraphBatch":
        """Batch a heterogeneous list of contexts (mixed topologies):
        instances bucket by structural graph hash, one compile per bucket,
        one `render()` returning per-context results in input order."""
        return MixedGraphBatch(contexts, mesh=mesh)

    def override_buffer(self, node, stacked: np.ndarray, key: str = "data"):
        """Give each instance its own copy of a node resource — e.g. a
        per-instance AudioBuffer for an AudioBufferSourceNode, enabling
        corpus batch-processing.  stacked: (batch, ...) matching the
        resource's per-instance shape (all instances must share shapes).

        `key="data"` takes raw (batch, C, L) audio and stages the derived
        pair-row layout + end-of-buffer constants the kernels actually
        read (ops/bufread.py)."""
        nk = _compiler._k(node.node_id)
        if nk not in self._resources:
            raise ValueError(f"node has no staged resource {key!r}")
        if key == "data" and "data_rows" in self._resources[nk]:
            from ..ops.bufread import edge_vals, pair_rows

            kern = self.cg.kernels[node.node_id]
            base_rows = np.asarray(self._resources[nk]["data_rows"])
            stacked = np.asarray(stacked, np.float32)
            C = base_rows.shape[1] // 2
            if stacked.shape != (self.batch, C, base_rows.shape[0]):
                raise ValueError(
                    f"expected {(self.batch, C, base_rows.shape[0])}, "
                    f"got {stacked.shape}")
            loop = bool(getattr(kern, "loop", False))
            wrap = 0
            if loop:
                import math

                wrap = int(math.ceil(kern.loop_start * kern.buf_rate))
            self._resources[nk]["data_rows"] = np.stack(
                [pair_rows(inst) for inst in stacked])
            self._resources[nk]["edge_vals"] = np.stack(
                [edge_vals(inst, loop, wrap) for inst in stacked])
            self._batched_resources.add((nk, "data_rows"))
            self._batched_resources.add((nk, "edge_vals"))
            if hasattr(kern, "_read_resources"):
                # amortized-read kernels also stage data-derived layouts
                # (grouped rows / window extension) per instance
                per_inst: dict = {}
                for inst in stacked:
                    saved = kern.data_host
                    kern.data_host = inst
                    try:
                        for rk, rv in kern._read_resources().items():
                            per_inst.setdefault(rk, []).append(rv)
                    finally:
                        kern.data_host = saved
                for rk, rvs in per_inst.items():
                    self._resources[nk][rk] = np.stack(rvs)
                    self._batched_resources.add((nk, rk))
            self._staged = None
            self._fn = None
            return
        if key not in self._resources[nk]:
            raise ValueError(f"node has no staged resource {key!r}")
        base = np.asarray(self._resources[nk][key])
        stacked = np.asarray(stacked, base.dtype)
        if stacked.shape != (self.batch,) + base.shape:
            raise ValueError(
                f"expected {(self.batch,) + base.shape}, got {stacked.shape}")
        self._resources[nk][key] = stacked
        self._batched_resources.add((nk, key))
        self._staged = None
        self._fn = None  # vmap axes changed

    def override_param(self, node, param_name: str, dense: np.ndarray):
        """Give each instance its own automation tensor.

        dense: (batch, total_frames) f32 — per-instance per-sample values.
        """
        B = self.cg.block_frames
        padded = self.nb * B
        arr = np.asarray(dense, np.float32)
        if arr.shape != (self.batch, self.total_frames):
            raise ValueError(
                f"expected ({self.batch}, {self.total_frames}), got {arr.shape}")
        if arr.shape[1] < padded:
            arr = np.concatenate(
                [arr, np.repeat(arr[:, -1:], padded - arr.shape[1], 1)], axis=1)
        key = (node.node_id, param_name)
        key = self.cg.param_alias.get(key, key)  # fused chains remap rows
        kern = self.cg.kernels.get(key[0])
        if kern is not None and getattr(kern, "lane_env", False) and \
                str(key[1]).endswith(".gain"):
            raise ValueError(
                "this envelope compiled into the grain bank's per-lane "
                "spliced rows (its per-voice dense row does not exist); "
                "set WEBAUDIO_GRAIN_LANES=0 before building the context "
                "to batch-override it")
        if kern is not None and \
                getattr(kern, "compact_env", None) is not None and \
                str(key[1]).endswith(".gain"):
            raise ValueError(
                "this envelope compiled to the grain bank's compact "
                "analytic form (its dense rows are not read); set "
                "WEBAUDIO_COMPACT_ENV=0 before building the context to "
                "batch-override it")
        if key not in self.cg.dense_params:
            raise ValueError(
                "param was compiled as a constant; schedule at least one "
                "automation event before batching to make it dense")
        row = self.cg.dense_params.index(key)
        self._xs[:, :, row, :] = arr.reshape(self.batch, self.nb, B)
        self._staged = None  # restage on next render

    def _stage(self):
        """Upload params/states/resources once; reuse across renders
        (host->device uploads dominate otherwise — ~100 MB of per-instance
        automation tensors per call)."""
        if getattr(self, "_staged", None) is not None:
            return self._staged
        xs = jnp.asarray(self._xs)
        res = _compiler.stage_resources(self._resources)
        states = self._states
        if self.mesh is not None:
            sh = NamedSharding(self.mesh, P("graphs"))
            repl = NamedSharding(self.mesh, P())
            xs = jax.device_put(xs, sh)
            states = jax.device_put(states, sh)
            res = {nk: {lk: jax.device_put(
                        v, sh if (nk, lk) in self._batched_resources else repl)
                        for lk, v in leaves.items()}
                   for nk, leaves in res.items()}
        self._staged = (states, xs, res)
        return self._staged

    def render(self):
        """-> (batch, channels, padded_frames) on device (sharded if mesh);
        slice [:, :, :total_frames] host-side after transfer."""
        if self._fn is None:
            self._build_fn()
        states, xs, res = self._stage()
        return self._fn(states, xs, res)

    def render_i16(self, seed: int = 0):
        """Render and quantize to dithered int16 ON DEVICE (the Pallas
        dither kernel, ops/dither.py) before the host transfer — halves
        readback bytes, which is the end-to-end bottleneck on thin
        host links (PCIe sharing, tunneled chips).  Returns an int16
        array shaped like render()."""
        out = self.render()
        b, c, t = out.shape
        if jax.devices()[0].platform in ("tpu", "axon"):
            from ..ops.dither import dither_to_i16_tpu

            q = dither_to_i16_tpu(out.reshape(b * c, t), seed)
            return q.astype(jnp.int16).reshape(b, c, t)
        from ..ops.dither import dither_to_i16

        return dither_to_i16(np.asarray(out).reshape(b * c, t),
                             seed).reshape(b, c, t)

    def render_u8(self, seed: int = 0):
        """Render and compand to dithered 8-bit u-law ON DEVICE — a
        preview-grade bounce that quarters readback bytes vs f32 (the
        Pallas u-law kernel, ops/dither.py).  Decode host-side with
        `ops.dither.ulaw_decode_u8`."""
        out = self.render()
        b, c, t = out.shape
        if jax.devices()[0].platform in ("tpu", "axon"):
            from ..ops.dither import ulaw_to_u8_tpu

            q = ulaw_to_u8_tpu(out.reshape(b * c, t), seed)
            return q.astype(jnp.uint8).reshape(b, c, t)
        from ..ops.dither import ulaw_encode_u8

        return ulaw_encode_u8(np.asarray(out).reshape(b * c, t),
                              seed).reshape(b, c, t)

    def render_stream(self, count: int, updates=None, fetch: str = "i16"):
        """Double-buffered serving loop: yields `count` host arrays,
        dispatching batch k+1's render BEFORE fetching batch k so the
        device computes the next batch while the previous one crosses the
        host link (the round-2 readback was serial: render, fetch, repeat
        — transfer time added to compute time instead of hiding under it).

        updates: optional callable (gb, k) -> None run before dispatch k
        to mutate per-batch inputs (override_param / override_buffer);
        fetch: 'f32' | 'i16' | 'u8' selects the on-device bounce depth.
        """
        dispatch = {"f32": self.render,
                    "i16": self.render_i16,
                    "u8": self.render_u8}[fetch]
        prev = None
        for k in range(count):
            if updates is not None:
                updates(self, k)
            cur = dispatch()
            if prev is not None:
                yield np.asarray(prev)
            prev = cur
        if prev is not None:
            yield np.asarray(prev)


def default_mesh(axis: str = "graphs") -> Mesh:
    devs = np.array(jax.devices())
    return Mesh(devs, (axis,))


# --- mixed-topology batching (SURVEY §7 build-plan item 8) -----------------


def _fp_tokens(v, out: list, depth: int = 0, staged_ids: frozenset = frozenset()):
    """Append hashable fingerprint tokens for one kernel attribute.

    Everything BAKED into the traced closure must reach the fingerprint by
    VALUE (scalars, strings, schedule frames, baked coefficients, and —
    since round 4 — host numpy arrays the kernel closes over).  Arrays that
    provably ride the staged-resource path (same object returned by
    `resources()`, or named in the kernel's `_fp_staged_attrs`) keep
    shape/dtype-only tokens: per-instance content there gets stacked and
    vmapped by MixedGraphBatch, so value differences must NOT split
    buckets.  Device arrays also stay shape/dtype-only (hashing them would
    force device->host readbacks; kernels must not bake device arrays)."""
    if depth > 6:
        out.append("deep")
        return
    if v is None or isinstance(v, (bool, int, float, str)):
        out.append(repr(v))
    elif isinstance(v, (np.floating, np.integer)):
        out.append(repr(float(v)))
    elif isinstance(v, (list, tuple)):
        out.append(f"seq{len(v)}")
        for item in v:
            _fp_tokens(item, out, depth + 1, staged_ids)
    elif isinstance(v, dict):
        out.append(f"map{len(v)}")
        for k in sorted(v, key=repr):
            out.append(repr(k))
            _fp_tokens(v[k], out, depth + 1, staged_ids)
    elif isinstance(v, np.ndarray):
        out.append(f"arr{tuple(v.shape)}{v.dtype}")
        if id(v) not in staged_ids:
            # not a staged resource: the trace may bake these values in, so
            # two graphs differing here must land in different buckets
            import hashlib

            out.append(hashlib.sha1(
                np.ascontiguousarray(v).tobytes()).hexdigest()[:16])
    elif hasattr(v, "shape"):
        out.append(f"arr{tuple(v.shape)}{getattr(v, 'dtype', '')}")
    elif callable(v):
        # same callable object => same bucket; different callables split
        # (over-splitting is safe, silently sharing user code is not)
        out.append(f"fn{getattr(v, '__qualname__', '')}{id(v)}")
    elif callable(getattr(v, "process", None)):
        # worklet processor instances carry user state/options the kernel
        # runs verbatim: identity-split like callables (over-split is safe,
        # silently running the leader's processor for another node is not)
        out.append(f"proc{type(v).__name__}{id(v)}")
    else:
        # webaudio objects (node back-refs etc.): type identity only —
        # their kernel-relevant content is copied onto the kernel
        out.append(type(v).__name__)


def graph_fingerprint(cg) -> str:
    """Structural fingerprint of a compiled graph: two graphs bucket
    together iff their traced closures are interchangeable, so one XLA
    compile can serve instances of both with per-instance dense params,
    initial states, and (stacked) resources."""
    import hashlib

    toks: list = [
        f"B{cg.block_frames}", f"fs{cg.sample_rate}",
        f"T{cg.total_frames}",   # render length: lengths sharing a block
                                 # size (delay-bound cyclic graphs) must
                                 # still bucket apart — nb/total differ
        f"dc{cg.n_dest_channels}",
        repr(cg.order), repr(sorted(cg.muted)),
        repr(sorted(cg.cycle_breakers)),
        repr(cg.dense_params),
        repr(sorted(cg.in_counts.items())),
        repr(sorted(cg.out_counts.items())),
    ]
    # constant params are baked into the closure as f32 scalars -> value
    for key, plan in sorted(cg.param_plan.items(), key=repr):
        if plan.is_constant:
            toks.append(f"c{key}={np.float32(plan.scalar)!r}")
    for nid in sorted(cg.kernels):
        kern = cg.kernels[nid]
        r = kern.resources()
        # arrays that ride the staged-resource path fingerprint by
        # shape/dtype only (per-instance values stack in MixedGraphBatch):
        # attrs returned as-is from resources(), plus attrs the kernel
        # declares fully captured by derived resources (_fp_staged_attrs)
        staged: set = set()
        if r is not None:
            for leaf in jax.tree_util.tree_leaves(r):
                staged.add(id(leaf))
        d = getattr(kern, "__dict__", None)
        for name in getattr(kern, "_fp_staged_attrs", ()):
            if d and isinstance(d.get(name), np.ndarray):
                staged.add(id(d[name]))
        staged_ids = frozenset(staged)
        toks.append(f"k{nid}:{type(kern).__name__}")
        if d:
            for name in sorted(d):
                toks.append(name)
                _fp_tokens(d[name], toks, staged_ids=staged_ids)
        if r is not None:
            for lk in sorted(r):
                arr = np.asarray(r[lk])
                toks.append(f"r{lk}:{arr.shape}{arr.dtype}")
    return hashlib.sha256("|".join(toks).encode()).hexdigest()


class MixedGraphBatch:
    """Batch-render a heterogeneous corpus of graphs in one call.

    Contexts are bucketed by `graph_fingerprint`; each bucket compiles
    ONCE (the first member's trace serves all members) and renders as a
    vmapped batch with per-instance dense automation, initial states, and
    stacked resources where members' staged arrays differ (e.g. different
    audio buffers of the same shape).  Contexts whose structure, baked
    constants, length, or resource shapes differ land in different
    buckets — correctness never depends on bucketing, only compile count
    does.  Build same-topology contexts in the same node order: node ids
    are part of the structure.

    SURVEY §7 build-plan item 8: "mixed topologies -> bucketed compile
    cache keyed on graph hash".  No reference counterpart (the reference
    renders one graph per thread)."""

    def __init__(self, contexts, mesh: Optional[Mesh] = None):
        contexts = list(contexts)
        if not contexts:
            raise ValueError("need at least one context")
        self.contexts = contexts
        self.mesh = mesh
        cgs = [_compiler.compile_graph(
            dict(c._nodes), list(c._edges), c.sample_rate, c.length,
            c._destination.node_id) for c in contexts]
        buckets: dict = {}
        for idx, (ctx, cg) in enumerate(zip(contexts, cgs)):
            buckets.setdefault(graph_fingerprint(cg), []).append((idx, ctx, cg))
        self._buckets = []
        for fp, members in buckets.items():
            idxs = [m[0] for m in members]
            leader_idx, leader_ctx, leader_cg = members[0]
            bucket_mesh = mesh
            if mesh is not None and len(members) % mesh.devices.size != 0:
                bucket_mesh = None  # odd bucket: render unsharded
            gb = GraphBatch(leader_ctx, batch=len(members),
                            mesh=bucket_mesh, _cg=leader_cg)
            # per-instance dense automation straight from each member's
            # own compiled timelines (row order is part of the fingerprint)
            padded = gb.nb * gb.cg.block_frames
            for j, (_, ctx, cg) in enumerate(members):
                rows = _compiler.pack_dense_params(cg, padded,
                                                   plans=cg.param_plan)
                gb._xs[j] = rows.reshape(
                    rows.shape[0], gb.nb, gb.cg.block_frames).transpose(1, 0, 2)
            # initial states: stacked per member (a worklet processor's
            # processor_options, an analyser's ring, etc. may differ even
            # inside one bucket — broadcasting the leader's states would
            # silently run the leader's state for every member)
            member_states = [
                {_compiler._k(nid): k.init_state()
                 for nid, k in cg.kernels.items()}
                for (_, _, cg) in members]
            gb._states = jax.tree_util.tree_map(
                lambda *xs: jnp.stack([jnp.asarray(x) for x in xs]),
                *member_states)
            # resources: leaves identical across members stay shared;
            # differing leaves stack along a new batch axis and vmap
            member_res = [_compiler.collect_resources(cg)
                          for (_, _, cg) in members]
            for nk, leaves in gb._resources.items():
                for lk in leaves:
                    arrs = [np.asarray(mr[nk][lk]) for mr in member_res]
                    if all(np.array_equal(arrs[0], a) for a in arrs[1:]):
                        continue
                    gb._resources[nk][lk] = np.stack(arrs)
                    gb._batched_resources.add((nk, lk))
            gb._staged = None
            gb._fn = None
            self._buckets.append((idxs, gb))

    @property
    def num_buckets(self) -> int:
        return len(self._buckets)

    def render(self) -> list:
        """Render every context; returns a list aligned with the input
        order, each entry a (channels, length) float32 numpy array."""
        results: list = [None] * len(self.contexts)
        # dispatch all buckets first (device queues pipeline), fetch after
        outs = [(idxs, gb, gb.render()) for idxs, gb in self._buckets]
        for idxs, gb, out in outs:
            host = np.asarray(out)
            for j, idx in enumerate(idxs):
                results[idx] = host[j, :, : gb.total_frames]
        return results
