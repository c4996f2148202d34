"""Graph IR: connection bookkeeping, cycle analysis, topological ordering.

reference: src/render/graph.rs:331-487 (DFS ordering, cycle breaking via
DelayNode, muting unbreakable cycles).  Here ordering happens at *compile*
time on the control side; DelayNodes are represented as writer/reader vertex
pairs exactly like the reference's two-node split (src/node/delay.rs:376-684)
so that dropping the writer->reader edge breaks cycles.
"""

from __future__ import annotations

from dataclasses import dataclass


@dataclass(frozen=True)
class Edge:
    src: int          # node id
    src_output: int
    dst: int          # node id
    dst_input: int    # input port index, or -1 for param connections
    param: str | None = None


@dataclass
class OrderedGraph:
    """Result of `order_graph`."""
    order: list[tuple[int, str]]          # (node_id, role) role in {"node","reader","writer"}
    muted: set[int]                       # nodes in unbreakable cycles
    cycle_breakers: set[int]              # delay nodes whose internal edge was cut
    has_cycle: bool                       # any SCC required breaking/muting
    # vertices of each BROKEN cyclic SCC (the uncut graph's cycles), each
    # listed in cut-graph topo order and guaranteed CONTIGUOUS in `order` —
    # the two-rate compiler steps exactly these at the delay-bounded rate
    # while the acyclic remainder runs large blocks (compiler.py)
    cycle_groups: list[list[tuple[int, str]]] = None


def _vertices_and_edges(node_ids, edges, cycle_breaker_ids, cut_internal: set[int]):
    """Expand nodes to vertices.  A cycle-breaker node splits into
    (id, 'writer') and (id, 'reader'); others are (id, 'node').
    Edges into a breaker target its writer; edges out of it originate at its
    reader.  The internal writer->reader edge exists unless cut."""
    verts = []
    for n in node_ids:
        if n in cycle_breaker_ids:
            verts.append((n, "writer"))
            verts.append((n, "reader"))
        else:
            verts.append((n, "node"))
    vedges = []
    for e in edges:
        src = (e.src, "reader") if e.src in cycle_breaker_ids else (e.src, "node")
        dst = (e.dst, "writer") if e.dst in cycle_breaker_ids else (e.dst, "node")
        vedges.append((src, dst))
    for n in cycle_breaker_ids:
        if n not in cut_internal:
            vedges.append(((n, "writer"), (n, "reader")))
    return verts, vedges


def _tarjan_scc(verts, vedges):
    adj = {v: [] for v in verts}
    for s, d in vedges:
        adj[s].append(d)
    index = {}
    low = {}
    on_stack = set()
    stack = []
    sccs = []
    counter = [0]

    # iterative Tarjan
    for root in verts:
        if root in index:
            continue
        work = [(root, 0)]
        while work:
            v, pi = work[-1]
            if pi == 0:
                index[v] = low[v] = counter[0]
                counter[0] += 1
                stack.append(v)
                on_stack.add(v)
            recurse = False
            for i in range(pi, len(adj[v])):
                w = adj[v][i]
                if w not in index:
                    work[-1] = (v, i + 1)
                    work.append((w, 0))
                    recurse = True
                    break
                elif w in on_stack:
                    low[v] = min(low[v], index[w])
            if recurse:
                continue
            work.pop()
            if low[v] == index[v]:
                scc = []
                while True:
                    w = stack.pop()
                    on_stack.discard(w)
                    scc.append(w)
                    if w == v:
                        break
                sccs.append(scc)
            if work:
                parent = work[-1][0]
                low[parent] = min(low[parent], low[v])
    return sccs


def order_graph(node_ids: list[int], edges: list[Edge],
                delay_node_ids: set[int]) -> OrderedGraph:
    """Topologically order the graph with the reference's cycle rules:

    1. find strongly-connected components (incl. self-loops);
    2. cycles containing a DelayNode: cut the delay's internal writer->reader
       edge (the delay then provides >= 1 block of latency,
       reference: delay.rs:535-542, graph.rs:418-487);
    3. cycles without one: mute every node in the cycle
       (reference: graph.rs:331-402).
    """
    cut: set[int] = set()
    muted: set[int] = set()
    has_cycle = False

    for _ in range(len(node_ids) + 1):
        verts, vedges = _vertices_and_edges(node_ids, edges, delay_node_ids, cut)
        # self-loop check: Tarjan gives singleton SCCs for self-loops too
        self_loops = {s for s, d in vedges if s == d}
        sccs = _tarjan_scc(verts, vedges)
        cyclic = [scc for scc in sccs
                  if len(scc) > 1 or (len(scc) == 1 and scc[0] in self_loops)]
        if not cyclic:
            break
        has_cycle = True
        progressed = False
        for scc in cyclic:
            delay_in_scc = [nid for (nid, role) in scc
                            if nid in delay_node_ids and nid not in cut]
            # the internal edge must actually be part of this SCC
            breakable = [nid for nid in delay_in_scc
                         if (nid, "writer") in scc and (nid, "reader") in scc]
            if breakable:
                cut.update(breakable)
                progressed = True
            else:
                muted.update(nid for (nid, role) in scc)
                progressed = True
        if not progressed:  # pragma: no cover
            break

    # final ordering on the acyclic expanded graph (muted nodes still ordered;
    # their kernels emit silence like the reference's marked nodes)
    verts, vedges = _vertices_and_edges(node_ids, edges, delay_node_ids, cut)
    vedges = [(s, d) for (s, d) in vedges
              if s[0] not in muted and d[0] not in muted]

    # identify the BROKEN cyclic SCCs of the uncut graph: contracting them
    # cannot create condensation cycles (any out-and-back-in path would run
    # through a cut internal edge and hence be part of the same SCC), so
    # each can be ordered as one contiguous cluster — the two-rate
    # compiler's unit of delay-bounded stepping
    verts0, vedges0 = _vertices_and_edges(node_ids, edges, delay_node_ids,
                                          set())
    vedges0 = [(s, d) for (s, d) in vedges0
               if s[0] not in muted and d[0] not in muted]
    self_loops0 = {s for s, d in vedges0 if s == d}
    group_of: dict = {}
    groups_raw: list = []
    for scc in _tarjan_scc([v for v in verts0 if v[0] not in muted],
                           vedges0):
        if len(scc) > 1 or (len(scc) == 1 and scc[0] in self_loops0):
            gi = len(groups_raw)
            groups_raw.append(set(scc))
            for v in scc:
                group_of[v] = gi

    # cluster-level Kahn (clusters = broken SCCs; singletons otherwise),
    # stable by first-vertex insertion order for determinism
    from collections import deque

    def cl(v):
        return ("g", group_of[v]) if v in group_of else ("v", v)

    cl_order = []
    cl_seen = set()
    for v in verts:
        c = cl(v)
        if c not in cl_seen:
            cl_seen.add(c)
            cl_order.append(c)
    cadj = {c: [] for c in cl_order}
    cindeg = {c: 0 for c in cl_order}
    for s, d in vedges:
        cs, cd = cl(s), cl(d)
        if cs != cd:
            cadj[cs].append(cd)
            cindeg[cd] += 1

    def _intra_order(gi):
        """Topo order of one cluster's vertices over intra-cluster CUT
        edges (reader -> ... -> writer; the internal edge is cut)."""
        members = [v for v in verts if group_of.get(v) == gi]
        madj = {v: [] for v in members}
        mindeg = {v: 0 for v in members}
        for s, d in vedges:
            if group_of.get(s) == gi and group_of.get(d) == gi:
                madj[s].append(d)
                mindeg[d] += 1
        q = deque(v for v in members if mindeg[v] == 0)
        out = []
        while q:
            v = q.popleft()
            out.append(v)
            for w in madj[v]:
                mindeg[w] -= 1
                if mindeg[w] == 0:
                    q.append(w)
        assert len(out) == len(members), "intra-group ordering failed"
        return out

    queue = deque(c for c in cl_order if cindeg[c] == 0)
    order = []
    cycle_groups = []
    emitted = 0
    while queue:
        c = queue.popleft()
        if c[0] == "v":
            order.append(c[1])
        else:
            grp = _intra_order(c[1])
            cycle_groups.append(grp)
            order.extend(grp)
        emitted += 1
        for w in cadj[c]:
            cindeg[w] -= 1
            if cindeg[w] == 0:
                queue.append(w)
    assert len(order) == len(verts), "ordering failed; residual cycle"
    return OrderedGraph(order=order, muted=muted, cycle_breakers=cut,
                        has_cycle=has_cycle, cycle_groups=cycle_groups)
