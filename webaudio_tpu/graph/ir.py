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
    adj = {v: [] for v in verts}
    indeg = {v: 0 for v in verts}
    for s, d in vedges:
        adj[s].append(d)
        indeg[d] += 1
    # Kahn, stable by insertion order for determinism
    from collections import deque

    queue = deque(v for v in verts if indeg[v] == 0)
    order = []
    while queue:
        v = queue.popleft()
        order.append(v)
        for w in adj[v]:
            indeg[w] -= 1
            if indeg[w] == 0:
                queue.append(w)
    assert len(order) == len(verts), "ordering failed; residual cycle"
    return OrderedGraph(order=order, muted=muted, cycle_breakers=cut,
                        has_cycle=has_cycle)
