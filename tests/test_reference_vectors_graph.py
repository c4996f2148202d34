"""Graph-ordering test transcriptions (reference:
src/render/graph/test.rs sort_* corpus) against `graph.ir.order_graph`,
whose cycle rules mirror graph.rs:331-487 (mute unbreakable cycles, cut a
delay's internal writer->reader edge otherwise).

The reference's ordering drops muted nodes; ours keeps them in the order
(their kernels emit silence), so assertions compare the order filtered of
muted ids plus the muted set itself.
"""

from webaudio_tpu.graph.ir import Edge, order_graph


def _order(node_ids, edges, delays=()):
    og = order_graph(node_ids,
                     [Edge(s, 0, d, 0) for s, d in edges],
                     set(delays))
    node_order = [nid for (nid, role) in og.order
                  if role in ("node", "writer") and nid not in og.muted]
    # delay nodes appear as reader+writer; count each once (at its writer,
    # the position that matters for cycle-breaking order checks)
    seen = []
    for n in node_order:
        if n not in seen:
            seen.append(n)
    return seen, og


def test_sort_linear():
    order, og = _order([1, 2, 3], [(1, 2), (2, 3)])
    assert order == [1, 2, 3]
    assert not og.muted and not og.has_cycle


def test_sort_fork():
    order, og = _order([10, 11, 20, 21, 3],
                       [(10, 11), (11, 3), (20, 21), (21, 3)])
    assert order.index(10) < order.index(11) < order.index(3)
    assert order.index(20) < order.index(21) < order.index(3)


def test_sort_no_cycle():
    order, og = _order([1, 2, 3], [(1, 2), (2, 3), (1, 3)])
    assert order == [1, 2, 3]
    assert not og.has_cycle


def test_sort_mute_cycle():
    # 2 <-> 3 with no delay: both mute; 1 and 4 still render
    order, og = _order([1, 2, 3, 4], [(1, 2), (2, 3), (3, 2), (2, 4)])
    assert og.muted == {2, 3}
    assert order == [1, 4]
    assert og.has_cycle


def test_sort_cycle_breaker():
    # 2 <-> 3 with 3 a delay: the 3->2 back edge is cut via the delay's
    # internal split; nothing mutes
    order, og = _order([1, 2, 3, 4], [(1, 2), (2, 3), (3, 2), (2, 4)],
                       delays=[3])
    assert not og.muted
    assert og.cycle_breakers == {3}
    assert order.index(1) < order.index(2)
    assert order.index(2) < order.index(3)
    assert order.index(2) < order.index(4)


def test_sort_dont_break_cycle_if_possible():
    # a delay in a straight line is NOT split: 1 -> 2(delay) -> 3 orders
    # linearly with no cycle breaking
    order, og = _order([1, 2, 3], [(1, 2), (2, 3)], delays=[2])
    assert order == [1, 2, 3]
    assert not og.cycle_breakers
    assert not og.has_cycle


def test_sort_two_cycles():
    # two cycles through node 2, each via its own delay: both break
    order, og = _order([1, 2, 3, 4, 5],
                       [(1, 2), (2, 3), (3, 2), (2, 5), (2, 4), (4, 2)],
                       delays=[3, 4])
    assert not og.muted
    assert og.cycle_breakers == {3, 4}
    assert order[0] == 1
    assert order[1] == 2
    assert len(order) == 5
