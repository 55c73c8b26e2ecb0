"""Priority propagation + scheduler-steering tests.

Ports the reference's embedded unit test (`/root/reference/src/priority.rs:170-271`)
and the scheduler priority test (`integration_tests.rs:412-492`).
"""

from kanter_core_tpu import (
    LiveGraph,
    MixType,
    Node,
    NodeState,
    NodeType,
    ResizeFilter,
    ResizePolicy,
    Size,
    SlotId,
    TextureProcessor,
)
from kanter_core_tpu.node_graph import NodeGraph
from kanter_core_tpu.priority import PriorityPropagator


def _add_node_with_prio(node_graph, propagator, val):
    node_id = node_graph.add_node(Node(NodeType.Mix(MixType.ADD)))
    prio = node_graph.node(node_id).priority
    prio.set_priority(val)
    propagator.push_priority(node_id, prio)
    return node_id


def test_propagate_priority():
    """DAG:  1──2──┐
                   4──5
               3──┘
    Ancestors of the prio-5 node inherit 5 (`priority.rs:178-246`)."""
    node_graph = NodeGraph()
    propagator = PriorityPropagator()

    prios = [3, -10, 8, 5, 0]
    nodes = [_add_node_with_prio(node_graph, propagator, p) for p in prios]
    n1, n2, n3, n4, n5 = nodes

    node_graph.connect(n1, n2, SlotId(0), SlotId(0))
    node_graph.connect(n2, n4, SlotId(0), SlotId(0))
    node_graph.connect(n3, n4, SlotId(0), SlotId(1))
    node_graph.connect(n4, n5, SlotId(0), SlotId(0))

    propagator.update(node_graph)

    expected = [
        (n3, 8),  # own 8 > child 5
        (n4, 5),
        (n1, 5),  # inherited through 2 → 4
        (n5, 0),
        (n2, 5),
    ]
    # entries are sorted by own priority; pop from the back like the
    # reference's assertions
    for expected_node, expected_prio in expected:
        node_id, prio = propagator.priorities.pop()
        assert node_id == expected_node
        assert prio.propagated_priority() == expected_prio
        assert not prio.touched()


def _priority_internal(max_processing: int, large_priority: int) -> bool:
    """True iff the large node finished before both small siblings."""
    SIZE = 400
    tp = TextureProcessor(10_000_000)
    try:
        tp.set_max_processing_nodes(max_processing)
        lg = tp.new_live_graph()
        with lg.write() as g:
            value_node = g.add_node(Node(NodeType.Value(0.5)))

            def resize_node(size):
                return (
                    Node(NodeType.Mix())
                    .with_resize_filter(ResizeFilter.NEAREST)
                    .with_resize_policy(ResizePolicy.SpecificSize(Size(size, size)))
                )

            # distinct sizes → distinct recipes, so the memoization cache
            # cannot serve the siblings from one evaluation (this test is
            # about scheduling order, not caching)
            small_1 = g.add_node(resize_node(SIZE))
            small_2 = g.add_node(resize_node(SIZE + 1))
            large = g.add_node(resize_node(SIZE + 2))
            g.node(large).priority.set_priority(large_priority)
            g.connect(value_node, small_1, SlotId(0), SlotId(0))
            g.connect(value_node, large, SlotId(0), SlotId(0))
            g.connect(value_node, small_2, SlotId(0), SlotId(0))
            g.auto_update = True

        with LiveGraph.await_clean_read(lg, large) as g:
            return not (
                g.node_state(small_1) == NodeState.CLEAN
                and g.node_state(small_2) == NodeState.CLEAN
            )
    finally:
        tp.shutdown_now()


def test_priority_scheduling():
    # With slots to spare and low priority, the large node finishes last.
    assert not _priority_internal(2, -1)
    # Serialized with high priority: the large node runs first.
    # (The reference also asserts the max_processing=2 variant, but its
    # outcome depends on kernels taking ~100 ms on CPU; with fused XLA
    # kernels finishing in microseconds the ordering is noise, so admission
    # behavior is asserted deterministically below instead.)
    assert _priority_internal(1, 1)


def test_admission_control_preemption(tex_pro):
    """ProcessPackManager: priority-sorted admission, cap, and preemption of
    the lowest-priority running pack (`process_pack.rs:33-96`)."""
    from kanter_core_tpu.process_pack import ProcessPack, ProcessPackManager

    lg = tex_pro.new_live_graph()
    with lg.write() as g:
        nodes = [g.add_node(Node(NodeType.Value(0.0))) for _ in range(4)]

    prios = [0, 2, -3, 5]
    for node_id, p in zip(nodes, prios):
        lg.node(node_id).priority.set_priority(p)
        lg.node(node_id).priority._store_propagated(p)
        lg.request(node_id)  # in-flight-eligible state; settled (Dirty/Clean)
        # packs are purged by the manager

    manager = ProcessPackManager()
    manager.max_count = 2

    packs = [ProcessPack(nid, lg.node(nid).priority, lg) for nid in nodes]
    admitted = manager.update(packs[:3])  # prios 0, 2, -3 → cap 2
    assert [int(p.node_id) for p in admitted] == [int(nodes[1]), int(nodes[0])]

    # A higher-priority pack preempts the lowest-priority running one,
    # cancelling its node.
    admitted2 = manager.update([packs[3]])  # prio 5
    assert [int(p.node_id) for p in admitted2] == [int(nodes[3])]
    assert lg.node(nodes[0]).cancel.load()  # prio 0 was preempted
    assert not lg.node(nodes[3]).cancel.load()
