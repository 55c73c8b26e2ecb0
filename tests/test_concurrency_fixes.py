"""Regression tests for the round-3 concurrency review findings: engine
survival on removed-node commits, worker-pool accounting under churn,
nested-Graph admission at a cap of 1, stale-Clean edit races, and blocking
getters failing fast after shutdown."""

import threading
import time

import numpy as np
import pytest

from conftest import HEART_128, render_u8

from kanter_core_tpu import (
    MixType,
    Node,
    NodeGraph,
    NodeState,
    NodeType,
    Side,
    SlotId,
    TexProError,
    TextureProcessor,
)


def test_commit_for_removed_node_does_not_kill_engine(tex_pro):
    """A result committing for a node removed mid-flight must be discarded,
    not crash the engine thread (which would leave shutdown False and every
    waiter spinning forever)."""
    lg = tex_pro.new_live_graph()
    with lg.write() as g:
        v = g.add_node(Node(NodeType.Value(0.5)))
        out = g.add_node(Node(NodeType.OutputGray("out")))
        g.connect(v, out, SlotId(0), SlotId(0))
    render_u8(lg, out)

    # simulate the race directly: node marked PROCESSING, then removed,
    # then its (stale) result arrives at the commit path
    with lg.write() as g:
        g._set_state_raw(v, NodeState.PROCESSING)
        datas = [d for d in g.slot_datas if d.node_id == v]
        g.remove_node(v)
    with lg.write() as g:
        tex_pro.engine._commit_success(g, v, datas)  # must not raise

    # engine still alive: a fresh graph evaluates
    lg2 = tex_pro.new_live_graph()
    with lg2.write() as g:
        v2 = g.add_node(Node(NodeType.Value(0.25)))
        out2 = g.add_node(Node(NodeType.OutputGray("out")))
        g.connect(v2, out2, SlotId(0), SlotId(0))
    assert render_u8(lg2, out2) is not None


def test_worker_pool_no_stranded_tasks_under_churn():
    """Hammer the pool with bursts separated by idle gaps at a tiny TTL (the
    retire/steal races need workers constantly expiring); every task must
    run — a leaked idle token would strand one forever."""
    from kanter_core_tpu.engine import _WorkerPool

    pool = _WorkerPool(name="churn-test")
    pool.IDLE_TTL_SECONDS = 0.02
    done = []
    lock = threading.Lock()

    def task(i):
        with lock:
            done.append(i)

    total = 0
    for burst in range(30):
        for i in range(4):
            pool.submit(task, total)
            total += 1
        time.sleep(0.01 if burst % 3 else 0.05)  # straddle the TTL
    deadline = time.time() + 20
    while len(done) < total and time.time() < deadline:
        time.sleep(0.01)
    assert len(done) == total, f"{total - len(done)} tasks stranded"


def test_nested_graph_completes_with_admission_cap_one():
    """A nested Graph node's worker BLOCKS a slot while its inner graph
    runs; with max_processing_nodes=1 the inner dispatches previously could
    never be admitted (equal priority can't preempt) — permanent deadlock.
    Graph packs now bypass the cap."""
    from kanter_core_tpu.graphs import invert_graph

    tp = TextureProcessor(10_000_000)
    try:
        tp.set_max_processing_nodes(1)
        lg = tp.new_live_graph()
        with lg.write() as g:
            g.fuse_subgraphs = False  # force the per-node path end to end
            img = g.add_node(Node(NodeType.Image(str(HEART_128))))
            sep = g.add_node(Node(NodeType.SeparateRgba()))
            g.connect(img, sep, SlotId(0), SlotId(0))
            inner = invert_graph()
            gn = g.add_node(Node(NodeType.Graph(inner)))
            g.connect(sep, gn, SlotId(0), inner.input_slot_id_with_name("in"))
            out = g.add_node(Node(NodeType.OutputGray("out")))
            g.connect(gn, out, inner.output_slot_id_with_name("out"), SlotId(0))
        assert render_u8(lg, out) is not None  # watchdog fails a deadlock
    finally:
        tp.shutdown_now()


def test_disconnect_output_side_dirties_consumer(tex_pro):
    """disconnect_slot on the OUTPUT side must dirty the consumers
    themselves, not just their descendants — a Clean consumer would serve
    pixels computed from an edge that no longer exists."""
    lg = tex_pro.new_live_graph()
    with lg.write() as g:
        a = g.add_node(Node(NodeType.Value(0.25)))
        b = g.add_node(Node(NodeType.Value(0.5)))
        mix = g.add_node(Node(NodeType.Mix(MixType.ADD)))
        out = g.add_node(Node(NodeType.OutputGray("out")))
        g.connect(a, mix, SlotId(0), SlotId(0))
        g.connect(b, mix, SlotId(0), SlotId(1))
        g.connect(mix, out, SlotId(0), SlotId(0))
    before = render_u8(lg, out)  # 0.75
    with lg.write() as g:
        g.disconnect_slot(b, Side.OUTPUT, SlotId(0))
        assert g.node_state(mix) != NodeState.CLEAN, "consumer left Clean"
    after = render_u8(lg, out)  # 0.25 + default 0
    assert not np.array_equal(before, after)


def test_set_node_graph_cancels_in_flight_ids(tex_pro):
    """Swapping the node graph while a same-id node is in flight marks the
    NEW node canceled, so the old graph's commit is discarded instead of
    landing as Clean pixels for a graph that no longer exists."""
    lg = tex_pro.new_live_graph()
    g1 = NodeGraph()
    v1 = g1.add_node(Node(NodeType.Value(0.1)))
    with lg.write() as g:
        g.set_node_graph(g1)
        g._set_state_raw(v1, NodeState.PROCESSING)  # simulate in-flight
        g2 = NodeGraph()
        v2 = g2.add_node(Node(NodeType.Value(0.9)))
        assert v2 == v1  # same id numbering
        g.set_node_graph(g2)
        assert g.node_graph.node(v2).cancel.load(), "in-flight id not canceled"


def test_await_slot_data_size_fails_fast_after_shutdown():
    tp = TextureProcessor(10_000_000)
    lg = tp.new_live_graph()
    with lg.write() as g:
        v = g.add_node(Node(NodeType.Value(0.5)))
    tp.shutdown_now()
    with pytest.raises(TexProError):
        TextureProcessor.await_slot_data_size(lg, v, SlotId(0))

def test_manager_tick_abandons_evictions_on_shutdown():
    """During shutdown the manager must neither START new device→host copies
    nor keep draining a long victim queue — exiting with a daemon mid-transfer
    unwinds through C++ and aborts the interpreter (observed as rc=134,
    "FATAL: exception not rethrown", after large eviction benchmarks)."""
    import jax
    import numpy as np

    from kanter_core_tpu.node import AtomicFlag
    from kanter_core_tpu.transient_buffer import (
        AtomicUsize,
        PlaneBuffer,
        PlaneBufferQueue,
        Tier,
    )

    shutdown = AtomicFlag(False)
    queue = PlaneBufferQueue(AtomicUsize(0), shutdown)  # everything over budget
    bufs = [
        PlaneBuffer(device=jax.device_put(np.full((8, 8), i, np.float32)))
        for i in range(4)
    ]
    for b in bufs:
        queue.add_buffer(b)
    shutdown.store(True)
    queue.tick()
    assert all(b.tier == Tier.DEVICE for b in bufs), (
        "manager started evictions during shutdown"
    )
    # sanity: with shutdown clear the same tick DOES evict
    shutdown.store(False)
    queue.tick()
    assert any(b.tier == Tier.HOST for b in bufs)
