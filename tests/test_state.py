"""Scheduler/state-machine behavior tests.

Ports `input_output_intercept` (`integration_tests.rs:335-410`), `no_cache` /
`use_cache` (`:249-305`), `read_dirty_read` (`:1386-1437`), `unconnected_node`
(`:740-770`), and the `temp` connect-ordering race (`:1162-1205`).
"""

import time

import numpy as np
import pytest

from conftest import IMAGE_2, render_u8

from kanter_core_tpu import (
    ErrorKind,
    LiveGraph,
    MixType,
    Node,
    NodeState,
    NodeType,
    ResizeFilter,
    ResizePolicy,
    Side,
    Size,
    SlotId,
    TexProError,
)


def test_input_output_intercept(tex_pro):
    """Under auto_update an intermediate node is observably Clean before the
    final output (incremental scheduling is visible)."""
    lg = tex_pro.new_live_graph()
    with lg.write() as g:
        g.auto_update = True
        input_node = g.add_node(Node(NodeType.Image(IMAGE_2)))
        resize_1 = g.add_node(
            Node(NodeType.Mix())
            .with_resize_filter(ResizeFilter.LANCZOS3)
            .with_resize_policy(ResizePolicy.SpecificSize(Size(10, 10)))
        )
        resize_2 = g.add_node(
            Node(NodeType.Mix())
            .with_resize_filter(ResizeFilter.LANCZOS3)
            .with_resize_policy(ResizePolicy.SpecificSize(Size(20, 20)))
        )
        resize_3 = g.add_node(
            Node(NodeType.Mix())
            .with_resize_filter(ResizeFilter.LANCZOS3)
            .with_resize_policy(ResizePolicy.SpecificSize(Size(30, 30)))
        )
        output_node = g.add_node(Node(NodeType.OutputRgba("out")))
        g.connect(input_node, resize_1, SlotId(0), SlotId(0))
        g.connect(resize_1, resize_2, SlotId(0), SlotId(0))
        g.connect(resize_2, resize_3, SlotId(0), SlotId(0))
        g.connect(resize_3, output_node, SlotId(0), SlotId(0))

    intercepted = False
    while True:
        with lg.read() as g:
            if g.node_state(output_node) == NodeState.CLEAN:
                break
            if g.node_state(resize_1) == NodeState.CLEAN:
                intercepted = True
                break
    assert intercepted


def test_no_cache(tex_pro):
    """Without use_cache, intermediate results are discarded once their
    consumers are done."""
    lg = tex_pro.new_live_graph()
    with lg.write() as g:
        value_node = g.add_node(Node(NodeType.Value(1.0)))
        output_node = g.add_node(Node(NodeType.OutputGray("out")))
        g.connect(value_node, output_node, SlotId(0), SlotId(0))
    with LiveGraph.await_clean_read(lg, output_node) as g:
        with pytest.raises(TexProError) as exc:
            g.slot_data(value_node, SlotId(0))
        assert exc.value.kind == ErrorKind.NO_SLOT_DATA


def test_use_cache(tex_pro):
    lg = tex_pro.new_live_graph()
    with lg.write() as g:
        value_node = g.add_node(Node(NodeType.Value(1.0)))
        output_node = g.add_node(Node(NodeType.OutputGray("out")))
        g.connect(value_node, output_node, SlotId(0), SlotId(0))
        g.use_cache = True
    with LiveGraph.await_clean_read(lg, output_node) as g:
        g.slot_data(value_node, SlotId(0))  # must not raise


def test_unconnected_node(tex_pro):
    """A dangling extra node must not wedge auto_update evaluation."""
    lg = tex_pro.new_live_graph()
    with lg.write() as g:
        input_1 = g.add_node(Node(NodeType.Value(0.0)))
        g.add_node(Node(NodeType.Value(0.0)))
        output_node = g.add_node(Node(NodeType.OutputGray("out")))
        g.connect(input_1, output_node, SlotId(0), SlotId(0))
        g.auto_update = True
    time.sleep(0.5)
    render_u8(lg, output_node)


def test_read_dirty_read(tex_pro):
    """Re-evaluation after a dirty cycle yields identical pixels."""
    lg = tex_pro.new_live_graph()
    with lg.write() as g:
        g.use_cache = True
        val_node = g.add_node(Node(NodeType.Value(0.5)))
        combine_node = g.add_node(Node(NodeType.CombineRgba()))
        g.connect(val_node, combine_node, SlotId(0), SlotId(0))

    def verify_pixel(identifier):
        with LiveGraph.await_clean_read(lg, combine_node) as g:
            pixels = g.slot_data(combine_node, SlotId(0)).image.to_u8()
        assert pixels.tolist() == [127, 0, 0, 255], identifier

    verify_pixel("Before dirty")
    with lg.write() as g:
        g.disconnect_slot(val_node, Side.OUTPUT, SlotId(0))
        g.connect(val_node, combine_node, SlotId(0), SlotId(0))
    verify_pixel("After dirty")


def test_connect_ordering_race(tex_pro):
    """Connecting downstream first, then upstream, with auto_update+use_cache
    (the reference's `temp` regression, `:1162-1205`)."""
    lg = LiveGraph(tex_pro.buffer_queue)
    lg.auto_update = True
    lg.use_cache = True
    tex_pro.push_live_graph(lg)

    with lg.write() as g:
        value_node = g.add_node(Node(NodeType.Value(0.5)))
        combine_node = g.add_node(Node(NodeType.CombineRgba()))
        separate_node = g.add_node(Node(NodeType.SeparateRgba()))
        g.connect(combine_node, separate_node, SlotId(0), SlotId(0))
        time.sleep(0.1)
        g.connect(value_node, combine_node, SlotId(0), SlotId(0))
        time.sleep(0.1)

    with LiveGraph.await_clean_read(lg, combine_node) as g:
        assert g.slot_data_size(combine_node, SlotId(0)) == Size(1, 1)


def test_changed_consume(tex_pro):
    lg = tex_pro.new_live_graph()
    with lg.write() as g:
        a = g.add_node(Node(NodeType.Value(0.0)))
        b = g.add_node(Node(NodeType.OutputGray("out")))
        changed = set(g.changed_consume())
        assert changed == {a, b}
        g.connect(a, b, SlotId(0), SlotId(0))
        assert b in set(g.changed_consume())
        assert g.changed_consume() == []


def test_fatal_error_surfaces(tex_pro):
    """A kernel error (dangling HeightToNormal has no input) shuts the engine
    down and surfaces at await instead of hanging (reference behavior is an
    engine panic, `engine.rs:111-119`)."""
    lg = tex_pro.new_live_graph()
    with lg.write() as g:
        h2n = g.add_node(Node(NodeType.HeightToNormal()))
        g.request(h2n)
    with pytest.raises(TexProError):
        with LiveGraph.await_clean_read(lg, h2n):
            pass


def test_deep_chain_walks_no_recursion_limit(tex_pro):
    """All graph walks (dirty propagation, frontier, recursive children,
    topo sort, priority propagation) must handle a 3000-node chain — far
    beyond the interpreter recursion limit — because they are iterative."""
    from kanter_core_tpu.graphs import deep_chain_graph
    from kanter_core_tpu.compiler import _topo_order

    graph, inputs, white, out = deep_chain_graph(depth=3000, nonlinear_every=0)
    lg = tex_pro.new_live_graph()
    with lg.write() as g:
        g.fuse_subgraphs = False  # walk-only test; no evaluation
        g.set_node_graph(graph)

        # dirty propagation from the root reaches every descendant
        g.set_state(white, NodeState.CLEAN)
        g.set_state(white, NodeState.DIRTY)
        assert g.node_state(out) == NodeState.DIRTY

        # frontier walk from the deepest node
        frontier = g.get_closest_processable(out)
        assert len(frontier) > 0

        # recursive children + topo order cover the whole chain
        assert len(set(g.node_graph.get_children_recursive(white))) >= 3000
        assert len(_topo_order(g.node_graph)) == len(g.node_ids())

        # priority propagation up the full chain
        g.node(out).priority.set_priority(5)
        g.propagate_priorities()
        assert g.node(white).priority.propagated_priority() == 5


def test_moderately_deep_chain_evaluates(tex_pro):
    """End-to-end evaluation of a deep chain (fused single program), and a
    Value edit observably changes the re-rendered pixels. Uses
    bounded_chain_graph: its chaotic logistic map stays value-sensitive at
    any depth (a plain add/sub chain saturates to clamp and makes edits
    unobservable — this assertion used to be vacuous because of that)."""
    from kanter_core_tpu.graphs import bounded_chain_graph
    import numpy as np
    from kanter_core_tpu import SlotData, SlotImage

    graph, inputs, white, out = bounded_chain_graph(depth=64)
    rng = np.random.default_rng(0)
    lg = tex_pro.new_live_graph()
    with lg.write() as g:
        g.set_node_graph(graph)
        for node in inputs:
            g.add_input_slot_data(
                SlotData(node, SlotId(0), SlotImage.Gray(rng.random((8, 8), np.float32)))
            )
    first = render_u8(lg, out)
    with lg.write() as g:
        g.node_mut(white).node_type = NodeType.Value(0.93)
    second = render_u8(lg, out)
    assert first.shape == second.shape
    assert not np.array_equal(first, second), "Value edit did not change pixels"


def test_midflight_edit_discards_commit(tex_pro, monkeypatch):
    """An edit while a node is Processing cancels/dirties it; the engine
    discards the stale result at commit and re-evaluates with the new
    topology (`engine.rs:77-102`)."""
    import threading

    import kanter_core_tpu.ops as ops_mod

    slow_started = threading.Event()
    release = threading.Event()
    real_process_node = ops_mod.process_node

    def slow_process_node(node, *args, **kwargs):
        from kanter_core_tpu.node import NodeTypeKind

        if node.node_type.kind == NodeTypeKind.MIX:
            slow_started.set()
            release.wait(timeout=20)
        return real_process_node(node, *args, **kwargs)

    monkeypatch.setattr(ops_mod, "process_node", slow_process_node)
    # the engine module imported `ops` as a module ref, so patching the
    # attribute on the module is seen by workers
    lg = tex_pro.new_live_graph()
    with lg.write() as g:
        g.fuse_subgraphs = False  # per-node path exercises commit-time cancel
        g.memoize = False
        a = g.add_node(Node(NodeType.Value(0.25)))
        b = g.add_node(Node(NodeType.Value(0.75)))
        mix = g.add_node(Node(NodeType.Mix(MixType.ADD)))
        out = g.add_node(Node(NodeType.OutputGray("out")))
        g.connect(a, mix, SlotId(0), SlotId(0))
        g.connect(mix, out, SlotId(0), SlotId(0))
        g.request(out)

    assert slow_started.wait(timeout=20), "mix never started processing"
    # edit while in flight: swap the input to `b` — sets cancel + dirties
    with lg.write() as g:
        g.connect(b, mix, SlotId(0), SlotId(0))
    release.set()

    pixels = render_u8(lg, out)
    assert pixels.tolist() == [191, 191, 191, 255]  # 0.75, not 0.25

    outcomes = tex_pro.timeline.counters()
    assert outcomes.get("discarded", 0) >= 1


def test_await_slot_data_size(tex_pro):
    from kanter_core_tpu import ResizePolicy, TextureProcessor

    lg = tex_pro.new_live_graph()
    with lg.write() as g:
        val = g.add_node(Node(NodeType.Value(0.5)))
        comb = Node(NodeType.CombineRgba())
        comb.resize_policy = ResizePolicy.SpecificSize(Size(17, 9))
        comb = g.add_node(comb)
        g.connect(val, comb, SlotId(0), SlotId(0))
    size = TextureProcessor.await_slot_data_size(lg, comb, SlotId(0))
    assert size == Size(17, 9)


def test_await_after_shutdown_raises():
    """Blocking waits fail fast once the processor shuts down, instead of
    spinning forever like the reference's await loops."""
    from kanter_core_tpu import TextureProcessor

    tp = TextureProcessor(10_000_000)
    lg = tp.new_live_graph()
    with lg.write() as g:
        v = g.add_node(Node(NodeType.Value(0.5)))
        out = g.add_node(Node(NodeType.OutputGray("out")))
        g.connect(v, out, SlotId(0), SlotId(0))
    tp.shutdown_now()
    with pytest.raises(TexProError):
        with LiveGraph.await_clean_read(lg, out):
            pass


def test_state_query_and_prioritise_apis(tex_pro):
    """Direct coverage for prioritise / node_ids_with(out)_state /
    try_buffer_rgba / await_clean_write (live_graph.rs:176-237, 199-206)."""
    lg = tex_pro.new_live_graph()
    with lg.write() as g:
        v = g.add_node(Node(NodeType.Value(0.25)))
        out = g.add_node(Node(NodeType.OutputGray("out")))
        g.connect(v, out, SlotId(0), SlotId(0))

        assert set(g.node_ids_with_state(NodeState.DIRTY)) == {v, out}
        assert g.node_ids_without_state(NodeState.DIRTY) == []
        import pytest

        from kanter_core_tpu.errors import ErrorKind, TexProError

        with pytest.raises(TexProError) as exc_info:  # dirty → raises + requests
            g.try_buffer_rgba(out, SlotId(0))
        assert exc_info.value.kind == ErrorKind.NODE_DIRTY

        g.prioritise(out)
        assert g.node_state(out) == NodeState.PRIORITISED

    with LiveGraph.await_clean_write(lg, out) as g:
        pixels = g.buffer_rgba(out, SlotId(0))
        assert pixels[0] == int(0.25 * 255)
        assert g.node_ids_with_state(NodeState.CLEAN) == sorted([v, out])
        assert g.try_buffer_rgba(out, SlotId(0)) is not None


def test_remove_node_dirties_consumers(tex_pro):
    from kanter_core_tpu import TextureProcessor

    """Removing a node must dirty its consumers (stale-pixel bug: the
    reference only marks them `changed` and serves old pixels; found by the
    randomized soak, seed 555999 iter 12)."""
    lg = tex_pro.new_live_graph()
    with lg.write() as g:
        a = g.add_node(Node(NodeType.Value(0.2)))
        b = g.add_node(Node(NodeType.Value(0.3)))
        m = g.add_node(Node(NodeType.Mix(MixType.ADD)))
        out = g.add_node(Node(NodeType.OutputGray("out")))
        g.connect(a, m, SlotId(0), SlotId(0))
        g.connect(b, m, SlotId(0), SlotId(1))
        g.connect(m, out, SlotId(0), SlotId(0))
    px = TextureProcessor.buffer_rgba(lg, out, SlotId(0))
    assert px[0] == int(np.float32(0.5) * 255)

    with lg.write() as g:
        g.remove_node(b)  # mix loses its right input -> must go dirty
        assert g.node_state(m) == NodeState.DIRTY
        assert g.node_state(out) == NodeState.DIRTY
    px = TextureProcessor.buffer_rgba(lg, out, SlotId(0))
    # missing right input defaults to 0.0 (mix.rs:57-68)
    assert px[0] == int(np.float32(0.2) * 255)


def test_second_edit_keeps_processing_dirty(tex_pro):
    """A second dirty-propagation over an in-flight node must NOT demote
    PROCESSING_DIRTY back to plain DIRTY — the commit-time discard keys on
    the marker, and losing it lets a stale in-flight result commit CLEAN
    with pre-edit pixels (regression; two-parent graph: edit P1, edit P2)."""
    lg = tex_pro.new_live_graph()
    with lg.write() as g:
        g.auto_update = False
        p1 = g.add_node(Node(NodeType.Value(0.1)))
        p2 = g.add_node(Node(NodeType.Value(0.2)))
        mix = g.add_node(Node(NodeType.Mix(MixType.ADD)))
        g.connect(p1, mix, SlotId(0), SlotId(0))
        g.connect(p2, mix, SlotId(0), SlotId(1))

        # simulate the engine: parents committed clean, mix in flight
        g.force_state(p1, NodeState.CLEAN)
        g.force_state(p2, NodeState.CLEAN)
        g._set_state_raw(mix, NodeState.PROCESSING)
        # first edit: P1 dirties -> mix becomes PROCESSING_DIRTY
        g.set_state(p1, NodeState.DIRTY)
        assert g.node_state(mix) == NodeState.PROCESSING_DIRTY
        # second edit: P2 dirties -> mix must STAY PROCESSING_DIRTY
        g.set_state(p2, NodeState.DIRTY)
        assert g.node_state(mix) == NodeState.PROCESSING_DIRTY, (
            "second propagation erased the in-flight marker"
        )
        # commit-path demotion still works (force_state is the escape hatch)
        g.force_state(mix, NodeState.DIRTY)
        assert g.node_state(mix) == NodeState.DIRTY


@pytest.mark.filterwarnings("ignore::pytest.PytestUnhandledThreadExceptionWarning")
def test_engine_thread_crash_surfaces_on_waiters():
    """An unexpected exception escaping the scheduler loop must surface as
    fatal_error on every live graph (and set shutdown) instead of killing
    the daemon silently and stranding blocked waiters forever."""
    from kanter_core_tpu import TextureProcessor

    tp = TextureProcessor(10_000_000)
    try:
        lg = tp.new_live_graph()
        with lg.write() as g:
            val = g.add_node(Node(NodeType.Value(0.5)))
            out = g.add_node(Node(NodeType.OutputGray("o")))
            g.connect(val, out, SlotId(0), SlotId(0))

        boom = RuntimeError("synthetic scheduler crash")

        def crash(*_a, **_k):
            raise boom

        tp.engine._collect_packs = crash
        tp.engine.wake()
        with pytest.raises(RuntimeError, match="synthetic scheduler crash"):
            TextureProcessor.buffer_rgba(lg, out, SlotId(0))
        assert tp.shutdown.load()
    finally:
        tp.shutdown_now()
