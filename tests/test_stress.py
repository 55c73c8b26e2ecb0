"""Concurrency stress: concurrent edits + reads must never deadlock,
corrupt state, or leak errors (the reference leans on Rust's type system
here — SURVEY §5 "race detection: absent"; we assert it dynamically)."""

import threading
import time

import numpy as np

from kanter_core_tpu import (
    ErrorKind,
    LiveGraph,
    MixType,
    Node,
    NodeState,
    NodeType,
    SlotId,
    TexProError,
    TextureProcessor,
)


def test_concurrent_edits_and_reads():
    tp = TextureProcessor(10_000_000)
    errors: list = []
    try:
        lg = tp.new_live_graph()
        with lg.write() as g:
            g.use_cache = True
            values = [g.add_node(Node(NodeType.Value(v / 4))) for v in range(4)]
            combine = g.add_node(Node(NodeType.CombineRgba()))
            for i, v in enumerate(values):
                g.connect(v, combine, SlotId(0), SlotId(i))
            mix = g.add_node(Node(NodeType.Mix(MixType.ADD)))
            g.connect(combine, mix, SlotId(0), SlotId(0))
            out = g.add_node(Node(NodeType.OutputRgba("out")))
            g.connect(mix, out, SlotId(0), SlotId(0))

        stop = threading.Event()

        def editor(seed):
            rng = np.random.default_rng(seed)
            try:
                while not stop.is_set():
                    action = rng.integers(3)
                    with lg.write() as g:
                        if action == 0:
                            node = g.node_mut(values[rng.integers(4)])
                            node.node_type = NodeType.Value(float(rng.random()))
                        elif action == 1:
                            src = values[rng.integers(4)]
                            g.connect(src, combine, SlotId(0), SlotId(int(rng.integers(4))))
                        else:
                            g.node(values[rng.integers(4)]).priority.set_priority(
                                int(rng.integers(-5, 6))
                            )
                    time.sleep(0.001)
            except BaseException as e:  # noqa: BLE001
                errors.append(e)

        def reader():
            try:
                while not stop.is_set():
                    try:
                        with lg.read() as g:
                            g.node_state(out)
                            pixels = g.try_buffer_rgba(out, SlotId(0))
                            assert pixels.shape == (4,)
                    except TexProError as e:
                        if e.kind not in (ErrorKind.NODE_DIRTY, ErrorKind.NO_SLOT_DATA):
                            raise
                    time.sleep(0.0005)
            except BaseException as e:  # noqa: BLE001
                errors.append(e)

        def observer():
            try:
                while not stop.is_set():
                    with lg.read() as g:
                        g.changed_consume()
                    tp.metrics()
                    time.sleep(0.002)
            except BaseException as e:  # noqa: BLE001
                errors.append(e)

        threads = [
            threading.Thread(target=editor, args=(1,), daemon=True),
            threading.Thread(target=editor, args=(2,), daemon=True),
            threading.Thread(target=reader, daemon=True),
            threading.Thread(target=observer, daemon=True),
        ]
        for t in threads:
            t.start()
        time.sleep(3.0)
        stop.set()
        for t in threads:
            t.join(timeout=10)
            assert not t.is_alive(), "stress thread failed to stop (deadlock?)"

        assert not errors, f"stress raised: {errors!r}"
        assert lg.fatal_error is None

        # the system settles: a final read completes and leaves the chain clean
        with LiveGraph.await_clean_read(lg, out) as g:
            pixels = g.buffer_rgba(out, SlotId(0))
            assert pixels.shape == (4,)
            assert g.node_state(out) == NodeState.CLEAN
    finally:
        tp.shutdown_now()


def test_profiling_device_trace(tmp_path):
    """device_trace captures an XLA profile directory; annotate nests."""
    import os

    import jax.numpy as jnp

    from kanter_core_tpu import profiling

    log_dir = str(tmp_path / "trace")
    with profiling.device_trace(log_dir):
        with profiling.annotate("test-phase"):
            (jnp.ones((32, 32)) * 2).block_until_ready()
    assert any(os.scandir(log_dir)), "no trace artifacts written"


def test_buffer_queue_dump():
    import numpy as np

    from kanter_core_tpu.node import AtomicFlag
    from kanter_core_tpu.transient_buffer import AtomicUsize, PlaneBuffer, PlaneBufferQueue

    queue = PlaneBufferQueue(AtomicUsize(1000), AtomicFlag(False))
    buf = PlaneBuffer(host=np.zeros((2, 2), dtype=np.float32))
    queue.add_buffer(buf)
    queue.tick()
    dump = str(queue)
    assert "Thres: 1000" in dump
    assert "HST" in dump and "16" in dump


def test_timeline_outcomes_visible(tex_pro):
    """The observability timeline records clean, memoized, and discarded
    outcomes with per-kind stats."""
    from conftest import render_u8

    from kanter_core_tpu import MixType, Node, NodeType, Side, SlotId

    lg = tex_pro.new_live_graph()
    with lg.write() as g:
        g.use_cache = True
        val = g.add_node(Node(NodeType.Value(0.5)))
        comb = g.add_node(Node(NodeType.CombineRgba()))
        g.connect(val, comb, SlotId(0), SlotId(0))
    render_u8(lg, comb)
    with lg.write() as g:
        g.disconnect_slot(val, Side.OUTPUT, SlotId(0))
        g.connect(val, comb, SlotId(0), SlotId(0))
    render_u8(lg, comb)

    counters = tex_pro.timeline.counters()
    assert counters.get("clean", 0) >= 2
    events = tex_pro.timeline.events()
    assert any(e.extra.get("memoized") for e in events)
    summary = tex_pro.metrics()["timeline"]["per_kind_ms"]
    assert "CombineRgba" in summary and summary["CombineRgba"]["count"] >= 1


def test_models_package():
    from kanter_core_tpu import models

    graph = models.invert_graph()
    assert len(graph.nodes) == 4


def test_bounded_growth_under_sustained_edits():
    """Caches and queues stay bounded over sustained interactive editing:
    program caches ≤ their LRU caps, recipe cache ≤ capacity, and the plane
    queue doesn't accumulate orphans."""
    from conftest import render_u8

    from kanter_core_tpu import MixType, Node, NodeType, SlotId, TextureProcessor

    tp = TextureProcessor(10_000_000)
    try:
        tp.recipe_cache.capacity = 16  # small LRU → planes must not pile up
        lg = tp.new_live_graph()
        with lg.write() as g:
            val = g.add_node(Node(NodeType.Value(0.5)))
            comb = g.add_node(Node(NodeType.CombineRgba()))
            mix = g.add_node(Node(NodeType.Mix(MixType.MULTIPLY)))
            out = g.add_node(Node(NodeType.OutputRgba("out")))
            g.connect(val, comb, SlotId(0), SlotId(0))
            g.connect(comb, mix, SlotId(0), SlotId(0))
            g.connect(comb, mix, SlotId(0), SlotId(1))
            g.connect(mix, out, SlotId(0), SlotId(0))

        for i in range(120):
            with lg.write() as g:
                g.node_mut(val).node_type = NodeType.Value(0.001 * i)
            render_u8(lg, out)

        import time

        time.sleep(0.5)  # let the orphan sweep settle
        assert len(tp.engine._fused_programs) <= tp.engine.FUSED_PROGRAM_CACHE_CAP
        stats = tp.recipe_cache.stats()
        assert stats["entries"] <= tp.recipe_cache.capacity
        # plane queue: live planes are bounded by slot_datas + the recipe
        # LRU, not by edit count — orphans from 120 edits must be swept
        assert len(tp.buffer_queue.queue) < 300, len(tp.buffer_queue.queue)
    finally:
        tp.shutdown_now()
