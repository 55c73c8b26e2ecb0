"""Memory-tier tests: LRU eviction under a byte watermark.

Ports `drive_cache` (`/root/reference/tests/integration_tests.rs:140-247`):
with a 16-byte device budget, only the most recently produced/touched planes
stay device-resident; touching spilled planes faults them back in and evicts
the previous residents.
"""

import time

import pytest

from kanter_core_tpu import (
    LiveGraph,
    MixType,
    Node,
    NodeType,
    SlotId,
    TextureProcessor,
)


def _wait_until(predicate, timeout=30.0):
    deadline = time.time() + timeout
    while time.time() < deadline:
        if predicate():
            return True
        time.sleep(0.01)
    return False


def test_drive_cache():
    VAL = [0.0, 0.3, 0.7, 1.0]
    tp = TextureProcessor(10_000_000)
    try:
        # 16-byte budget: exactly one RGBA 1×1 (4 planes × 4 B) fits.
        tp.memory_threshold.store(16)
        lg = tp.new_live_graph()

        with lg.write() as g:
            g.use_cache = True
            rgba_node = g.add_node(Node(NodeType.CombineRgba()))
            value_nodes = []
            for i, val in enumerate(VAL):
                node = g.add_node(Node(NodeType.Value(val)))
                value_nodes.append(node)
                g.connect(node, rgba_node, SlotId(0), SlotId(i))
            mix_node_1 = g.add_node(Node(NodeType.Mix(MixType.ADD)))
            mix_node_2 = g.add_node(Node(NodeType.Mix(MixType.ADD)))
            g.connect(rgba_node, mix_node_1, SlotId(0), SlotId(0))
            g.connect(mix_node_1, mix_node_2, SlotId(0), SlotId(0))

        with LiveGraph.await_clean_read(lg, mix_node_2):
            pass

        # Touch mix_node_2's planes so they are the most recent.
        with LiveGraph.await_clean_read(lg, mix_node_2) as g:
            for buf in g.slot_data(mix_node_2, SlotId(0)).image.bufs():
                buf.data()

        def spilled_except_mix2():
            with lg.read() as g:
                return (
                    all(not g.slot_in_memory(n, SlotId(0)) for n in value_nodes)
                    and not g.slot_in_memory(rgba_node, SlotId(0))
                    and not g.slot_in_memory(mix_node_1, SlotId(0))
                    and g.slot_in_memory(mix_node_2, SlotId(0))
                )

        assert _wait_until(spilled_except_mix2), "eviction did not settle as expected"

        # The CombineRgba output shares the Value nodes' planes; reading its
        # pixels must still return the values (fault-in through the tiers).
        with lg.write() as g:
            slot_data = g.slot_data(rgba_node, SlotId(0))
            pixel = [float(buf.data()[0, 0]) for buf in slot_data.image.bufs()]
        assert pixel == pytest.approx(VAL)

        # Faulting rgba_node in makes its (shared) planes resident and evicts
        # the mix nodes.
        def faulted_in():
            with lg.read() as g:
                return (
                    all(g.slot_in_memory(n, SlotId(0)) for n in value_nodes)
                    and g.slot_in_memory(rgba_node, SlotId(0))
                    and not g.slot_in_memory(mix_node_1, SlotId(0))
                    and not g.slot_in_memory(mix_node_2, SlotId(0))
                )

        def queue_dump():
            q = tp.buffer_queue
            with lg.read() as g:
                states = {
                    "values": [g.slot_in_memory(n, SlotId(0)) for n in value_nodes],
                    "rgba": g.slot_in_memory(rgba_node, SlotId(0)),
                    "mix1": g.slot_in_memory(mix_node_1, SlotId(0)),
                    "mix2": g.slot_in_memory(mix_node_2, SlotId(0)),
                }
            return (
                f"states={states} mem={q.bytes_memory()} host={q.bytes_host()} "
                f"queue={[(b.tier.value, b.bytes()) for b in q.queue]}"
            )

        assert _wait_until(faulted_in), f"fault-in did not settle: {queue_dump()}"
    finally:
        tp.shutdown_now()


def test_disk_spill_roundtrip(tmp_path):
    """HOST → STORAGE → back, with hash verification (reference unit test at
    `transient_buffer.rs:436-467`)."""
    import numpy as np

    from kanter_core_tpu.transient_buffer import PlaneBuffer, Tier

    data = np.random.rand(16, 16).astype(np.float32)
    buf = PlaneBuffer(host=data.copy())
    assert buf.spill_to_storage()
    assert buf.tier == Tier.STORAGE
    path = buf._path
    import os

    assert os.path.exists(path)
    out = buf.host_data()
    assert not os.path.exists(path)  # file deleted on reload
    assert np.array_equal(out, data)


def test_bytes_accounting():
    import numpy as np

    from kanter_core_tpu.node import AtomicFlag
    from kanter_core_tpu.transient_buffer import AtomicUsize, PlaneBuffer, PlaneBufferQueue

    shutdown = AtomicFlag(False)
    queue = PlaneBufferQueue(AtomicUsize(10_000_000), shutdown)
    buf = PlaneBuffer(host=np.zeros((8, 8), dtype=np.float32))
    buf.data()  # promote to device
    queue.add_buffer(buf)
    queue.tick()
    assert queue.bytes_memory() == 8 * 8 * 4
    queue.memory_threshold.store(0)
    queue.tick()
    assert queue.bytes_memory() == 0
    assert queue.bytes_host() == 8 * 8 * 4
    assert not buf.in_memory()


def test_try_data_nonblocking():
    import numpy as np
    import pytest

    from kanter_core_tpu import ErrorKind, TexProError
    from kanter_core_tpu.transient_buffer import PlaneBuffer

    buf = PlaneBuffer(host=np.zeros((4, 4), dtype=np.float32))
    with pytest.raises(TexProError):
        buf.try_data()  # host tier → not resident
    buf.data()  # fault in
    assert buf.try_data() is not None


def test_host_threshold_spills_to_disk():
    """With a host-tier watermark, planes cascade device → host → disk."""
    import time

    import numpy as np

    from kanter_core_tpu import LiveGraph, Node, NodeType, SlotId, TextureProcessor
    from kanter_core_tpu.transient_buffer import Tier

    from kanter_core_tpu import MixType, ResizePolicy, Size

    # device tier holds one 8×8 RGBA (1 KiB), host tier one more; the rest
    # must cascade to disk files
    tp = TextureProcessor(memory_threshold=1024, host_memory_threshold=1024)
    try:
        lg = tp.new_live_graph()
        with lg.write() as g:
            g.use_cache = True
            g.memoize = False
            val = g.add_node(Node(NodeType.Value(0.5)))
            comb = Node(NodeType.CombineRgba())
            comb.resize_policy = ResizePolicy.SpecificSize(Size(8, 8))
            comb = g.add_node(comb)
            g.connect(val, comb, SlotId(0), SlotId(0))
            prev = comb
            mixes = []
            for i in range(4):
                mix = g.add_node(Node(NodeType.Mix(MixType.MULTIPLY)))
                g.connect(prev, mix, SlotId(0), SlotId(0))
                g.connect(prev, mix, SlotId(0), SlotId(1))
                mixes.append(mix)
                prev = mix
        with LiveGraph.await_clean_read(lg, prev):
            pass

        deadline = time.time() + 10
        while time.time() < deadline:
            if tp.buffer_queue.bytes_storage() > 0:
                break
            time.sleep(0.02)
        assert tp.buffer_queue.bytes_storage() > 0, "nothing spilled to disk"

        # spilled data survives the round trip: 0.5^16 at the chain end,
        # and the combine's 0.5 planes fault back from disk
        with lg.read() as g:
            pixels = g.buffer_rgba(comb, SlotId(0))
        assert pixels.tolist()[:4] == [127, 0, 0, 255]
    finally:
        tp.shutdown_now()


def test_eviction_churn_with_edits():
    """Tiny device budget + repeated edits: memoized and recomputed commits
    interleave with eviction; pixels stay correct throughout."""
    from kanter_core_tpu import LiveGraph, MixType, Node, NodeType, SlotId, TextureProcessor

    tp = TextureProcessor(memory_threshold=32)  # two 1×1 RGBA images
    try:
        lg = tp.new_live_graph()
        with lg.write() as g:
            g.use_cache = True
            val = g.add_node(Node(NodeType.Value(0.5)))
            comb = g.add_node(Node(NodeType.CombineRgba()))
            mix = g.add_node(Node(NodeType.Mix(MixType.MULTIPLY)))
            out = g.add_node(Node(NodeType.OutputRgba("out")))
            g.connect(val, comb, SlotId(0), SlotId(0))
            g.connect(comb, mix, SlotId(0), SlotId(0))
            g.connect(comb, mix, SlotId(0), SlotId(1))
            g.connect(mix, out, SlotId(0), SlotId(0))

        for i in range(20):
            value = 0.1 + (i % 5) * 0.2  # cycles → memoize hits after round 1
            with lg.write() as g:
                g.node_mut(val).node_type = NodeType.Value(value)
            expected = int(value * value * 255)  # truncating cast
            with LiveGraph.await_clean_read(lg, out) as g:
                pixels = g.buffer_rgba(out, SlotId(0))
            assert pixels.tolist()[:1] == [expected], (i, value)
    finally:
        tp.shutdown_now()
