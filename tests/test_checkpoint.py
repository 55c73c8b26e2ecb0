"""Checkpoint/resume tests: topology-only (reference parity) and full-state
(pixels + clean states, zero recompute on resume)."""

import numpy as np

from conftest import IMAGE_1, render_u8

from kanter_core_tpu import (
    LiveGraph,
    MixType,
    Node,
    NodeState,
    NodeType,
    SlotId,
    TextureProcessor,
)
from kanter_core_tpu.checkpoint import load_checkpoint, save_checkpoint
from kanter_core_tpu.graphs import invert_graph


def test_checkpoint_of_tiled_state(tmp_path):
    """State produced by the row-banded engine path (host-tier planes)
    checkpoints and resumes into a plain processor, pixels identical and
    clean (zero recompute)."""
    tp = TextureProcessor(10_000_000, tile_bytes=1)
    tp2 = TextureProcessor(10_000_000)
    try:
        lg = tp.new_live_graph()
        with lg.write() as g:
            g.use_cache = True
            img = g.add_node(Node(NodeType.Image(IMAGE_1)))
            sep = g.add_node(Node(NodeType.SeparateRgba()))
            h2n = g.add_node(Node(NodeType.HeightToNormal()))
            out = g.add_node(Node(NodeType.OutputRgba("out")))
            g.connect(img, sep, SlotId(0), SlotId(0))
            g.connect(sep, h2n, SlotId(0), SlotId(0))
            g.connect(h2n, out, SlotId(0), SlotId(0))
        pixels = render_u8(lg, out)

        path = str(tmp_path / "tiled_ckpt.npz")
        save_checkpoint(lg, path)
        restored = load_checkpoint(tp2, path)
        with restored.read() as g:
            assert g.node_state(out) == NodeState.CLEAN
            resumed = np.asarray(g.buffer_rgba(out, SlotId(0)))
        assert np.array_equal(resumed, pixels)
    finally:
        tp.shutdown_now()
        tp2.shutdown_now()


def test_full_checkpoint_roundtrip(tmp_path, tex_pro):
    lg = tex_pro.new_live_graph()
    with lg.write() as g:
        g.use_cache = True
        img = g.add_node(Node(NodeType.Image(IMAGE_1)))
        sep = g.add_node(Node(NodeType.SeparateRgba()))
        mix = g.add_node(Node(NodeType.Mix(MixType.MULTIPLY)))
        out = g.add_node(Node(NodeType.OutputGray("out")))
        g.connect(img, sep, SlotId(0), SlotId(0))
        g.connect(sep, mix, SlotId(0), SlotId(0))
        g.connect(sep, mix, SlotId(1), SlotId(1))
        g.connect(mix, out, SlotId(0), SlotId(0))
    pixels = render_u8(lg, out)

    path = str(tmp_path / "ckpt.npz")
    save_checkpoint(lg, path)

    restored = load_checkpoint(tex_pro, path)
    with restored.read() as g:
        # resumes clean: no recompute needed to read pixels
        assert g.node_state(out) == NodeState.CLEAN
        restored_pixels = g.buffer_rgba(out, SlotId(0))
    assert np.array_equal(pixels, restored_pixels)

    # plane sharing survives the round trip (separate aliases its input's
    # planes; the mix inputs alias the separate outputs)
    with restored.read() as g:
        sep_plane = g.slot_data(sep, SlotId(0)).image.planes[0]
        img_plane = g.slot_data(img, SlotId(0)).image.planes[0]
    assert sep_plane is img_plane

    # edits after resume dirty and re-evaluate normally
    with restored.write() as g:
        node = g.node_mut(mix)
        node.node_type = NodeType.Mix(MixType.ADD)
    changed = render_u8(restored, out)
    assert not np.array_equal(changed, pixels)


def test_topology_checkpoint_resumes_dirty(tmp_path, tex_pro):
    """Reference-parity path: JSON persists topology only; resume recomputes
    (`node_graph.rs:33-46`, all nodes default Dirty)."""
    graph = invert_graph()
    path = str(tmp_path / "graph.json")
    graph.export_json(path)

    from kanter_core_tpu import NodeGraph

    reloaded = NodeGraph.from_path(path)
    lg = tex_pro.new_live_graph()
    with lg.write() as g:
        g.set_node_graph(reloaded)
        states = g.node_states()
        assert len(states) == len(graph.nodes), "round-trip lost nodes"
        assert all(s == NodeState.DIRTY for s in states.values())


def test_checkpoint_preserves_inputs_and_embeds(tmp_path, tex_pro):
    """Input/Embed registrations and engine flags survive a checkpoint, so
    restored graphs can reprocess those nodes after edits."""
    import numpy as np

    from kanter_core_tpu import EmbeddedSlotDataId, SlotData, SlotImage, SlotId, NodeId

    lg = tex_pro.new_live_graph()
    with lg.write() as g:
        g.use_cache = True
        g.memoize = False
        gin = g.add_node(Node(NodeType.InputGray("in")))
        emb = g.add_node(Node(NodeType.Embed(EmbeddedSlotDataId(7))))
        mix = g.add_node(Node(NodeType.Mix(MixType.ADD)))
        out = g.add_node(Node(NodeType.OutputRgba("out")))
        g.connect(gin, mix, SlotId(0), SlotId(0))
        g.connect(emb, mix, SlotId(0), SlotId(1))
        g.connect(mix, out, SlotId(0), SlotId(0))

        plane = np.full((4, 4), 0.25, np.float32)
        g.add_input_slot_data(SlotData(gin, SlotId(0), SlotImage.Gray(plane)))
        rgba = SlotImage.Rgba([np.full((4, 4), v, np.float32) for v in (0.5, 0.25, 0.125, 1.0)])
        g.embed_slot_data_with_id(SlotData(NodeId(0), SlotId(0), rgba), EmbeddedSlotDataId(7))

    first = render_u8(lg, out)

    path = str(tmp_path / "io.npz")
    save_checkpoint(lg, path)
    restored = load_checkpoint(tex_pro, path)
    with restored.read() as g:
        assert g.node_state(out) == NodeState.CLEAN
        assert not g.memoize and g.use_cache

    # dirty everything: Input/Embed nodes must reprocess from the restored
    # registrations (previously this fatally shut the processor down)
    with restored.write() as g:
        for nid in g.node_ids():
            g.set_state(nid, NodeState.DIRTY)
        g.force_state(gin, NodeState.DIRTY)
    second = render_u8(restored, out)
    assert np.array_equal(first, second)


def test_checkpoint_blur_extension_node(tmp_path, tex_pro):
    """Extension nodes (Blur) must survive full-state checkpointing: the
    resumed graph stays Clean and re-renders identical pixels."""
    lg = tex_pro.new_live_graph()
    with lg.write() as g:
        img = g.add_node(Node(NodeType.Image(IMAGE_1)))
        blur = g.add_node(Node(NodeType.Blur(1.7)))
        out = g.add_node(Node(NodeType.OutputRgba("out")))
        g.connect(img, blur, SlotId(0), SlotId(0))
        g.connect(blur, out, SlotId(0), SlotId(0))
    before = TextureProcessor.buffer_rgba(lg, out, SlotId(0))

    path = str(tmp_path / "blur.ckpt")
    save_checkpoint(lg, path)
    lg2 = load_checkpoint(tex_pro, path)
    with lg2.read() as g2:
        assert g2.node(blur).node_type.payload == 1.7
        assert g2.node_state(out) == NodeState.CLEAN
    after = TextureProcessor.buffer_rgba(lg2, out, SlotId(0))
    assert np.array_equal(np.asarray(before), np.asarray(after))
