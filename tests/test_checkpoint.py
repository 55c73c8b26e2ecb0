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
        assert all(s == NodeState.DIRTY for s in g.node_states().values())
