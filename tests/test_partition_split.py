"""Partition splitting around unfusable nodes (VERDICT r1 #7).

A Write sink (or an in-flight node) must not defeat fusion for the rest of
the request: the engine carves it and its dirty descendants out, fuses the
maximal remainder into ONE program, and schedules the carved-out nodes
per-node once their parents are Clean.
"""

import time

import numpy as np
import pytest

from conftest import IMAGE_1, render_u8

from kanter_core_tpu import (
    MixType,
    Node,
    NodeState,
    NodeType,
    SlotId,
    TextureProcessor,
)


def _chain_with_write(g, out_path, depth=20):
    img = g.add_node(Node(NodeType.Image(IMAGE_1)))
    val = g.add_node(Node(NodeType.Value(1.0)))
    prev = img
    for i in range(depth):
        mix = g.add_node(
            Node(NodeType.Mix(MixType.SUBTRACT if i % 2 else MixType.ADD))
        )
        g.connect(prev, mix, SlotId(0), SlotId(0))
        g.connect(val, mix, SlotId(0), SlotId(1))
        prev = mix
    out = g.add_node(Node(NodeType.OutputRgba("out")))
    g.connect(prev, out, SlotId(0), SlotId(0))
    write = g.add_node(Node(NodeType.Write(out_path)))
    g.connect(prev, write, SlotId(0), SlotId(0))
    return out, write


def test_write_sink_does_not_defeat_fusion(tmp_path, tex_pro):
    from PIL import Image as PILImage

    out_path = str(tmp_path / "written.png")
    lg = tex_pro.new_live_graph()
    with lg.write() as g:
        out, write = _chain_with_write(g, out_path, depth=20)
        g.request(write)

    pixels = render_u8(lg, out)

    # the 22 fusable nodes ran as ONE fused program, not per-node
    fused_events = [
        e for e in tex_pro.timeline.events() if e.extra.get("fused", 0) >= 20
    ]
    assert fused_events, [
        (e.kind, e.extra) for e in tex_pro.timeline.events()
    ]

    # the Write sink still executes (per-node, once parents are Clean)
    deadline = time.time() + 30
    while time.time() < deadline:
        try:
            written = np.asarray(PILImage.open(out_path).convert("RGBA"))
            break
        except Exception:
            time.sleep(0.05)
    else:
        raise AssertionError("Write node never produced a file")
    deadline = time.time() + 30
    while lg.node_state(write) != NodeState.CLEAN and time.time() < deadline:
        time.sleep(0.01)
    assert lg.node_state(write) == NodeState.CLEAN

    # the fused result is identical to the same graph without the Write sink
    with TextureProcessor(10_000_000) as plain:
        lg2 = plain.new_live_graph()
        with lg2.write() as g:
            img = g.add_node(Node(NodeType.Image(IMAGE_1)))
            val = g.add_node(Node(NodeType.Value(1.0)))
            prev = img
            for i in range(20):
                mix = g.add_node(
                    Node(NodeType.Mix(MixType.SUBTRACT if i % 2 else MixType.ADD))
                )
                g.connect(prev, mix, SlotId(0), SlotId(0))
                g.connect(val, mix, SlotId(0), SlotId(1))
                prev = mix
            out2 = g.add_node(Node(NodeType.OutputRgba("out")))
            g.connect(prev, out2, SlotId(0), SlotId(0))
        assert np.array_equal(pixels, render_u8(lg2, out2))


def test_requested_write_alone_still_runs(tmp_path, tex_pro):
    """Requesting ONLY the Write node fuses its ancestors, then runs the
    Write per-node — no hang, no per-node fallback for the chain."""
    from PIL import Image as PILImage

    out_path = str(tmp_path / "only_write.png")
    lg = tex_pro.new_live_graph()
    with lg.write() as g:
        out, write = _chain_with_write(g, out_path, depth=12)
        g.request(write)

    deadline = time.time() + 30
    while time.time() < deadline:
        try:
            written = np.asarray(PILImage.open(out_path).convert("RGBA"))
            break
        except Exception:
            time.sleep(0.05)
    else:
        raise AssertionError("Write node never produced a file")
    # content check: the written pixels equal the chain's Output render
    # (a Write that saved the wrong slot would still produce a file)
    expected = render_u8(lg, out).reshape(written.shape)
    assert np.array_equal(written, expected)
    fused_events = [
        e for e in tex_pro.timeline.events() if e.extra.get("fused", 0) >= 12
    ]
    assert fused_events
