"""Recipe-cache memoization tests: identical recipes are served without
device work; differing recipes are not."""

import numpy as np

from conftest import IMAGE_1, render_u8

from kanter_core_tpu import (
    LiveGraph,
    MixType,
    Node,
    NodeType,
    Side,
    SlotId,
)


def _counters(tp):
    return tp.timeline.counters()


def test_reconnect_is_memoized(tex_pro):
    """disconnect + reconnect (the read_dirty_read pattern) re-commits from
    the recipe cache: no new clean evaluations, identical pixels."""
    lg = tex_pro.new_live_graph()
    with lg.write() as g:
        g.use_cache = True
        val = g.add_node(Node(NodeType.Value(0.5)))
        comb = g.add_node(Node(NodeType.CombineRgba()))
        g.connect(val, comb, SlotId(0), SlotId(0))
    first = render_u8(lg, comb)

    hits_before = tex_pro.recipe_cache.stats()["hits"]
    with lg.write() as g:
        g.disconnect_slot(val, Side.OUTPUT, SlotId(0))
        g.connect(val, comb, SlotId(0), SlotId(0))
    second = render_u8(lg, comb)

    assert np.array_equal(first, second)
    assert tex_pro.recipe_cache.stats()["hits"] > hits_before


def test_value_toggle_memoized(tex_pro):
    """A/B toggling a Value: the second visit to each value is a cache hit."""
    lg = tex_pro.new_live_graph()
    with lg.write() as g:
        val = g.add_node(Node(NodeType.Value(0.25)))
        comb = g.add_node(Node(NodeType.CombineRgba()))
        out = g.add_node(Node(NodeType.OutputRgba("out")))
        g.connect(val, comb, SlotId(0), SlotId(0))
        g.connect(comb, out, SlotId(0), SlotId(0))

    results = {}
    for value in (0.25, 0.75, 0.25, 0.75, 0.25):
        with lg.write() as g:
            g.node_mut(val).node_type = NodeType.Value(value)
        results.setdefault(value, []).append(render_u8(lg, out))

    for value, renders in results.items():
        for render in renders[1:]:
            assert np.array_equal(render, renders[0]), value
    stats = tex_pro.recipe_cache.stats()
    assert stats["hits"] >= 3  # visits 3..5 fully memoized


def test_different_values_not_conflated(tex_pro):
    lg = tex_pro.new_live_graph()
    with lg.write() as g:
        val = g.add_node(Node(NodeType.Value(0.1)))
        comb = g.add_node(Node(NodeType.CombineRgba()))
        g.connect(val, comb, SlotId(0), SlotId(0))
    a = render_u8(lg, comb)
    with lg.write() as g:
        g.node_mut(val).node_type = NodeType.Value(0.9)
    b = render_u8(lg, comb)
    assert not np.array_equal(a, b)


def test_memoize_disabled(tex_pro):
    lg = tex_pro.new_live_graph()
    with lg.write() as g:
        g.memoize = False
        val = g.add_node(Node(NodeType.Value(0.5)))
        comb = g.add_node(Node(NodeType.CombineRgba()))
        g.connect(val, comb, SlotId(0), SlotId(0))
    render_u8(lg, comb)
    with lg.write() as g:
        g.disconnect_slot(val, Side.OUTPUT, SlotId(0))
        g.connect(val, comb, SlotId(0), SlotId(0))
    render_u8(lg, comb)
    assert tex_pro.recipe_cache.stats()["hits"] == 0


def test_image_recipe_tracks_file(tmp_path, tex_pro):
    """Rewriting an image file changes the recipe — no stale cache hits."""
    from PIL import Image as PILImage

    path = str(tmp_path / "img.png")
    PILImage.new("RGBA", (4, 4), (10, 20, 30, 255)).save(path)
    lg = tex_pro.new_live_graph()
    with lg.write() as g:
        img = g.add_node(Node(NodeType.Image(path)))
        out = g.add_node(Node(NodeType.OutputRgba("out")))
        g.connect(img, out, SlotId(0), SlotId(0))
    first = render_u8(lg, out)

    import os
    import time

    time.sleep(0.01)  # ensure mtime_ns advances
    PILImage.new("RGBA", (4, 4), (99, 88, 77, 255)).save(path)
    with lg.write() as g:
        g.set_image_node_path(img, path)
    second = render_u8(lg, out)
    assert tuple(second.reshape(4, 4, 4)[0, 0]) == (99, 88, 77, 255)
    assert not np.array_equal(first, second)


def test_nested_image_edit_changes_graph_recipe(tmp_path, tex_pro):
    """Rewriting an Image file INSIDE a subgraph must invalidate the Graph
    node's recipe (nested content is stamped, not just the JSON)."""
    from PIL import Image as PILImage

    from kanter_core_tpu import NodeGraph

    path = str(tmp_path / "nested.png")
    PILImage.new("RGBA", (4, 4), (10, 20, 30, 255)).save(path)

    inner = NodeGraph()
    img = inner.add_node(Node(NodeType.Image(path)))
    iout = inner.add_node(Node(NodeType.OutputRgba("out")))
    inner.connect(img, iout, SlotId(0), SlotId(0))

    lg = tex_pro.new_live_graph()
    with lg.write() as g:
        gn = g.add_node(Node(NodeType.Graph(inner)))
        out = g.add_node(Node(NodeType.OutputRgba("out")))
        g.connect(gn, out, inner.output_slot_id_with_name("out"), SlotId(0))
    first = render_u8(lg, out)
    assert tuple(first.reshape(4, 4, 4)[0, 0]) == (10, 20, 30, 255)

    import time

    time.sleep(0.01)
    PILImage.new("RGBA", (4, 4), (99, 88, 77, 255)).save(path)
    with lg.write() as g:
        g.set_state(gn, __import__("kanter_core_tpu").NodeState.DIRTY)
    second = render_u8(lg, out)
    assert tuple(second.reshape(4, 4, 4)[0, 0]) == (99, 88, 77, 255)


def test_memoized_hit_survives_edit_cancel_flag(tex_pro):
    """An edit's cancel flag must not discard a subsequent legitimate cache
    hit and strand a fire-and-forget request()."""
    import time

    from kanter_core_tpu import NodeState

    lg = tex_pro.new_live_graph()
    with lg.write() as g:
        g.use_cache = True
        val = g.add_node(Node(NodeType.Value(0.5)))
        comb = g.add_node(Node(NodeType.CombineRgba()))
        g.connect(val, comb, SlotId(0), SlotId(0))
    render_u8(lg, comb)  # fills the cache

    with lg.write() as g:
        out = g.add_node(Node(NodeType.OutputRgba("out")))
        g.connect(comb, out, SlotId(0), SlotId(0))
        # reconnect sets comb.cancel = True
        g.connect(val, comb, SlotId(0), SlotId(0))
        g.request(out)  # fire and forget — no await to re-prioritise

    deadline = time.time() + 15
    while time.time() < deadline:
        with lg.read() as g:
            if g.node_state(out) == NodeState.CLEAN:
                break
        time.sleep(0.01)
    with lg.read() as g:
        assert g.node_state(out) == NodeState.CLEAN, "request was stranded"
        assert g.buffer_rgba(out, SlotId(0)).tolist() == [127, 0, 0, 255]


def test_no_stale_recipe_after_memoize_toggle(tex_pro):
    """Commits made while memoize=False must clear the node's old recipe so
    re-enabling memoization can't serve pre-toggle pixels."""
    lg = tex_pro.new_live_graph()
    with lg.write() as g:
        g.use_cache = True
        val = g.add_node(Node(NodeType.Value(0.5)))
        comb = g.add_node(Node(NodeType.CombineRgba()))
        g.connect(val, comb, SlotId(0), SlotId(0))
    assert render_u8(lg, comb).tolist() == [127, 0, 0, 255]

    with lg.write() as g:
        g.memoize = False
        g.node_mut(val).node_type = NodeType.Value(0.9)
    assert render_u8(lg, comb).tolist() == [229, 0, 0, 255]

    with lg.write() as g:
        g.memoize = True
        # dirty only comb: its recipe derives from val's stored recipe
        g.disconnect_slot(val, Side.OUTPUT, SlotId(0))
        g.connect(val, comb, SlotId(0), SlotId(0))
    assert render_u8(lg, comb).tolist() == [229, 0, 0, 255]


def test_param_edits_change_every_extension_recipe():
    """EVERY parameterized node kind's payload must enter its recipe hash —
    the seed-11 soak caught AmbientOcclusion/Distance falling through a
    payload-dropping default (stale memoized output after a drag). Pin the
    whole family, and pin that an unhashed future kind refuses to cache."""
    from kanter_core_tpu.node import Node, NodeType
    from kanter_core_tpu.recipe_cache import node_recipe

    pairs = [
        (NodeType.AmbientOcclusion(1.0, 2.0), NodeType.AmbientOcclusion(3.0, 2.0)),
        (NodeType.AmbientOcclusion(1.0, 2.0), NodeType.AmbientOcclusion(1.0, 4.0)),
        (NodeType.Distance(8.0), NodeType.Distance(9.0)),
        (NodeType.Curvature(1.0), NodeType.Curvature(2.0)),
        (NodeType.Blur(1.0), NodeType.Blur(2.0)),
        (NodeType.Hsv(10.0, 1.0, 1.0), NodeType.Hsv(20.0, 1.0, 1.0)),
        (NodeType.Levels(0.0, 1.0, 1.0, 0.0, 1.0),
         NodeType.Levels(0.0, 1.0, 2.0, 0.0, 1.0)),
        (NodeType.Warp(10.0, 4.0), NodeType.Warp(20.0, 4.0)),
        (NodeType.Transform(1.0, 0.0, 0.0, 1.0, 1.0),
         NodeType.Transform(2.0, 0.0, 0.0, 1.0, 1.0)),
        (NodeType.GradientMap([(0.0, 0, 0, 0, 1), (1.0, 1, 1, 1, 1)]),
         NodeType.GradientMap([(0.0, 0, 0, 0.5, 1), (1.0, 1, 1, 1, 1)])),
        (NodeType.Noise(16, 16, 4, 2, 0), NodeType.Noise(16, 16, 4, 2, 1)),
        (NodeType.Pattern(16, 16, "Brick", 2, 2, 0.1, 0.0, 0),
         NodeType.Pattern(16, 16, "Brick", 3, 2, 0.1, 0.0, 0)),
        (NodeType.Voronoi(16, 16, 2, 2, 0.5, 0),
         NodeType.Voronoi(16, 16, 2, 2, 0.75, 0)),
        (NodeType.Voronoi(16, 16, 2, 2, 0.5, 0),
         NodeType.Voronoi(16, 16, 2, 2, 0.5, 1)),
        (NodeType.Ramp(16, 16, "Linear", 10.0, 0.5, 0.5, 1.0),
         NodeType.Ramp(16, 16, "Linear", 20.0, 0.5, 0.5, 1.0)),
        (NodeType.Ramp(16, 16, "Linear", 10.0, 0.5, 0.5, 1.0),
         NodeType.Ramp(16, 16, "Radial", 10.0, 0.5, 0.5, 1.0)),
    ]
    inputs = ["deadbeef"]
    for a, b in pairs:
        ra = node_recipe(Node(a), inputs, live_graph=None)
        rb = node_recipe(Node(b), inputs, live_graph=None)
        assert ra is not None and rb is not None, a.kind
        assert ra != rb, f"{a.kind} payload does not reach its recipe"
