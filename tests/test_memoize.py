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
