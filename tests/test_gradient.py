"""GradientMap node (extension): colorize-ramp semantics, stop-as-argument
caching, and four-consumer lockstep parity (also fuzz-covered via the
shared generator in test_fuzz_equivalence)."""

import numpy as np
import pytest

from conftest import render_u8

from kanter_core_tpu import (
    Node,
    NodeGraph,
    NodeType,
    SlotId,
    TextureProcessor,
)
from kanter_core_tpu.compiler import CompiledGraph, graph_fingerprint
from kanter_core_tpu.errors import ErrorKind, TexProError
from kanter_core_tpu.ids import NodeId

STOPS = [(0.0, 0.1, 0.2, 0.3, 1.0), (0.4, 0.9, 0.5, 0.1, 1.0), (1.0, 1.0, 1.0, 1.0, 1.0)]


def _build(stops=None):
    g = NodeGraph()
    nz = g.add_node(Node(NodeType.Noise(80, 60, 4, 3, 7, 0.6)))
    gm = g.add_node(Node(NodeType.GradientMap(stops or STOPS)))
    out = g.add_node(Node(NodeType.OutputRgba("out")))
    g.connect(nz, gm, SlotId(0), SlotId(0))
    g.connect(gm, out, SlotId(0), SlotId(0))
    return g, gm, out


def _ramp(stops, x):
    import jax

    from kanter_core_tpu.ops.gradient import gradient_bindings, gradient_planes

    b = gradient_bindings(NodeType.GradientMap(stops).payload)
    return [
        np.asarray(p)
        for p in jax.jit(gradient_planes)(np.asarray(x, np.float32), b["pos"], b["colors"])
    ]


def test_gradient_reference_values():
    """Exact segment semantics: at/below the first stop → its color; above
    the last → the last segment's t=1 lerp; stop positions hit the stop
    colors (interior stops exactly; midpoints are the f32 lerp)."""
    x = [[0.0, 0.4, 1.0, -0.5, 2.0, 0.2]]
    r, g, b, a = _ramp(STOPS, x)
    assert r[0, 0] == np.float32(0.1)  # first stop
    assert r[0, 1] == np.float32(0.9)  # interior stop exactly
    assert r[0, 3] == np.float32(0.1)  # below first clamps
    assert r[0, 4] == np.float32(1.0)  # above last clamps
    mid = np.float32(0.1) + np.float32(0.5) * np.float32(0.8)
    assert abs(float(r[0, 5]) - float(mid)) <= 2 ** -20  # f32 lerp midpoint
    assert np.all(a == 1.0)


def test_gradient_nan_and_degenerate_stops_deterministic():
    """NaN pixels select no segment (first color); duplicated stop
    positions propagate IEEE (inf/NaN from the zero-span divide resolves
    through the clip deterministically) — run twice, bits equal."""
    stops = [(0.3, 0.0, 0.0, 0.0, 1.0), (0.3, 1.0, 1.0, 1.0, 1.0), (1.0, 0.5, 0.5, 0.5, 1.0)]
    x = [[np.nan, 0.1, 0.3, 0.9]]
    a = _ramp(stops, x)
    b = _ramp(stops, x)
    for pa, pb in zip(a, b):
        assert np.array_equal(pa, pb, equal_nan=True)
    assert a[0][0, 0] == np.float32(0.0)  # NaN → first stop color
    assert a[0][0, 1] == np.float32(0.0)  # below first


def test_gradient_serde_round_trip_and_sorting():
    g, gm, _ = _build()
    clone = NodeGraph.from_json(g.to_json())
    assert clone.to_json() == g.to_json()
    # constructor sorts stops by position
    nt = NodeType.GradientMap([(1.0, 1, 1, 1, 1), (0.0, 0, 0, 0, 1)])
    assert nt.payload[0][0] == 0.0 and nt.payload[1][0] == 1.0
    with pytest.raises(TexProError):
        NodeType.GradientMap([(0.0, 0, 0, 0, 1)])  # < 2 stops


def test_gradient_stops_are_arguments_not_structure():
    """Stop VALUES normalize out of the fingerprint; the COUNT does not."""
    other = [(0.1, 0.5, 0.5, 0.5, 0.5), (0.6, 0.2, 0.8, 0.4, 1.0), (0.9, 0, 0, 0, 0)]
    assert graph_fingerprint(_build()[0]) == graph_fingerprint(_build(other)[0])
    two = [(0.0, 0, 0, 0, 1), (1.0, 1, 1, 1, 1)]
    assert graph_fingerprint(_build()[0]) != graph_fingerprint(_build(two)[0])


def test_gradient_requires_gray_input():
    from kanter_core_tpu.recipe_cache import node_recipe

    g = NodeGraph()
    img = g.add_node(Node(NodeType.CombineRgba()))
    gm = g.add_node(Node(NodeType.GradientMap(STOPS)))
    with pytest.raises(TexProError) as exc:
        g.connect(img, gm, SlotId(0), SlotId(0))
    assert exc.value.kind == ErrorKind.INVALID_SLOT_TYPE
    # recipe hashing distinguishes stop payloads
    r1 = node_recipe(Node(NodeType.GradientMap(STOPS), NodeId(1)), ["x"], None)
    other = [(0.0, 0.1, 0.2, 0.3, 1.0), (0.4, 0.9, 0.5, 0.1, 1.0), (1.0, 1, 1, 0.9, 1)]
    r2 = node_recipe(Node(NodeType.GradientMap(other), NodeId(1)), ["x"], None)
    assert r1 != r2


def test_gradient_engine_paths_bit_identical():
    results = {}
    g, gm, out = _build()
    for name, fused, tile_bytes in [
        ("fused", True, None),
        ("pernode", False, None),
        ("tiled", True, 1),
    ]:
        tp = TextureProcessor(10_000_000, tile_bytes=tile_bytes)
        try:
            lg = tp.new_live_graph()
            with lg.write() as gg:
                gg.fuse_subgraphs = fused
                gg.set_node_graph(g.clone())
            results[name] = render_u8(lg, out)
        finally:
            tp.shutdown_now()
    prog = CompiledGraph(g.clone(), targets=[(out, SlotId(0))], include_u8=True)
    expect = np.asarray(prog()[(out, SlotId(0))]).reshape(-1)
    for name, px in results.items():
        assert np.array_equal(px, expect), name


def test_gradient_stop_edit_rerenders_and_reuses_program():
    """set_gradient_map re-renders with fresh stops; a same-count edit
    shares the fused program fingerprint (argument-only change)."""
    tp = TextureProcessor(10_000_000)
    try:
        lg = tp.new_live_graph()
        g, gm, out = _build()
        with lg.write() as gg:
            gg.set_node_graph(g)
        before = render_u8(lg, out)
        with lg.write() as gg:
            gg.set_gradient_map(
                gm,
                [(0.0, 0.0, 0.0, 0.5, 1.0), (0.5, 0.2, 0.9, 0.9, 1.0), (1.0, 1, 0.4, 0, 1)],
            )
        after = render_u8(lg, out)
        assert not np.array_equal(before, after)
    finally:
        tp.shutdown_now()


def test_gradient_bucketed_and_band_parity():
    from kanter_core_tpu.bucketed import BucketedGraph
    from kanter_core_tpu.compiler import collect_value_bindings
    from kanter_core_tpu.tiled import TiledEvaluator

    g, gm, out = _build()
    prog = CompiledGraph(g.clone(), targets=[(out, SlotId(0))])
    expect = [np.asarray(p) for p in prog()[(out, SlotId(0))]]
    for band_rows in (1, 7, 64):
        ev = TiledEvaluator(
            g, [(out, SlotId(0))], collect_value_bindings(g), band_rows=band_rows
        )
        got = ev.run()[(out, SlotId(0))]
        assert all(np.array_equal(a, b) for a, b in zip(got, expect)), band_rows
    bg = BucketedGraph(g, targets=[(out, SlotId(0))], bucket=32)
    got = [np.asarray(p) for p in bg()[(out, SlotId(0))]]
    assert all(np.array_equal(a, b) for a, b in zip(got, expect))
