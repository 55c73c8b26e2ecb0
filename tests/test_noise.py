"""Noise node (extension): FBM value-noise source semantics, toroidal
tiling, parameter-as-argument caching, and four-consumer lockstep parity
(also fuzz-covered via the shared generator in test_fuzz_equivalence)."""

import numpy as np
import pytest

from conftest import render_u8

from kanter_core_tpu import (
    MixType,
    Node,
    NodeGraph,
    NodeType,
    SlotId,
    TextureProcessor,
)
from kanter_core_tpu.compiler import CompiledGraph, graph_fingerprint
from kanter_core_tpu.errors import TexProError
from kanter_core_tpu.ids import NodeId


def _build(payload=(96, 64, 4, 3, 7, 0.6)):
    g = NodeGraph()
    nz = g.add_node(Node(NodeType.Noise(*payload)))
    out = g.add_node(Node(NodeType.OutputGray("out")))
    g.connect(nz, out, SlotId(0), SlotId(0))
    return g, nz, out


def _plane(payload):
    import jax

    from kanter_core_tpu.ops.noise import noise_bindings, noise_plane

    b = noise_bindings(payload)
    return np.asarray(
        jax.jit(noise_plane)(
            b["rows"], b["cols"], b["seed"], b["persistence"],
            b["fx"], b["fy"], b["periods"],
        )
    )


def test_noise_range_and_determinism():
    a = _plane((80, 60, 4, 3, 123, 0.5))
    b = _plane((80, 60, 4, 3, 123, 0.5))
    assert np.array_equal(a, b)
    assert a.shape == (60, 80)
    assert 0.0 <= a.min() and a.max() < 1.0
    # a different seed decorrelates (identical planes would mean the seed
    # is ignored)
    c = _plane((80, 60, 4, 3, 124, 0.5))
    assert not np.array_equal(a, c)


def test_noise_tiles_seamlessly():
    """The lattice wraps toroidally: the jump across the plane border is no
    larger than the typical interior gradient step (continuity), both axes."""
    a = _plane((128, 128, 4, 3, 5, 0.5))
    interior_dx = np.abs(np.diff(a, axis=1)).max()
    interior_dy = np.abs(np.diff(a, axis=0)).max()
    wrap_dx = np.abs(a[:, 0] - a[:, -1]).max()
    wrap_dy = np.abs(a[0, :] - a[-1, :]).max()
    assert wrap_dx <= interior_dx * 1.5
    assert wrap_dy <= interior_dy * 1.5


def test_noise_serde_round_trip():
    g, nz, _ = _build()
    clone = NodeGraph.from_json(g.to_json())
    assert clone.to_json() == g.to_json()
    assert clone.node(nz).node_type.payload == g.node(nz).node_type.payload


def test_noise_params_are_arguments_not_structure():
    """seed/persistence/cells ride in program arguments (one cached
    executable serves seed cycling); width/height/octaves shape the trace."""
    assert graph_fingerprint(_build((96, 64, 4, 3, 7, 0.6))[0]) == graph_fingerprint(
        _build((96, 64, 9, 3, 99, 0.2))[0]
    )
    assert graph_fingerprint(_build((96, 64, 4, 3, 7, 0.6))[0]) != graph_fingerprint(
        _build((96, 32, 4, 3, 7, 0.6))[0]
    )
    assert graph_fingerprint(_build((96, 64, 4, 3, 7, 0.6))[0]) != graph_fingerprint(
        _build((96, 64, 4, 2, 7, 0.6))[0]
    )


def test_noise_validates_payload():
    with pytest.raises(TexProError):
        NodeType.Noise(0, 64)
    with pytest.raises(TexProError):
        NodeType.Noise(64, 64, cells=0)
    with pytest.raises(TexProError):
        NodeType.Noise(64, 64, octaves=0)
    # octaves shape the trace — an absurd payload must be rejected, not
    # hang the compile (r4 payload-hazard class)
    with pytest.raises(TexProError):
        NodeType.Noise(64, 64, octaves=10**9)
    NodeType.Noise(64, 64, octaves=24)  # the cap itself is fine


def test_noise_recipe_distinguishes_payloads():
    """Content-hash memoization must not collide noise nodes that differ
    only in parameters (recipe_cache.node_recipe)."""
    from kanter_core_tpu.recipe_cache import node_recipe

    def recipe(payload):
        return node_recipe(Node(NodeType.Noise(*payload), NodeId(1)), [], None)

    base = recipe((96, 64, 4, 3, 7, 0.6))
    assert base == recipe((96, 64, 4, 3, 7, 0.6))
    assert base != recipe((96, 64, 4, 3, 8, 0.6))
    assert base != recipe((96, 64, 5, 3, 7, 0.6))
    assert base != recipe((96, 64, 4, 3, 7, 0.5))


def test_noise_engine_paths_bit_identical():
    """Fused, per-node, and tiled engine dispatches all agree with the
    standalone compiler on a noise→mix chain (resize pass included: the
    Value leg is 1×1 and upscales to the noise size)."""
    g = NodeGraph()
    nz = g.add_node(Node(NodeType.Noise(70, 50, 3, 2, 42, 0.5)))
    val = g.add_node(Node(NodeType.Value(0.25)))
    mix = g.add_node(Node(NodeType.Mix(MixType.ADD)))
    out = g.add_node(Node(NodeType.OutputGray("out")))
    g.connect(nz, mix, SlotId(0), SlotId(0))
    g.connect(val, mix, SlotId(0), SlotId(1))
    g.connect(mix, out, SlotId(0), SlotId(0))

    results = {}
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


def test_noise_tiled_bands_bit_identical():
    """Band evaluation is a bit-exact crop: every band size agrees."""
    from kanter_core_tpu.compiler import collect_value_bindings
    from kanter_core_tpu.tiled import TiledEvaluator

    g, nz, out = _build((96, 64, 4, 3, 7, 0.6))
    whole = _plane((96, 64, 4, 3, 7, 0.6))
    for band_rows in (1, 13, 64, 200):
        ev = TiledEvaluator(
            g, [(out, SlotId(0))], collect_value_bindings(g), band_rows=band_rows
        )
        got = ev.run()[(out, SlotId(0))][0]
        assert np.array_equal(got, whole), f"band_rows={band_rows}"


def test_noise_bucketed_size_drag_single_trace():
    """A noise size drag within one bucket reuses the executable (the
    padded index vectors carry the size), and every size is bit-exact."""
    from kanter_core_tpu.bucketed import BucketedGraph

    g, nz, out = _build((130, 140, 4, 3, 7, 0.6))
    bg = BucketedGraph(g, targets=[(out, SlotId(0))], bucket=256)
    first = np.asarray(bg()[(out, SlotId(0))][0])
    assert np.array_equal(first, _plane((130, 140, 4, 3, 7, 0.6)))
    t0 = bg.traces
    for w, h in [(150, 160), (200, 180), (256, 256)]:
        g.set_noise(nz, w, h, 4, 3, 7, 0.6)
        got = np.asarray(bg()[(out, SlotId(0))][0])
        assert got.shape == (h, w)
        assert np.array_equal(got, _plane((w, h, 4, 3, 7, 0.6))), (w, h)
    assert bg.traces == t0, "same-bucket noise size drag must not retrace"


def test_noise_seed_edit_reuses_fused_program_and_rerenders():
    """Editing seed/persistence through the LiveGraph mutator re-renders
    with fresh values through the engine's cached-program path."""
    tp = TextureProcessor(10_000_000)
    try:
        lg = tp.new_live_graph()
        g, nz, out = _build((64, 48, 4, 2, 1, 0.5))
        with lg.write() as gg:
            gg.set_node_graph(g)
        before = render_u8(lg, out)
        with lg.write() as gg:
            gg.set_noise(nz, 64, 48, 4, 2, 2, 0.5)
        after = render_u8(lg, out)
        assert not np.array_equal(before, after)
        assert np.array_equal(after.reshape(48, 64, 4)[..., 0].ravel() * 0 + 255,
                              after.reshape(48, 64, 4)[..., 3].ravel())
    finally:
        tp.shutdown_now()


def test_noise_inside_nested_graph_node():
    """A Noise source inside a nested Graph node flattens/inlines through
    every path; seed edits on the inner node take effect (the flattener
    re-binds current payloads)."""
    inner = NodeGraph()
    nz = inner.add_node(Node(NodeType.Noise(40, 30, 3, 2, 11, 0.5)))
    iout = inner.add_node(Node(NodeType.OutputGray("o")))
    inner.connect(nz, iout, SlotId(0), SlotId(0))

    outer = NodeGraph()
    gnode = outer.add_node(Node(NodeType.Graph(inner)))
    out = outer.add_node(Node(NodeType.OutputGray("out")))
    outer.connect(gnode, out, SlotId(int(iout)), SlotId(0))

    expect = _plane((40, 30, 3, 2, 11, 0.5))
    prog = CompiledGraph(outer.clone(), targets=[(out, SlotId(0))])
    assert np.array_equal(np.asarray(prog()[(out, SlotId(0))][0]), expect)

    for fused, tile_bytes in [(True, None), (False, None), (True, 1)]:
        tp = TextureProcessor(10_000_000, tile_bytes=tile_bytes)
        try:
            lg = tp.new_live_graph()
            with lg.write() as gg:
                gg.fuse_subgraphs = fused
                gg.set_node_graph(outer.clone())
            px = render_u8(lg, out).reshape(30, 40, 4)[..., 0]
            u8 = np.clip(expect, 0.0, 1.0) * 255.0
            u8 = np.nan_to_num(u8, nan=255.0).astype(np.uint8)
            assert np.array_equal(px, u8), (fused, tile_bytes)
        finally:
            tp.shutdown_now()
