"""Levels node (extension): remap semantics, parameter-as-argument caching,
and four-consumer lockstep parity (also fuzz-covered via the generator)."""

import numpy as np

from conftest import HEART_128, render_u8

from kanter_core_tpu import (
    Node,
    NodeGraph,
    NodeState,
    NodeType,
    SlotId,
    TextureProcessor,
)
from kanter_core_tpu.compiler import CompiledGraph, graph_fingerprint


def _build(params=(0.1, 0.85, 2.2, 0.05, 0.95)):
    g = NodeGraph()
    img = g.add_node(Node(NodeType.Image(str(HEART_128))))
    lv = g.add_node(Node(NodeType.Levels(*params)))
    g.connect(img, lv, SlotId(0), SlotId(0))
    out = g.add_node(Node(NodeType.OutputRgba("out")))
    g.connect(lv, out, SlotId(0), SlotId(0))
    return g, lv, out


def test_levels_serde_round_trip():
    g, lv, _ = _build()
    clone = NodeGraph.from_json(g.to_json())
    assert clone.to_json() == g.to_json()
    assert clone.node(lv).node_type.payload == g.node(lv).node_type.payload


def test_levels_params_are_arguments_not_structure():
    """Two graphs differing only in Levels params share one fingerprint
    (slider drags must reuse cached executables, like Value edits)."""
    g1, _, _ = _build((0.1, 0.9, 2.0, 0.0, 1.0))
    g2, _, _ = _build((0.3, 0.7, 0.5, 0.2, 0.8))
    assert graph_fingerprint(g1) == graph_fingerprint(g2)


def test_levels_formula_reference_values():
    """Spot-check the remap against a float64 reference on CPU (plain ops
    there are IEEE / glibc)."""
    import jax

    from kanter_core_tpu.ops.levels import levels_plane

    rng = np.random.default_rng(0)
    x = rng.random((33, 41), np.float32)
    params = np.asarray([0.2, 0.8, 1.7, 0.1, 0.9], np.float32)
    got = np.asarray(jax.jit(levels_plane)(x, params))
    t = np.clip((x - np.float32(0.2)) / np.float32(0.6), 0.0, 1.0)
    expect = np.float32(0.1) + np.float32(0.8) * np.power(t, np.float32(1.7))
    assert np.allclose(got, expect, atol=2e-6)


def test_levels_degenerate_span_is_deterministic():
    """in_hi == in_lo: the divide yields ±inf, the clip resolves to a
    0/1 step at the threshold — deterministic, not an error (IEEE
    propagation like Mix DIVIDE, `mix.rs:179`)."""
    import jax

    from kanter_core_tpu.ops.levels import levels_plane

    x = np.asarray([[0.2, 0.5, 0.8]], np.float32)
    params = np.asarray([0.5, 0.5, 1.0, 0.0, 1.0], np.float32)
    got = np.asarray(jax.jit(levels_plane)(x, params))
    # below threshold → -inf → clip 0; at threshold → 0/0 = NaN; above → +inf → 1
    assert got[0, 0] == 0.0
    assert np.isnan(got[0, 1])
    assert got[0, 2] == 1.0


def test_levels_four_consumer_parity():
    """fused == eager == tiled engine pixels, and bucketed == fused f32."""
    from kanter_core_tpu.bucketed import BucketedGraph

    px = {}
    for mode, kw, auto in (
        ("fused", {}, False),
        ("eager", {}, True),
        ("tiled", {"tile_bytes": 1}, False),
    ):
        tp = TextureProcessor(10_000_000, **kw)
        try:
            g, lv, out = _build()
            lg = tp.new_live_graph()
            with lg.write() as gg:
                gg.set_node_graph(g)
                gg.auto_update = auto
            px[mode] = render_u8(lg, out)
        finally:
            tp.shutdown_now()
    assert np.array_equal(px["fused"], px["eager"])
    assert np.array_equal(px["fused"], px["tiled"])

    g, lv, out = _build()
    ref = CompiledGraph(g, targets=[(out, SlotId(0))])()[(out, SlotId(0))]
    bg = BucketedGraph(g, targets=[(out, SlotId(0))])
    got = bg()[(out, SlotId(0))]
    assert len(ref) == len(got)
    for r, q in zip(ref, got):
        assert np.array_equal(np.asarray(r), q)


def test_levels_slider_drag_reuses_program():
    """Levels edits through the live engine change pixels WITHOUT minting
    new fused programs past the partition shapes (params ride as args)."""
    tp = TextureProcessor(10_000_000)
    try:
        g, lv, out = _build()
        lg = tp.new_live_graph()
        with lg.write() as gg:
            gg.set_node_graph(g)
        renders = [render_u8(lg, out)]
        for i, gamma in enumerate((0.5, 0.8, 1.4, 2.7)):
            with lg.write() as gg:
                # the LiveGraph wrapper dirties + cancels in one locked step
                gg.set_levels(lv, 0.1, 0.9, gamma, 0.0, 1.0)
                assert gg.node_state(lv) == NodeState.DIRTY
            renders.append(render_u8(lg, out))
        for a, b in zip(renders, renders[1:]):
            assert not np.array_equal(a, b), "levels edit did not change pixels"
        # one program for the initial full partition + one for the edited
        # sub-partition (img clean boundary) — NOT one per slider tick
        assert len(tp.engine._fused_programs) == 2
        import pytest

        from kanter_core_tpu.errors import TexProError

        with lg.write() as gg:
            with pytest.raises(TexProError):
                gg.set_levels(out, 0.1, 0.9, 1.0, 0.0, 1.0)  # not a Levels node
    finally:
        tp.shutdown_now()
