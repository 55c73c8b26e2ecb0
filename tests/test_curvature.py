"""Curvature node (extension): wrap-Laplacian semantics vs a bitwise numpy
oracle, strength-as-argument caching, degenerate axes, and four-consumer
lockstep parity (also fuzz-covered via the shared generator)."""

import numpy as np
import pytest

from conftest import render_u8

from kanter_core_tpu import (
    Node,
    NodeGraph,
    NodeState,
    NodeType,
    SlotId,
    TextureProcessor,
)
from kanter_core_tpu.compiler import CompiledGraph, graph_fingerprint
from kanter_core_tpu.errors import TexProError


def _oracle(h: np.ndarray, strength: float) -> np.ndarray:
    """f32 numpy twin of ops/curvature.curvature_plane: every op rounds
    once, in the same association — matches bit-for-bit on CPU."""
    h = np.asarray(h, np.float32)
    up, down = np.roll(h, 1, 0), np.roll(h, -1, 0)
    left, right = np.roll(h, 1, 1), np.roll(h, -1, 1)
    lap = ((h - up) + (h - down)) + ((h - left) + (h - right))
    return np.clip(np.float32(0.5) + np.float32(strength) * lap, 0.0, 1.0)


def _build(strength=6.0):
    g = NodeGraph()
    noise = g.add_node(Node(NodeType.Noise(97, 83, cells=5, octaves=3, seed=11)))
    cv = g.add_node(Node(NodeType.Curvature(strength)))
    g.connect(noise, cv, SlotId(0), SlotId(0))
    out = g.add_node(Node(NodeType.OutputGray("out")))
    g.connect(cv, out, SlotId(0), SlotId(0))
    return g, cv, out


def test_curvature_serde_round_trip():
    g, cv, _ = _build(3.5)
    clone = NodeGraph.from_json(g.to_json())
    assert clone.to_json() == g.to_json()
    assert clone.node(cv).node_type.payload == 3.5


def test_curvature_strength_is_argument_not_structure():
    g1, _, _ = _build(1.0)
    g2, _, _ = _build(42.0)
    assert graph_fingerprint(g1) == graph_fingerprint(g2)


@pytest.mark.parametrize("shape", [(33, 41), (1, 17), (19, 1), (1, 1), (2, 2)])
def test_curvature_matches_numpy_oracle_bitwise(shape):
    import jax

    from kanter_core_tpu.ops.curvature import curvature_plane

    rng = np.random.default_rng(sum(shape))
    h = rng.random(shape, np.float32)
    got = np.asarray(jax.jit(curvature_plane)(h, np.float32(7.3)))
    assert got.tobytes() == _oracle(h, 7.3).tobytes()


def test_curvature_sign_convention_and_wrap():
    """A single raised pixel: itself brighter than 0.5 (convex), its four
    wrap-neighbors darker (concave), far field exactly 0.5 — including
    neighbors reached ACROSS the toroidal edge."""
    import jax

    from kanter_core_tpu.ops.curvature import curvature_plane

    h = np.zeros((8, 8), np.float32)
    h[0, 0] = 1.0  # corner: neighbors wrap to rows/cols 7
    got = np.asarray(jax.jit(curvature_plane)(h, np.float32(0.1)))
    assert got[0, 0] > 0.5
    for r, c in ((7, 0), (1, 0), (0, 7), (0, 1)):
        assert got[r, c] < 0.5, (r, c)
    assert got[3, 3] == 0.5
    # degenerate canvas: every neighbor is the pixel itself → flat 0.5
    one = np.asarray(jax.jit(curvature_plane)(
        np.asarray([[0.7]], np.float32), np.float32(9.0)
    ))
    assert one[0, 0] == 0.5


def test_curvature_four_consumer_parity():
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
            g, cv, out = _build()
            lg = tp.new_live_graph()
            with lg.write() as gg:
                gg.set_node_graph(g)
                gg.auto_update = auto
            px[mode] = render_u8(lg, out)
        finally:
            tp.shutdown_now()
    assert np.array_equal(px["fused"], px["eager"])
    assert np.array_equal(px["fused"], px["tiled"])

    g, cv, out = _build()
    ref = CompiledGraph(g, targets=[(out, SlotId(0))])()[(out, SlotId(0))]
    bg = BucketedGraph(g, targets=[(out, SlotId(0))])
    got = bg()[(out, SlotId(0))]
    assert len(ref) == len(got)
    for r, q in zip(ref, got):
        assert np.array_equal(np.asarray(r), q)


def test_curvature_slider_drag_reuses_program():
    """Strength edits through the live engine change pixels WITHOUT minting
    new fused programs past the partition shapes (strength rides as an
    argument), and the setter rejects non-Curvature nodes."""
    tp = TextureProcessor(10_000_000)
    try:
        g, cv, out = _build()
        lg = tp.new_live_graph()
        with lg.write() as gg:
            gg.set_node_graph(g)
        renders = [render_u8(lg, out)]
        for strength in (0.5, 2.0, 11.0):
            with lg.write() as gg:
                gg.set_curvature(cv, strength)
                assert gg.node_state(cv) == NodeState.DIRTY
            renders.append(render_u8(lg, out))
        for a, b in zip(renders, renders[1:]):
            assert not np.array_equal(a, b), "curvature edit did not change pixels"
        # one program for the initial full partition + one for the edited
        # sub-partition (clean Noise boundary preset) — NOT one per tick
        assert len(tp.engine._fused_programs) == 2
        with lg.write() as gg:
            with pytest.raises(TexProError):
                gg.set_curvature(out, 1.0)  # not a Curvature node
    finally:
        tp.shutdown_now()


def test_curvature_rejects_rgba_input():
    from conftest import HEART_128

    g = NodeGraph()
    img = g.add_node(Node(NodeType.Image(str(HEART_128))))
    cv = g.add_node(Node(NodeType.Curvature()))
    with pytest.raises(TexProError):
        g.connect(img, cv, SlotId(0), SlotId(0))  # GRAY slot refuses RGBA
