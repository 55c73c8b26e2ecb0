"""Hsv node (extension): hexcone adjust vs a bitwise numpy oracle,
parameter-as-argument caching, alpha aliasing, and four-consumer lockstep
parity (also fuzz-covered via the shared generator)."""

import numpy as np
import pytest

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
from kanter_core_tpu.errors import TexProError


def _oracle(r, g, b, hue_deg, sat, val):
    """f32 numpy twin of ops/hsv.hsv_planes: every op rounds once, same
    association and select tree — matches bit-for-bit on CPU."""
    f = np.float32
    shift6 = f((np.float64(hue_deg) % 360.0 + 360.0) % 360.0 / 60.0)
    maxc = np.maximum(r, np.maximum(g, b))
    minc = np.minimum(r, np.minimum(g, b))
    delta = maxc - minc
    safe = np.where(delta == 0, f(1.0), delta)
    with np.errstate(invalid="ignore", divide="ignore"):  # discarded 0/0 branch
        h6 = np.where(
            delta == 0,
            f(0.0),
            np.where(
                maxc == r,
                (g - b) / safe,
                np.where(maxc == g, f(2.0) + (b - r) / safe,
                         f(4.0) + (r - g) / safe),
            ),
        )
        h6 = np.where(h6 < 0, h6 + f(6.0), h6)
        s = np.where(maxc == 0, f(0.0), delta / maxc)
    hh = h6 + shift6
    hh = np.where(hh >= 6.0, hh - f(6.0), hh)
    ss = np.clip(s * f(sat), 0.0, 1.0).astype(f)
    vv = np.clip(maxc * f(val), 0.0, 1.0).astype(f)
    sec = np.floor(hh)
    i = np.clip(sec.astype(np.int32), 0, 5)
    fr = hh - sec
    p = vv * (f(1.0) - ss)
    q = vv * (f(1.0) - ss * fr)
    t = vv * (f(1.0) - ss * (f(1.0) - fr))

    def pick(table):
        out = table[5]
        for k in (4, 3, 2, 1, 0):
            out = np.where(i == k, table[k], out)
        return out

    return (pick((vv, q, p, p, t, vv)),
            pick((t, vv, vv, q, p, p)),
            pick((p, p, t, vv, vv, q)))


def _build(params=(150.0, 1.4, 0.9)):
    g = NodeGraph()
    img = g.add_node(Node(NodeType.Image(str(HEART_128))))
    hs = g.add_node(Node(NodeType.Hsv(*params)))
    g.connect(img, hs, SlotId(0), SlotId(0))
    out = g.add_node(Node(NodeType.OutputRgba("out")))
    g.connect(hs, out, SlotId(0), SlotId(0))
    return g, hs, out


def test_hsv_serde_round_trip():
    g, hs, _ = _build((12.5, 0.7, 1.2))
    clone = NodeGraph.from_json(g.to_json())
    assert clone.to_json() == g.to_json()
    assert clone.node(hs).node_type.payload == (12.5, 0.7, 1.2)


def test_hsv_params_are_arguments_not_structure():
    g1, _, _ = _build((0.0, 1.0, 1.0))
    g2, _, _ = _build((271.0, 0.2, 1.8))
    assert graph_fingerprint(g1) == graph_fingerprint(g2)


@pytest.mark.parametrize("params", [
    (0.0, 1.0, 1.0),      # identity settings
    (90.0, 1.0, 1.0),     # pure rotation
    (123.4, 0.5, 1.2),    # everything at once
    (-450.0, 2.0, 0.7),   # negative hue wraps, saturation clips
    (360.0, 0.0, 1.0),    # full wrap, desaturate
])
def test_hsv_matches_numpy_oracle_bitwise(params):
    import jax

    from kanter_core_tpu.ops.hsv import hsv_bindings, hsv_planes

    rng = np.random.default_rng(7)
    r, g, b = (rng.random((37, 43), np.float32) for _ in range(3))
    # sprinkle exact gray/black pixels to hit the degenerate selects
    r[0, :4] = g[0, :4] = b[0, :4] = np.asarray([0.0, 0.5, 1.0, 0.25], np.float32)
    got = jax.jit(lambda pr, a, c, d: hsv_planes([a, c, d], pr))(
        hsv_bindings(params), r, g, b
    )
    expect = _oracle(r, g, b, *params)
    for gp, ep in zip(got, expect):
        assert np.asarray(gp).tobytes() == ep.tobytes()


def test_hsv_primary_rotation_is_exact():
    """Pure red + 120° → pure green, + 240° → pure blue: the sector math
    lands on exact 0/1 values."""
    import jax

    from kanter_core_tpu.ops.hsv import hsv_bindings, hsv_planes

    r = np.ones((2, 2), np.float32)
    z = np.zeros((2, 2), np.float32)
    for deg, expect in ((120.0, (0.0, 1.0, 0.0)), (240.0, (0.0, 0.0, 1.0))):
        got = jax.jit(lambda pr, a, c, d: hsv_planes([a, c, d], pr))(
            hsv_bindings((deg, 1.0, 1.0)), r, z, z
        )
        for gp, e in zip(got, expect):
            assert np.all(np.asarray(gp) == np.float32(e)), deg


def test_hsv_gray_input_is_value_scale_only():
    import jax

    from kanter_core_tpu.ops.hsv import hsv_bindings, hsv_planes

    x = np.linspace(0, 1.4, 64, dtype=np.float32).reshape(8, 8)
    (got,) = jax.jit(lambda pr, a: hsv_planes([a], pr))(
        hsv_bindings((200.0, 0.3, 0.8)), x
    )
    assert np.array_equal(
        np.asarray(got), np.clip(x * np.float32(0.8), 0.0, 1.0)
    )


def test_hsv_alpha_plane_is_aliased():
    """The eager path must pass the stored alpha PlaneBuffer through by
    reference (zero copy), not re-route it through the kernel."""
    from kanter_core_tpu.ids import NodeId
    from kanter_core_tpu.ops import hsv as hsv_op
    from kanter_core_tpu.ops.image_io import read_slot_image
    from kanter_core_tpu.slot_data import SlotData

    image = read_slot_image(str(HEART_128))
    node = Node(NodeType.Hsv(33.0, 1.1, 0.9), NodeId(7))
    [out] = hsv_op.process([SlotData(NodeId(7), SlotId(0), image)], node)
    assert out.image.planes[3] is image.planes[3]


def test_hsv_four_consumer_parity():
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
            g, hs, out = _build()
            lg = tp.new_live_graph()
            with lg.write() as gg:
                gg.set_node_graph(g)
                gg.auto_update = auto
            px[mode] = render_u8(lg, out)
        finally:
            tp.shutdown_now()
    assert np.array_equal(px["fused"], px["eager"])
    assert np.array_equal(px["fused"], px["tiled"])

    g, hs, out = _build()
    ref = CompiledGraph(g, targets=[(out, SlotId(0))])()[(out, SlotId(0))]
    bg = BucketedGraph(g, targets=[(out, SlotId(0))])
    got = bg()[(out, SlotId(0))]
    assert len(ref) == len(got)
    for r, q in zip(ref, got):
        assert np.array_equal(np.asarray(r), q)


def test_hsv_slider_drag_reuses_program():
    tp = TextureProcessor(10_000_000)
    try:
        g, hs, out = _build()
        lg = tp.new_live_graph()
        with lg.write() as gg:
            gg.set_node_graph(g)
        renders = [render_u8(lg, out)]
        for hue in (45.0, 180.0, 300.0):
            with lg.write() as gg:
                gg.set_hsv(hs, hue, 1.2, 1.0)
                assert gg.node_state(hs) == NodeState.DIRTY
            renders.append(render_u8(lg, out))
        for a, b in zip(renders, renders[1:]):
            assert not np.array_equal(a, b), "hsv edit did not change pixels"
        # initial full partition + edited sub-partition (clean Image
        # boundary) — NOT one per slider tick
        assert len(tp.engine._fused_programs) == 2
        with lg.write() as gg:
            with pytest.raises(TexProError):
                gg.set_hsv(out, 0.0, 1.0, 1.0)  # not an Hsv node
    finally:
        tp.shutdown_now()
