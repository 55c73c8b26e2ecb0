"""Blur extension node: separable wrap Gaussian (no reference counterpart)."""

import jax
import numpy as np

from kanter_core_tpu import (
    Node,
    NodeGraph,
    NodeType,
    SlotId,
    TextureProcessor,
)
from kanter_core_tpu.ops.blur import blur_plane, gaussian_taps


def test_taps_normalized_and_symmetric():
    for sigma in (0.5, 1.0, 2.5):
        taps = gaussian_taps(sigma)
        assert len(taps) == 2 * max(1, int(np.ceil(3 * sigma))) + 1
        assert abs(float(taps.sum(dtype=np.float64)) - 1.0) < 1e-6
        np.testing.assert_array_equal(taps, taps[::-1])


def test_impulse_response_is_separable_kernel():
    taps = gaussian_taps(1.0)
    r = (len(taps) - 1) // 2
    plane = np.zeros((16, 16), dtype=np.float32)
    plane[8, 8] = 1.0
    out = np.asarray(jax.jit(lambda p: blur_plane(p, 1.0))(plane))
    expected = np.zeros_like(plane)
    expected[8 - r : 8 + r + 1, 8 - r : 8 + r + 1] = np.outer(taps, taps)
    np.testing.assert_allclose(out, expected, atol=2e-7)


def test_wrap_commutes_with_roll():
    """Toroidal wrap ⇒ blur(roll(x)) == roll(blur(x)) BITWISE."""
    rng = np.random.default_rng(0)
    plane = rng.random((24, 40), dtype=np.float32)
    f = jax.jit(lambda p: blur_plane(p, 1.7))
    a = np.asarray(f(np.roll(plane, (5, 11), axis=(0, 1))))
    b = np.roll(np.asarray(f(plane)), (5, 11), axis=(0, 1))
    np.testing.assert_array_equal(a, b)


def test_serde_round_trip():
    g = NodeGraph()
    inp = g.add_node(Node(NodeType.InputGray("in")))
    blur = g.add_node(Node(NodeType.Blur(2.25)))
    out = g.add_node(Node(NodeType.OutputGray("out")))
    g.connect(inp, blur, SlotId(0), SlotId(0))
    g.connect(blur, out, SlotId(0), SlotId(0))
    g2 = NodeGraph.from_json(g.to_json())
    node = g2.node(blur)
    assert node.node_type.kind.value == "Blur"
    assert node.node_type.payload == 2.25


def test_set_blur_sigma_dirties():
    tp = TextureProcessor(1 << 30)
    lg = tp.new_live_graph()
    with lg.write() as g:
        inp = g.add_node(Node(NodeType.Value(0.5)))
        blur = g.add_node(Node(NodeType.Blur(1.0)))
        out = g.add_node(Node(NodeType.OutputGray("out")))
        g.connect(inp, blur, SlotId(0), SlotId(0))
        g.connect(blur, out, SlotId(0), SlotId(0))
    TextureProcessor.buffer_rgba(lg, out, SlotId(0))
    from kanter_core_tpu import NodeState

    with lg.write() as g:
        g.set_blur_sigma(blur, 2.0)
        assert g.node_state(out) == NodeState.DIRTY
        assert g.node(blur).node_type.payload == 2.0
    import pytest
    from kanter_core_tpu.errors import TexProError

    with lg.write() as g:
        with pytest.raises(TexProError):
            g.set_blur_sigma(inp, 1.0)  # not a Blur node
    tp.shutdown_now()


def test_engine_end_to_end_rgba():
    import tests.conftest as cf

    tp = TextureProcessor(1 << 30)
    lg = tp.new_live_graph()
    with lg.write() as g:
        img = g.add_node(Node(NodeType.Image(cf.HEART_256)))
        blur = g.add_node(Node(NodeType.Blur(1.5)))
        out = g.add_node(Node(NodeType.OutputRgba("out")))
        g.connect(img, blur, SlotId(0), SlotId(0))
        g.connect(blur, out, SlotId(0), SlotId(0))
    pixels = TextureProcessor.buffer_rgba(lg, out, SlotId(0))
    assert len(pixels) == 256 * 256 * 4
    # blurring a hard-edged heart must produce intermediate gray levels
    reds = np.asarray(pixels).reshape(-1, 4)[:, 0]
    assert ((reds > 10) & (reds < 245)).sum() > 100
    tp.shutdown_now()


def test_blur_rejects_absurd_sigma():
    """sigma shapes the tap table and the jnp roll chain (O(sigma) host
    and trace structures) — absurd payloads are rejected at construction
    instead of hanging tap baking (r4 payload-hazard class, same gate
    family as warp_pairs' halo bound)."""
    import pytest
    from kanter_core_tpu.errors import TexProError

    with pytest.raises(TexProError):
        NodeType.Blur(1e9)
    with pytest.raises(TexProError):
        NodeType.Blur(0.0)
    with pytest.raises(TexProError):
        NodeType.Blur(-1.0)
    NodeType.Blur(256.0)  # the cap itself is fine
