"""Resize-policy and resampler tests.

Ports the six `resize_policy_*` size assertions
(`/root/reference/tests/integration_tests.rs:848-949`) and adds unit coverage
of the weight generator against `image-0.24.0` semantics.
"""

import numpy as np
import pytest

from conftest import HEART_128, HEART_256, HEART_TALL, HEART_WIDE

from kanter_core_tpu import (
    LiveGraph,
    Node,
    NodeType,
    ResizeFilter,
    ResizePolicy,
    Size,
    SlotId,
)
from kanter_core_tpu.ops.resize import resample_weights


def _resize_policy_test(tex_pro, resize_policy, img_path_1, img_path_2, expected_size):
    lg = tex_pro.new_live_graph()
    with lg.write() as g:
        image_node_1 = g.add_node(Node(NodeType.Image(img_path_1)))
        image_node_2 = g.add_node(Node(NodeType.Image(img_path_2)))
        mix_node = Node(NodeType.Mix())
        mix_node.resize_policy = resize_policy
        mix_node = g.add_node(mix_node)
        g.connect(image_node_1, mix_node, SlotId(0), SlotId(0))
        g.connect(image_node_2, mix_node, SlotId(0), SlotId(1))
    with LiveGraph.await_clean_read(lg, mix_node) as g:
        actual = g.slot_data_size(mix_node, SlotId(0))
    assert actual == Size(*expected_size)


def test_resize_policy_least_pixels(tex_pro):
    _resize_policy_test(tex_pro, ResizePolicy.LeastPixels(), HEART_128, HEART_256, (128, 128))


def test_resize_policy_largest_axes(tex_pro):
    _resize_policy_test(tex_pro, ResizePolicy.LargestAxes(), HEART_WIDE, HEART_TALL, (128, 128))


def test_resize_policy_smallest_axes(tex_pro):
    _resize_policy_test(tex_pro, ResizePolicy.SmallestAxes(), HEART_WIDE, HEART_TALL, (64, 64))


def test_resize_policy_most_pixels(tex_pro):
    _resize_policy_test(tex_pro, ResizePolicy.MostPixels(), HEART_128, HEART_256, (256, 256))


def test_resize_policy_specific_size(tex_pro):
    _resize_policy_test(
        tex_pro, ResizePolicy.SpecificSize(Size(256, 256)), HEART_128, HEART_WIDE, (256, 256)
    )


def test_resize_policy_specific_slot(tex_pro):
    _resize_policy_test(
        tex_pro, ResizePolicy.SpecificSlot(SlotId(1)), HEART_128, HEART_WIDE, (128, 64)
    )
    # a slot id with no edge falls back to the lowest connected input slot
    _resize_policy_test(
        tex_pro, ResizePolicy.SpecificSlot(SlotId(2)), HEART_128, HEART_WIDE, (128, 128)
    )


def test_weights_normalized():
    for filt in ResizeFilter:
        lefts, weights = resample_weights(110, 128, filt)
        assert lefts.shape == (128,)
        sums = weights.sum(axis=1, dtype=np.float64)
        assert np.allclose(sums, 1.0, atol=1e-5), filt


def test_weights_identity_on_integer_grid():
    """Triangle/CatmullRom/Lanczos3 at same-size are identity convolutions."""
    for filt in (ResizeFilter.TRIANGLE, ResizeFilter.CATMULL_ROM, ResizeFilter.LANCZOS3):
        lefts, weights = resample_weights(64, 64, filt)
        for outx in range(64):
            taps = weights[outx]
            center = outx - lefts[outx]
            assert taps[center] == pytest.approx(1.0), filt
            others = np.delete(taps, center)
            assert np.all(np.abs(others) < 1e-6), filt


def test_upscale_from_one_pixel_preserves_value():
    """1×1 → N×N must reproduce the constant exactly (Value-node semantics)."""
    import jax.numpy as jnp

    from kanter_core_tpu.ops.resize import resize_plane_eager

    plane = jnp.full((1, 1), 0.33, dtype=jnp.float32)
    out = np.asarray(resize_plane_eager(plane, Size(256, 256), ResizeFilter.TRIANGLE))
    assert out.shape == (256, 256)
    assert np.all(out == np.float32(0.33))


def test_resample_clamps_to_unit_interval():
    """The image crate clamps each pass to the f32 Primitive bounds [0, 1]."""
    import jax.numpy as jnp

    from kanter_core_tpu.ops.resize import resize_plane_eager

    plane = jnp.asarray(np.float32([[5.0, -3.0], [0.5, 2.0]]))
    out = np.asarray(resize_plane_eager(plane, Size(4, 4), ResizeFilter.TRIANGLE))
    assert out.max() <= 1.0
    assert out.min() >= 0.0
