"""sRGB export path: `to_u8_srgb` / `buffer_srgba` vs the reference formula.

The reference's `to_u8_srgb` applies `srgb_to_linear` (despite the method
name — `slot_image.rs:172-175`, formula `slot_data.rs:100-109`) to the color
channels, leaves alpha linear, then does the standard clamp/×255/truncate.
No golden PNG covers it, so this replicates the formula in numpy (glibc
powf via np.power) and compares bitwise.
"""

import numpy as np

from kanter_core_tpu import (
    LiveGraph,
    Node,
    NodeType,
    SlotId,
    TextureProcessor,
)
from kanter_core_tpu.slot_image import SlotImage
from kanter_core_tpu.transient_buffer import plane_from_host


def _srgb_to_linear(x):
    out = np.where(
        x <= np.float32(0.04045),
        x / np.float32(12.92),
        np.power(
            ((x + np.float32(0.055)) / np.float32(1.055)).astype(np.float32),
            np.float32(2.4),
            dtype=np.float32,
        ),
    )
    return np.where(x <= 0, x, out).astype(np.float32)


def _f32_to_u8(x):
    c = np.clip(x, 0.0, 1.0) * np.float32(255.0)
    c = np.where(np.isnan(c), np.float32(255.0), np.minimum(c, np.float32(255.0)))
    return c.astype(np.uint8)


def test_to_u8_srgb_matches_reference_formula():
    rng = np.random.default_rng(0)
    planes = rng.random((4, 64, 64), dtype=np.float32)
    image = SlotImage([plane_from_host(p) for p in planes])
    got = np.asarray(image.to_u8_srgb()).reshape(64, 64, 4)

    expect = np.stack(
        [_f32_to_u8(_srgb_to_linear(np.clip(planes[c], 0.0, 1.0))) for c in range(3)]
        + [_f32_to_u8(planes[3])],
        axis=-1,
    )
    np.testing.assert_array_equal(got, expect)


def test_buffer_srgba_through_engine():
    tp = TextureProcessor(1 << 30)
    lg = tp.new_live_graph()
    with lg.write() as g:
        v = g.add_node(Node(NodeType.Value(0.5)))
        out = g.add_node(Node(NodeType.OutputGray("out")))
        g.connect(v, out, SlotId(0), SlotId(0))
    with LiveGraph.await_clean_read(lg, out) as g:
        srgb = np.asarray(g.buffer_srgba(out, SlotId(0)))
        linear = np.asarray(g.buffer_rgba(out, SlotId(0)))
    # gray 0.5 → linearized ≈ 0.2140, then ×255 truncated
    expect = int(_f32_to_u8(_srgb_to_linear(np.float32(0.5)).reshape(1))[0])
    assert srgb[0] == expect and srgb[3] == 255
    assert linear[0] == 127  # untouched path stays linear
    tp.shutdown_now()


def test_to_u8_srgb_off_device_fallback_matches():
    """Fully spilled images export sRGB without a device round-trip; the
    off-device (XLA:CPU) path must byte-match the device path."""
    rng = np.random.default_rng(9)
    planes = [rng.random((32, 32), dtype=np.float32) for _ in range(4)]
    img = SlotImage([plane_from_host(p) for p in planes])
    on_device = img.to_u8_srgb()

    spilled = SlotImage([plane_from_host(p) for p in planes])
    for p in spilled.planes:
        p.data()           # promote to device first
        p.evict_to_host()  # then spill
    assert spilled._all_planes_off_device()
    off_device = spilled.to_u8_srgb()
    assert np.array_equal(on_device, off_device)
