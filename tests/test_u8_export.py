"""u8 export parity: the u32-packed converter vs the reference semantics."""

import numpy as np


def test_u32_pack_export_matches_reference_semantics():
    """The u32-packed export (slot_image._jitted_converters) byte-matches
    the reference conversion, NaN/±inf edge cases included
    (`slot_image.rs:142-144`)."""
    from kanter_core_tpu.slot_image import SlotImage

    rng = np.random.default_rng(3)
    planes = [rng.standard_normal((40, 128)).astype(np.float32) * 2 for _ in range(4)]
    planes[0][0, 0] = np.nan
    planes[1][0, 1] = np.inf
    planes[2][0, 2] = -np.inf
    out = SlotImage.Rgba(list(planes)).to_u8()

    def ref_conv(x):
        c = np.clip(x, 0.0, 1.0)
        v = c * np.float32(255.0)
        v = np.where(np.isnan(v), np.float32(255.0), np.minimum(v, np.float32(255.0)))
        return v.astype(np.uint8)

    expected = np.stack([ref_conv(p) for p in planes], axis=-1).reshape(-1)
    assert np.array_equal(out, expected)

