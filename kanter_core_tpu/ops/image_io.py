"""Host-side image decode/encode.

Mirrors `/root/reference/src/shared.rs:16-56,218-261` (deconstruct_image /
read_slot_image) and the Image/Write node behaviors
(`/root/reference/src/node/image.rs`, `node/write.rs`).

Decoding: u8 samples are interleaved channel-major per pixel; each channel
becomes an f32 plane as `u8 / 255.0`. Missing channels default to 0.0 except
alpha which defaults to 1.0 (`shared.rs:35-45`). Note the reference maps a
2-channel (luma+alpha) image to planes `[L, A, 0, 1]` — channel order is
positional, not semantic; this quirk is preserved. The result is always RGBA
(deconstruct always yields 4 planes, `shared.rs:21-26`).
"""

from __future__ import annotations

import numpy as np

from ..errors import ErrorKind, TexProError
from ..geometry import Size
from ..slot_image import SlotImage
from ..transient_buffer import plane_from_host


def deconstruct_image(pixels_u8: np.ndarray) -> list[np.ndarray]:
    """`[H, W, C]` u8 → four `[H, W]` f32 planes (missing → 0.0, alpha → 1.0)."""
    if pixels_u8.ndim == 2:
        pixels_u8 = pixels_u8[:, :, None]
    h, w, channel_count = pixels_u8.shape
    planes = []
    for c in range(4):
        if c < channel_count:
            planes.append((pixels_u8[:, :, c].astype(np.float32)) / np.float32(255.0))
        elif c == 3:
            planes.append(np.ones((h, w), dtype=np.float32))
        else:
            planes.append(np.zeros((h, w), dtype=np.float32))
    return planes


def read_slot_image(path) -> SlotImage:
    """Decode an image file into an RGBA `SlotImage` (`shared.rs:218-261`)."""
    from PIL import Image as PILImage

    try:
        with PILImage.open(path) as im:
            if im.mode == "P":
                im = im.convert("RGBA")
            elif im.mode not in ("L", "LA", "RGB", "RGBA"):
                im = im.convert("RGBA")
            pixels = np.asarray(im, dtype=np.uint8)
    except Exception as e:  # noqa: BLE001 - any decode failure maps to Image error
        raise TexProError(ErrorKind.IMAGE, str(e)) from e

    # native C++ deinterleave (~1.8× numpy at 4096² on this host); falls back
    # to deconstruct_image internally when the shared library is unavailable
    from ..native import planes_from_u8

    planes = planes_from_u8(pixels)
    return SlotImage([plane_from_host(p) for p in planes])


def magenta_placeholder() -> SlotImage:
    """1×1 magenta RGBA fallback for failed loads (`node/image.rs:13-18`)."""
    return SlotImage(
        [
            plane_from_host(np.full((1, 1), 1.0, dtype=np.float32)),
            plane_from_host(np.zeros((1, 1), dtype=np.float32)),
            plane_from_host(np.full((1, 1), 1.0, dtype=np.float32)),
            plane_from_host(np.full((1, 1), 1.0, dtype=np.float32)),
        ]
    )


def save_rgba_png(path, rgba_u8_flat: np.ndarray, size: Size) -> None:
    """Encode flat interleaved RGBA u8 to a PNG (`node/write.rs:5-21`)."""
    from PIL import Image as PILImage

    arr = np.asarray(rgba_u8_flat, dtype=np.uint8).reshape(size.height, size.width, 4)
    PILImage.fromarray(arr, mode="RGBA").save(path)
