"""Regenerate tests/fixtures/resize_fixtures.npz (VERDICT r1 missing #5).

Freezes the exact f32 bit patterns the resampler produces on the CPU backend
for all 5 filters × {upscale, downscale, irregular} so any future change to
the weight formulas or accumulation order fails loudly. Only the Triangle
filter is covered by reference goldens (`irregular_sizes`, Value upscales);
the other filters' bit-exactness vs Rust `image-0.24.0`
(`/root/reference/src/node/mod.rs:62-99`) rests on the ported weight
formulas (validated against a float64 oracle in tests/test_resize.py) plus
these frozen fixtures.

Run: python scripts/gen_resize_fixtures.py   (rewrites the .npz; commit it
only when a bit change is intended and explained.)
"""

import os
import sys

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from kanter_core_tpu.geometry import Size  # noqa: E402
from kanter_core_tpu.node import ResizeFilter  # noqa: E402
from kanter_core_tpu.ops.resize import resize_plane_eager  # noqa: E402

OUT = os.path.join(os.path.dirname(__file__), "..", "tests", "fixtures", "resize_fixtures.npz")

CASES = [
    ("up", Size(96, 64)),        # 53×37 → 96×64 upscale
    ("down", Size(23, 17)),      # downscale
    ("irregular", Size(300, 97)),  # both axes cross the input size
]


def main() -> None:
    rng = np.random.default_rng(12345)
    src = rng.random((37, 53), dtype=np.float32)
    arrays = {"src": src}
    for filt in ResizeFilter:
        for case, size in CASES:
            out = np.asarray(resize_plane_eager(src, size, filt))
            arrays[f"{filt.name}_{case}"] = out
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    np.savez(OUT, **arrays)
    print(f"wrote {os.path.normpath(OUT)}: {sorted(arrays)} ")


if __name__ == "__main__":
    main()
