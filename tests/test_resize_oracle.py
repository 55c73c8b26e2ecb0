"""Resize filter verification hardening (VERDICT r1 missing #5 / next #8).

Two independent checks on the resampler beyond the Triangle-only golden
coverage:

1. frozen bit-pattern fixtures for all 5 filters × {up, down, irregular}
   (tests/fixtures/resize_fixtures.npz, regenerated only deliberately via
   scripts/gen_resize_fixtures.py);
2. a float64-oracle property test of the weight generation: the f32 weights
   must match an independently written float64 evaluation of the same
   `image-0.24.0` algorithm (`/root/reference/src/shared.rs` usage;
   sample.rs `resize`) to within a few ulps — catching wrong kernel
   constants / support windows that pure self-consistency cannot.
"""

import math
import os

import numpy as np
import pytest

from kanter_core_tpu.geometry import Size
from kanter_core_tpu.node import ResizeFilter
from kanter_core_tpu.ops.resize import resample_weights, resize_plane_eager

FIXTURES = os.path.join(os.path.dirname(__file__), "fixtures", "resize_fixtures.npz")

CASES = [("up", Size(96, 64)), ("down", Size(23, 17)), ("irregular", Size(300, 97))]


@pytest.mark.parametrize("filt", list(ResizeFilter))
@pytest.mark.parametrize("case,size", CASES)
def test_frozen_bit_patterns(filt, case, size):
    data = np.load(FIXTURES)
    out = np.asarray(resize_plane_eager(data["src"], size, filt))
    expected = data[f"{filt.name}_{case}"]
    assert out.shape == expected.shape
    # bit equality, not allclose: the resampler's contract is bit-exactness
    assert np.array_equal(
        out.view(np.uint32), expected.view(np.uint32)
    ), f"{filt.name} {case}: {np.count_nonzero(out.view(np.uint32) != expected.view(np.uint32))} differing bits"


# --- float64 oracle: independent reimplementation of the weight algorithm ---

_SUPPORT64 = {
    ResizeFilter.NEAREST: 0.0,
    ResizeFilter.TRIANGLE: 1.0,
    ResizeFilter.CATMULL_ROM: 2.0,
    ResizeFilter.GAUSSIAN: 3.0,
    ResizeFilter.LANCZOS3: 3.0,
}


def _kernel64(filt, x: float) -> float:
    a = abs(x)
    if filt == ResizeFilter.NEAREST:
        return 1.0
    if filt == ResizeFilter.TRIANGLE:
        return 1.0 - a if a < 1.0 else 0.0
    if filt == ResizeFilter.CATMULL_ROM:
        b, c = 0.0, 0.5
        if a < 1.0:
            k = (12.0 - 9.0 * b - 6.0 * c) * a**3 + (-18.0 + 12.0 * b + 6.0 * c) * a**2 + (6.0 - 2.0 * b)
        elif a < 2.0:
            k = (-b - 6.0 * c) * a**3 + (6.0 * b + 30.0 * c) * a**2 + (-12.0 * b - 48.0 * c) * a + (8.0 * b + 24.0 * c)
        else:
            k = 0.0
        return k / 6.0
    if filt == ResizeFilter.GAUSSIAN:
        r = 0.5
        return math.exp(-(x * x) / (2.0 * r * r)) / (math.sqrt(2.0 * math.pi) * r)
    if filt == ResizeFilter.LANCZOS3:
        if a >= 3.0:
            return 0.0

        def sinc(t):
            return 1.0 if t == 0.0 else math.sin(t * math.pi) / (t * math.pi)

        return sinc(x) * sinc(x / 3.0)
    raise AssertionError(filt)


def _weights64(in_len: int, out_len: int, filt) -> tuple[np.ndarray, list]:
    """f64 oracle for the KERNEL VALUES and NORMALIZATION.

    The tap *windows* (lefts/rights) are deliberately computed in f32 with
    the production arithmetic: the Rust original does window math in f32, so
    near integer boundaries (e.g. 512→511) the f32 floor/ceil legitimately
    lands one pixel off the f64 answer — that is behavior to preserve, not
    an error the oracle should flag. What the oracle independently verifies
    is everything a porting mistake could silently corrupt: kernel formulas,
    constants (B/C spline coefficients, Gaussian σ, Lanczos lobes), support
    widths, and the normalization by the weight sum.
    """
    f32 = np.float32
    support = _SUPPORT64[filt]
    ratio32 = f32(f32(in_len) / f32(out_len))
    sratio32 = ratio32 if ratio32 >= f32(1.0) else f32(1.0)
    src_support32 = f32(f32(support) * sratio32)
    sratio = float(sratio32)
    lefts, all_ws = np.zeros(out_len, dtype=np.int64), []
    for outx in range(out_len):
        inputx32 = f32(f32(f32(outx) + f32(0.5)) * ratio32)
        left = max(0, min(int(math.floor(float(f32(inputx32 - src_support32)))), in_len - 1))
        right = max(left + 1, min(int(math.ceil(float(f32(inputx32 + src_support32)))), in_len))
        center = float(f32(inputx32 - f32(0.5)))
        ws = [_kernel64(filt, (i - center) / sratio) for i in range(left, right)]
        total = sum(ws)
        lefts[outx] = left
        all_ws.append([w / total for w in ws])
    return lefts, all_ws


@pytest.mark.parametrize("filt", list(ResizeFilter))
@pytest.mark.parametrize(
    "in_len,out_len",
    [(37, 96), (96, 37), (128, 110), (110, 128), (1, 7), (512, 511), (13, 13)],
)
def test_weights_match_float64_oracle(filt, in_len, out_len):
    lefts32, weights32 = resample_weights(in_len, out_len, filt)
    lefts64, ws64 = _weights64(in_len, out_len, filt)

    assert np.array_equal(lefts32.astype(np.int64), lefts64), "tap windows differ"
    for outx in range(out_len):
        taps64 = ws64[outx]
        taps32 = weights32[outx]
        # padded taps beyond the window must be exactly 0.0
        assert np.all(taps32[len(taps64):] == 0.0)
        for t, w64 in enumerate(taps64):
            w32 = float(taps32[t])
            # f32 weight arithmetic in Rust's eval order accumulates a few
            # ulps vs the f64 oracle; anything beyond ~1e-5 relative means a
            # wrong constant/kernel, not rounding. (Normalization divides by
            # the f32 running sum, so absolute error scales with weight size.)
            assert abs(w32 - w64) <= 1e-5 + 1e-4 * abs(w64), (
                f"{filt.name} out={outx} tap={t}: f32={w32!r} f64={w64!r}"
            )
        # normalized weights must sum to ~1 in f64
        assert abs(sum(float(w) for w in taps32) - 1.0) < 1e-5
