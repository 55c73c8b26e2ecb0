"""On-chip A/B of data-movement formulations for blur and resample.

All variants compute IDENTICAL per-element arithmetic sequences (gathers and
slices don't round), so the winner can replace the current form without
touching bit-exactness. Uses the honest ScanBench protocol.

Run: python scripts/probe_ops.py [blur|resample] [sizes...]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from benchlib import ScanBench, device_random
from kanter_core_tpu.geometry import Size
from kanter_core_tpu.node import ResizeFilter
from kanter_core_tpu.ops.blur import gaussian_taps
from kanter_core_tpu.ops.exact_math import nc_mul
from kanter_core_tpu.ops.resize import resample_plane, resample_weights

WHICH = sys.argv[1] if len(sys.argv) > 1 else "all"
SIZES = [int(s) for s in sys.argv[2:]] or [2048, 4096]


# --- blur variants (vertical+horizontal separable, wrap) ---
def blur_roll(plane, sigma):  # current production form
    from kanter_core_tpu.ops.blur import blur_plane

    return blur_plane(plane, sigma)


def _axis0_pad(plane, taps):
    r = (len(taps) - 1) // 2
    padded = jnp.concatenate([plane[-r:], plane, plane[:r]], axis=0)
    h = plane.shape[0]
    acc = jnp.zeros_like(plane)
    for t, w in enumerate(taps):
        shifted = jax.lax.slice_in_dim(padded, t, t + h, axis=0)
        acc = acc + nc_mul(shifted, jnp.float32(w))
    return acc


def blur_pad(plane, sigma):
    taps = gaussian_taps(round(float(sigma), 6))
    vert = _axis0_pad(plane, taps)
    return _axis0_pad(vert.T, taps).T


# --- resample variants (one plane, full two-pass) ---
def res_current(plane, out_size, filt):
    return resample_plane(plane, out_size, filt)


def _apply_axis0_fori(plane, lefts, weights, in_len):
    """Force the fori_loop path regardless of tap count."""
    out_len, taps = weights.shape
    lefts_j = jnp.asarray(lefts)
    weights_j = jnp.asarray(weights)

    def tap_contrib(t):
        idx = jnp.clip(lefts_j + t, 0, in_len - 1)
        rows = plane[idx, :]
        w = jax.lax.dynamic_slice_in_dim(weights_j, t, 1, axis=1)
        return jnp.where(w == 0.0, jnp.float32(0.0), rows * w)

    def body(t, acc):
        return acc + tap_contrib(t)

    acc = jax.lax.fori_loop(
        0, taps, body, jnp.zeros((out_len, plane.shape[1]), jnp.float32)
    )
    return jnp.clip(acc, 0.0, 1.0)


def _apply_axis0_take(plane, lefts, weights, in_len):
    """Unrolled like production, but jnp.take instead of fancy indexing."""
    out_len, taps = weights.shape
    weights_j = jnp.asarray(weights)
    acc = jnp.zeros((out_len, plane.shape[1]), jnp.float32)
    for t in range(taps):
        idx = np.minimum(lefts + t, in_len - 1)
        rows = jnp.take(plane, jnp.asarray(idx), axis=0)
        w = weights_j[:, t][:, None]
        acc = acc + jnp.where(w == 0.0, jnp.float32(0.0), rows * w)
    return jnp.clip(acc, 0.0, 1.0)


def _two_pass(apply, plane, out_size, filt):
    in_h, in_w = plane.shape
    lefts_v, weights_v = resample_weights(in_h, out_size.height, filt)
    tmp = apply(plane, lefts_v, weights_v, in_h)
    lefts_h, weights_h = resample_weights(in_w, out_size.width, filt)
    return apply(tmp.T, lefts_h, weights_h, in_w).T


def main() -> None:
    assert jax.default_backend() == "tpu"
    for size in SIZES:
        p1 = device_random((size, size), seed=1)
        if WHICH in ("all", "blur"):
            for sigma in (1.0, 5.0):
                for name, fn in (("roll", blur_roll), ("pad", blur_pad)):
                    body = (lambda f, s: lambda c, ps: (f(ps[0] + c, s),))(fn, sigma)
                    sec, ok = ScanBench(body, (p1,), n1=8, n2=32, base=0.25).run(repeats=3)
                    print(
                        f"blur s{sigma:.0f} {size}: {name} {sec*1e3:.4f} ms "
                        f"({4*size*size*4/sec/1e9:.0f} GB/s), distinct={ok}",
                        flush=True,
                    )
        if WHICH in ("all", "resample"):
            for filt, fname in ((ResizeFilter.TRIANGLE, "tri"), (ResizeFilter.LANCZOS3, "lcz")):
                for scale, sname in ((0.5, "dn2x"), (2.0, "up2x")):
                    out = Size(int(size * scale), int(size * scale))
                    variants = (
                        ("cur", lambda p, o=out, f=filt: res_current(p, o, f)),
                        ("fori", lambda p, o=out, f=filt: _two_pass(_apply_axis0_fori, p, o, f)),
                        ("take", lambda p, o=out, f=filt: _two_pass(_apply_axis0_take, p, o, f)),
                    )
                    for name, fn in variants:
                        body = (lambda f: lambda c, ps: (f((ps[0] + c) % 1.0),))(fn)
                        sec, ok = ScanBench(body, (p1,), n1=8, n2=32, base=0.25).run(repeats=3)
                        px = out.width * out.height
                        print(
                            f"resample {fname} {sname} {size}: {name} {sec*1e3:.4f} ms "
                            f"({px/sec/1e9:.2f} Gpix/s), distinct={ok}",
                            flush=True,
                        )


if __name__ == "__main__":
    main()


# --- appended probe: transpose-free horizontal pass ---
def _apply_axis1_take(plane, lefts, weights, in_len):
    """Horizontal resample WITHOUT transposing: gather along axis 1.
    Per-element arithmetic identical to _apply_axis0 on the transpose."""
    out_len, taps = weights.shape
    weights_j = jnp.asarray(weights)
    acc = jnp.zeros((plane.shape[0], out_len), jnp.float32)
    for t in range(taps):
        idx = np.minimum(lefts + t, in_len - 1)
        cols = jnp.take(plane, jnp.asarray(idx), axis=1)
        w = weights_j[:, t][None, :]
        acc = acc + jnp.where(w == 0.0, jnp.float32(0.0), cols * w)
    return jnp.clip(acc, 0.0, 1.0)


def _two_pass_t1(plane, out_size, filt):
    in_h, in_w = plane.shape
    lefts_v, weights_v = resample_weights(in_h, out_size.height, filt)
    tmp = _apply_axis0_take(plane, lefts_v, weights_v, in_h)
    lefts_h, weights_h = resample_weights(in_w, out_size.width, filt)
    return _apply_axis1_take(tmp, lefts_h, weights_h, in_w)


def main2():
    assert jax.default_backend() == "tpu"
    for size in SIZES:
        p1 = device_random((size, size), seed=1)
        for filt, fname in ((ResizeFilter.TRIANGLE, "tri"), (ResizeFilter.LANCZOS3, "lcz")):
            for scale, sname in ((0.5, "dn2x"), (2.0, "up2x")):
                out = Size(int(size * scale), int(size * scale))
                for name, fn in (
                    ("cur", lambda p, o=out, f=filt: res_current(p, o, f)),
                    ("t1 ", lambda p, o=out, f=filt: _two_pass_t1(p, o, f)),
                ):
                    body = (lambda f: lambda c, ps: (f((ps[0] + c) % 1.0),))(fn)
                    sec, ok = ScanBench(body, (p1,), n1=8, n2=32, base=0.25).run(repeats=3)
                    px = out.width * out.height
                    print(f"resample {fname} {sname} {size}: {name} {sec*1e3:.4f} ms ({px/sec/1e9:.2f} Gpix/s), distinct={ok}", flush=True)
        # bit-equality of the t1 form
        for filt in (ResizeFilter.TRIANGLE, ResizeFilter.LANCZOS3):
            for scale in (0.5, 2.0):
                out = Size(int(size * scale), int(size * scale))
                a = jax.jit(lambda x, o=out, f=filt: res_current(x, o, f))(p1)
                b = jax.jit(lambda x, o=out, f=filt: _two_pass_t1(x, o, f))(p1)
                print(f"  bit-equal {filt} x{scale} {size}: {np.array_equal(np.asarray(a), np.asarray(b))}", flush=True)
