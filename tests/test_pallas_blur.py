"""Pallas blur kernel parity (interpret mode on CPU).

The kernel replays `blur._blur_axis0`'s arithmetic exactly; on the real
chip it is 7-10× faster than the XLA lowering and bit-identical
(`scripts/tpu_parity.py`). Here interpret mode checks bit-equality across
chunk boundaries, wrap halos, odd heights, and radius > height."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from kanter_core_tpu.ops.blur import _blur_axis0, blur_plane, gaussian_taps
from kanter_core_tpu.ops.pallas_blur import _blur_pallas_wrapped, blur_pallas


def _jnp_blur(p, sigma):
    taps = gaussian_taps(round(float(sigma), 6))
    vert = _blur_axis0(p, taps)
    return _blur_axis0(vert.T, taps).T


@pytest.mark.parametrize(
    "h,w,sigma",
    [
        (96, 128, 1.0),
        (50, 128, 2.2),
        (200, 256, 5.0),
        (7, 128, 1.0),  # height < one chunk
        (64, 128, 20.0),  # radius (60) ≈ height: halo wraps more than once
        (24, 128, 15.0),  # radius (45) > height
    ],
)
def test_blur_pallas_matches_jnp(h, w, sigma):
    rng = np.random.default_rng(hash((h, w, int(sigma * 10))) % 2**32)
    p = rng.random((h, w), dtype=np.float32)
    ref = jax.jit(lambda x: _jnp_blur(x, sigma))(p)
    got = blur_pallas(p, gaussian_taps(sigma), chunk_rows=16, interpret=True)
    assert np.array_equal(np.asarray(ref), np.asarray(got))


def test_blur_pallas_chunk_size_invariance():
    rng = np.random.default_rng(3)
    p = rng.random((120, 256), dtype=np.float32)
    taps = gaussian_taps(2.0)
    ref = np.asarray(blur_pallas(p, taps, chunk_rows=8, interpret=True))
    for chunk in (24, 64, 120):
        got = np.asarray(blur_pallas(p, taps, chunk_rows=chunk, interpret=True))
        assert np.array_equal(ref, got), f"chunk_rows={chunk}"


def test_blur_pallas_wrapper_vmaps():
    """The custom_vmap wrapper lax.maps the rank-2 kernel; batched results
    must equal per-plane calls bit-for-bit."""
    taps = tuple(float(w) for w in gaussian_taps(1.5))
    rng = np.random.default_rng(7)
    batch = rng.random((3, 40, 128), dtype=np.float32)
    fn = _blur_pallas_wrapped(taps)
    got = np.asarray(jax.jit(jax.vmap(fn))(batch))
    ref = np.stack([np.asarray(fn(b)) for b in batch])
    assert np.array_equal(got.view(np.uint32), ref.view(np.uint32))


def test_blur_pallas_custom_vjp_matches_jnp_grad():
    """The wrapper's backward (jnp re-trace) must agree with differentiating
    the jnp path directly."""
    taps = tuple(float(w) for w in gaussian_taps(1.0))
    rng = np.random.default_rng(9)
    p = rng.random((32, 128), dtype=np.float32)

    g_pal = jax.grad(lambda x: jnp.sum(_blur_pallas_wrapped(taps)(x)) ** 2)(p)
    g_ref = jax.grad(lambda x: jnp.sum(_jnp_blur(x, 1.0)) ** 2)(p)
    np.testing.assert_array_equal(np.asarray(g_ref), np.asarray(g_pal))


def test_blur_plane_dispatch_is_jnp_on_cpu():
    """On the CPU backend blur_plane must keep the plain jnp lowering (the
    Pallas gate is TPU-only); golden bit-exactness depends on it."""
    rng = np.random.default_rng(11)
    p = rng.random((33, 100), dtype=np.float32)  # unaligned width too
    a = np.asarray(jax.jit(lambda x: blur_plane(x, 2.2))(p))
    b = np.asarray(jax.jit(lambda x: _jnp_blur(x, 2.2))(p))
    assert np.array_equal(a, b)
