"""Pallas kernel parity tests (interpret mode on CPU)."""

import numpy as np
import jax

from kanter_core_tpu.ops.height_to_normal import _h2n_jnp
from kanter_core_tpu.ops.pallas_kernels import height_to_normal_pallas


def test_h2n_pallas_matches_jnp():
    rng = np.random.default_rng(1)
    h = rng.random((96, 128), dtype=np.float32)
    ref = jax.jit(_h2n_jnp)(h)
    out = height_to_normal_pallas(h, tile_rows=32, interpret=True)
    for i in range(4):
        assert np.array_equal(np.asarray(ref[i]), np.asarray(out[i])), f"plane {i}"


def test_h2n_pallas_uneven_tiles():
    rng = np.random.default_rng(2)
    h = rng.random((50, 128), dtype=np.float32)  # 50 not divisible by 32
    ref = jax.jit(_h2n_jnp)(h)
    out = height_to_normal_pallas(h, tile_rows=32, interpret=True)
    for i in range(3):
        assert np.array_equal(np.asarray(ref[i]), np.asarray(out[i])), f"plane {i}"


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


def test_pallas_vjp_wrapper_vmaps():
    """vmap over the custom_vmap/custom_vjp-wrapped Pallas kernel must work
    (Mosaic rejects batched ANY-space block specs; the rule lax.maps the
    rank-2 kernel) and stay bit-identical to the vmapped jnp path."""
    import jax

    from kanter_core_tpu.ops.height_to_normal import _h2n_jnp, _h2n_pallas_vjp

    rng = np.random.default_rng(11)
    hb = rng.random((3, 64, 128), dtype=np.float32)
    got = np.stack([np.asarray(p) for p in jax.jit(jax.vmap(_h2n_pallas_vjp()))(hb)])
    ref = np.stack([np.asarray(p) for p in jax.jit(jax.vmap(_h2n_jnp))(hb)])
    assert np.array_equal(got.view(np.uint32), ref.view(np.uint32))
