"""Native C++ host-kernel tests (with pure-Python fallback parity)."""

import numpy as np

from kanter_core_tpu import native


def test_native_builds():
    # The environment has g++; the library must build and load.
    assert native.available()


def test_salted_hash_properties():
    rng = np.random.default_rng(0)
    data = rng.random((256, 256)).astype(np.float32)
    h1 = native.salted_hash64(data, 12345)
    h2 = native.salted_hash64(data, 12345)
    h3 = native.salted_hash64(data, 54321)
    assert h1 == h2
    assert h1 != h3
    mutated = data.copy()
    mutated[13, 37] += 1e-3
    assert native.salted_hash64(mutated, 12345) != h1
    # bytes input path agrees with ndarray path
    assert native.salted_hash64(data.tobytes(), 12345) == h1


def test_pack_rgba_matches_python_semantics():
    rng = np.random.default_rng(1)
    planes = [(rng.standard_normal((33, 47)) * 2).astype(np.float32) for _ in range(4)]
    planes[0][0, 0] = np.nan
    planes[1][0, 0] = np.inf
    planes[2][0, 0] = -np.inf
    out = native.pack_rgba_u8(*planes)
    ref = native._pack_rgba_py(*planes)
    assert np.array_equal(out, ref)


def test_pack_gray_matches_slot_image():
    from kanter_core_tpu.slot_image import SlotImage

    rng = np.random.default_rng(2)
    plane = (rng.standard_normal((16, 16)) * 2).astype(np.float32)
    ref = SlotImage.Gray(plane.copy()).to_u8()
    out = native.pack_gray_u8(plane)
    assert np.array_equal(out, ref)


def test_planes_from_u8_matches_deconstruct():
    from kanter_core_tpu.ops.image_io import deconstruct_image

    rng = np.random.default_rng(3)
    for channels in (1, 2, 3, 4):
        pixels = rng.integers(0, 256, size=(9, 7, channels), dtype=np.uint8)
        ref = deconstruct_image(pixels)
        out = native.planes_from_u8(pixels)
        for c in range(4):
            assert np.array_equal(ref[c], out[c]), channels


def test_spill_roundtrip_uses_native_hash(tmp_path, monkeypatch):
    from kanter_core_tpu import transient_buffer as tb
    from kanter_core_tpu.transient_buffer import PlaneBuffer

    calls = []
    real = tb._hash_plane

    def counting(salt, raw):
        calls.append(1)
        return real(salt, raw)

    monkeypatch.setattr(tb, "_hash_plane", counting)
    data = np.random.default_rng(4).random((64, 64)).astype(np.float32)
    buf = PlaneBuffer(host=data.copy())
    assert buf.spill_to_storage()
    assert len(calls) == 1, "spill did not go through the salted hash"
    assert np.array_equal(buf.host_data(), data)
    assert len(calls) == 2, "reload did not re-verify the salted hash"


def test_to_u8_host_tier_uses_native_and_matches_device_path():
    """A SlotImage whose planes are all host/storage-tier exports via the
    native host pack, byte-identical to the device (u32) converter path."""
    from kanter_core_tpu.slot_image import SlotImage
    from kanter_core_tpu.transient_buffer import Tier, plane_from_device, plane_from_host

    import jax.numpy as jnp

    rng = np.random.default_rng(7)
    planes = [rng.random((40, 56), dtype=np.float32) for _ in range(4)]
    planes[0][0, 0] = np.nan

    host_img = SlotImage([plane_from_host(p.copy()) for p in planes])
    assert all(p.tier != Tier.DEVICE for p in host_img.planes)
    dev_img = SlotImage([plane_from_device(jnp.asarray(p)) for p in planes])
    assert np.array_equal(host_img.to_u8(), dev_img.to_u8())

    gray_host = SlotImage([plane_from_host(planes[1].copy())])
    gray_dev = SlotImage([plane_from_device(jnp.asarray(planes[1]))])
    assert np.array_equal(gray_host.to_u8(), gray_dev.to_u8())
