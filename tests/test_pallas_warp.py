"""Pallas warp kernel parity (interpret mode on CPU).

The kernel replays `warp_planes`' coordinate and lerp arithmetic exactly
and selects the gathered texels through the dilated staircase pair table
(`ops/pallas_warp.py`); on the real chip it replaces XLA's element-gather
lowering (580 ms → a few ms at 4096², chip bit-diffs 0/16.7M). Here
interpret mode checks bit-equality across chunk boundaries, wrap halos,
degenerate/out-of-range strengths, and the dispatch plumbing."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from kanter_core_tpu.ops import warp as warp_mod
from kanter_core_tpu.ops.pallas_warp import (
    fits_kernel,
    pairs_cap,
    warp_pairs,
    warp_pallas,
)
from kanter_core_tpu.ops.warp import warp_bindings, warp_halo, warp_planes


def _ref(p, s, k, h, w):
    rows = np.arange(h, dtype=np.int32)
    cols = np.arange(w, dtype=np.int32)
    return warp_planes((p,), s, rows, cols, k, h, w)[0]


@pytest.mark.parametrize(
    "h,w,angle,intensity",
    [
        (96, 128, 57.0, 6.0),
        (64, 256, 0.0, 16.0),     # axis-aligned, the node's default
        (40, 128, 313.0, 2.0),    # h not chunk-aligned
        (64, 128, 90.0, 14.0),
        (64, 256, 45.0, 0.0),     # zero displacement
        (128, 384, 213.0, 30.0),  # negative-quadrant k, big halo
        (16, 128, 180.0, 3.0),    # small canvas at the height >= rp edge
    ],
)
def test_warp_pallas_matches_gather(h, w, angle, intensity):
    rng = np.random.default_rng(hash((h, w, int(angle), int(intensity))) % 2**32)
    p = jnp.asarray(rng.random((h, w), dtype=np.float32))
    s = rng.random((h, w), dtype=np.float32)
    # out-of-contract strengths: clamp + NaN->identity must stay bit-equal
    s[::7, ::5] = np.nan
    s[1::7, 2::5] = 3.5
    s[2::7, 3::5] = -2.0
    s = jnp.asarray(s)
    b = warp_bindings((angle, intensity))
    halo = warp_halo(intensity)
    assert fits_kernel(h, w, halo)
    pairs, npairs = warp_pairs(b["k"], halo)
    ref = _ref(p, s, b["k"], h, w)
    got = warp_pallas(p, s, jnp.asarray(b["k"]), jnp.asarray(pairs), npairs,
                      halo, interpret=True)
    assert np.array_equal(np.asarray(ref), np.asarray(got))


def test_warp_pairs_cap_holds_across_the_bucket():
    """The argument-structure invariant `warp_bindings` relies on: no
    in-bucket (intensity, angle) pair overflows the bucket's static cap —
    otherwise two same-fingerprint programs would disagree on the binding
    pytree. Sweep the worst intensities at many angles per bucket."""
    for halo, imax in ((4, 4.0), (8, 12.0), (16, 28.0), (32, 60.0)):
        for deg in np.linspace(0.0, 360.0, 181):
            for intensity in (imax, imax * 0.7, 1.0):
                b = warp_bindings((float(deg), float(intensity)))
                assert warp_halo(intensity) <= halo or intensity < imax * 0.9
                pr = warp_pairs(b["k"], halo)
                assert pr is not None, (halo, deg, intensity)
                pairs, npairs = pr
                assert pairs.shape == (pairs_cap(halo), 2)
                assert 1 <= int(npairs) <= pairs_cap(halo)
                assert int(np.abs(pairs).max()) <= halo - 1


def test_warp_bindings_carry_the_table():
    b = warp_bindings((57.0, 6.0))
    assert set(b) == {"k", "pairs", "npairs"}
    assert b["pairs"].dtype == np.int32
    nb = warp_bindings((57.0, float("inf")))
    assert set(nb) == {"k"}  # unbounded: gather-only class


def test_warp_planes_dispatches_to_pallas(monkeypatch):
    """With the interpret force-hook on, the dense full-canvas geometry
    routes through the kernel (observed via a probe) and stays bit-equal;
    banded (row_local) and runtime-extent geometries keep the gather."""
    calls = {"n": 0}
    real = warp_pallas

    def probe(*a, **kw):
        calls["n"] += 1
        return real(*a, **kw)

    import kanter_core_tpu.ops.pallas_warp as pw

    monkeypatch.setattr(pw, "warp_pallas", probe)
    pw._warp_pallas_wrapped.cache_clear()
    monkeypatch.setattr(warp_mod, "FORCE_PALLAS_INTERPRET", True)
    try:
        h, w = 48, 128
        rng = np.random.default_rng(5)
        p = jnp.asarray(rng.random((h, w), dtype=np.float32))
        s = jnp.asarray(rng.random((h, w), dtype=np.float32))
        b = warp_bindings((33.0, 5.0))
        halo = warp_halo(5.0)
        rows = np.arange(h, dtype=np.int32)
        cols = np.arange(w, dtype=np.int32)
        ref = warp_planes((p,), s, rows, cols, b["k"], h, w)
        got = warp_planes((p,), s, rows, cols, b["k"], h, w,
                          table=(b["pairs"], b["npairs"]), halo=halo)
        assert calls["n"] == 1
        assert np.array_equal(np.asarray(ref[0]), np.asarray(got[0]))
        # banded geometry: row subset + row_local -> gather, no kernel call
        band = np.arange(8, 24, dtype=np.int32)
        warp_planes((p,), s[8:24], band, cols, b["k"], h, w,
                    row_local=lambda y: y,
                    table=(b["pairs"], b["npairs"]), halo=halo)
        assert calls["n"] == 1
    finally:
        pw._warp_pallas_wrapped.cache_clear()


def test_warp_pallas_wrapper_vmaps_and_grads(monkeypatch):
    """The custom_vmap batch rule maps the rank-2 kernel; the custom_vjp
    backward re-traces the jnp gather formulation for plane, strength, and
    k cotangents (bit-comparable to differentiating the gather directly)."""
    from kanter_core_tpu.ops.pallas_warp import _warp_pallas_wrapped

    h, w = 32, 128
    rng = np.random.default_rng(7)
    p = jnp.asarray(rng.random((3, h, w), dtype=np.float32))
    s = jnp.asarray(rng.random((3, h, w), dtype=np.float32))
    b = warp_bindings((10.0, 4.0))
    halo = warp_halo(4.0)
    pairs, npairs = warp_pairs(b["k"], halo)
    fn = _warp_pallas_wrapped(halo, int(pairs.shape[0]))
    k = jnp.asarray(b["k"])
    pa = jnp.asarray(pairs)

    def run(pi, si):
        return fn(pi, si, k, pa, jnp.asarray(npairs))

    # interpret mode off-TPU: warp_pallas derives interpret from backend
    out = jax.vmap(run)(p, s)
    for i in range(3):
        assert np.array_equal(np.asarray(out[i]),
                              np.asarray(_ref(p[i], s[i], b["k"], h, w)))

    def loss(pi, si):
        return jnp.sum(run(pi, si) ** 2)

    gp, gs = jax.grad(loss, argnums=(0, 1))(p[0], s[0])

    def loss_ref(pi, si):
        return jnp.sum(_ref(pi, si, b["k"], h, w) ** 2)

    rp_, rs_ = jax.grad(loss_ref, argnums=(0, 1))(p[0], s[0])
    assert np.allclose(np.asarray(gp), np.asarray(rp_), rtol=1e-5, atol=1e-5)
    assert np.allclose(np.asarray(gs), np.asarray(rs_), rtol=1e-4, atol=1e-4)


def _mesh(n):
    from jax.sharding import Mesh

    return Mesh(np.asarray(jax.devices()[:n]), ("rows",))


@pytest.mark.parametrize("n,h,w,angle,intensity", [
    (8, 256, 128, 57.0, 6.0),
    (8, 64, 256, 213.0, 2.0),   # block_h 8 == rp: minimum viable block
    (4, 96, 128, 33.0, 14.0),
    (1, 96, 128, 57.0, 6.0),    # single-device mesh (the real-chip battery case)
])
def test_warp_pallas_sharded_matches_gather(n, h, w, angle, intensity):
    """The shard_map'd staircase kernel (ring ppermute of the ±rp strips +
    per-shard Mosaic kernel with a global row origin) is bit-identical to
    the dense jnp gather — the mesh analog of the wrap sampling, exactly
    as the sharded blur."""
    from kanter_core_tpu.ops.pallas_warp import (
        _warp_pallas_sharded,
        fits_sharded,
    )

    b = warp_bindings((angle, intensity))
    halo = warp_halo(intensity)
    assert fits_sharded(h, w, halo, n)
    pairs, npairs = warp_pairs(b["k"], halo)
    rng = np.random.default_rng(hash((n, h, w)) % 2**32)
    p = rng.random((h, w), dtype=np.float32)
    s = rng.random((h, w), dtype=np.float32) * np.float32(1.4) - np.float32(0.2)
    ref = np.asarray(_ref(jnp.asarray(p), jnp.asarray(s), b["k"], h, w))
    fn = _warp_pallas_sharded(halo, int(pairs.shape[0]), _mesh(n), True)
    got = np.asarray(jax.jit(fn)(p, s, jnp.asarray(b["k"]),
                                 jnp.asarray(pairs), jnp.asarray(npairs)))
    assert np.array_equal(ref.view(np.uint32), got.view(np.uint32))


def test_warp_pallas_sharded_gates():
    from kanter_core_tpu.ops.pallas_warp import fits_sharded

    assert not fits_sharded(100, 128, 8, 8)   # 100 % 8 != 0
    assert not fits_sharded(64, 128, 16, 8)   # block 8 < rp 16
    assert not fits_sharded(256, 100, 8, 8)   # width not lane-aligned
    assert not fits_sharded(256, 128, None, 8)  # unbounded intensity
    assert fits_sharded(256, 128, 8, 8)


def test_warp_planes_mesh_dispatches_to_sharded_kernel(monkeypatch):
    """warp_planes_mesh(table=…) + FORCE_PALLAS_INTERPRET routes through
    the shard_map'd kernel (asserted via a trace hook), stays bit-equal to
    the gather mesh path AND the dense path, and its custom_vjp backward
    agrees with differentiating the gather."""
    from kanter_core_tpu.ops import pallas_warp as pw
    from kanter_core_tpu.ops.warp import warp_planes_mesh

    monkeypatch.setattr(warp_mod, "FORCE_PALLAS_INTERPRET", True)
    calls = []
    real = pw._warp_block

    def counting(*a, **k):
        calls.append(1)
        return real(*a, **k)

    monkeypatch.setattr(pw, "_warp_block", counting)
    pw._warp_pallas_sharded.cache_clear()
    try:
        mesh = _mesh(8)
        h, w = 64, 128
        rng = np.random.default_rng(17)
        p = rng.random((h, w), dtype=np.float32)
        s = rng.random((h, w), dtype=np.float32)
        b = warp_bindings((57.0, 6.0))
        halo = warp_halo(6.0)
        got, = jax.jit(lambda pp, ss, kk: warp_planes_mesh(
            (pp,), ss, kk, mesh, "rows", halo, h, w,
            table=(b["pairs"], b["npairs"]),
        ))(p, s, b["k"])
        assert calls, "sharded Pallas path was not traced"
        ref = _ref(jnp.asarray(p), jnp.asarray(s), b["k"], h, w)
        gather_mesh, = jax.jit(lambda pp, ss, kk: warp_planes_mesh(
            (pp,), ss, kk, mesh, "rows", halo, h, w,
        ))(p, s, b["k"])
        assert np.array_equal(np.asarray(ref), np.asarray(got))
        assert np.array_equal(np.asarray(gather_mesh), np.asarray(got))

        k = jnp.asarray(b["k"])

        def loss_pal(pp, ss):
            return jnp.sum(warp_planes_mesh(
                (pp,), ss, k, mesh, "rows", halo, h, w,
                table=(b["pairs"], b["npairs"]),
            )[0] ** 2)

        def loss_ref(pp, ss):
            return jnp.sum(_ref(pp, ss, k, h, w) ** 2)

        gp, gs = jax.grad(loss_pal, argnums=(0, 1))(jnp.asarray(p), jnp.asarray(s))
        rp_, rs_ = jax.grad(loss_ref, argnums=(0, 1))(jnp.asarray(p), jnp.asarray(s))
        # allclose, not bit-equal: the sharded cotangent changes how GSPMD
        # partitions the gather-backward's scatter-adds, reordering the f32
        # accumulation at pixels whose taps collide (grads are not part of
        # the bit contract — same tolerance as the dense grad test above)
        assert np.allclose(np.asarray(rp_), np.asarray(gp), rtol=1e-5, atol=1e-5)
        assert np.allclose(np.asarray(rs_), np.asarray(gs), rtol=1e-4, atol=1e-4)
    finally:
        pw._warp_pallas_sharded.cache_clear()


def test_fits_kernel_gates():
    assert fits_kernel(4096, 4096, 16)
    assert not fits_kernel(4096, 4096, None)  # unbounded intensity
    assert not fits_kernel(4096, 100, 16)     # lane-unaligned width
    assert not fits_kernel(8, 128, 16)        # height < aligned halo
    assert not fits_kernel(4096, 2_000_000, 4)  # VMEM budget
