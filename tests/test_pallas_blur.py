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
    # EAGER reference: jitting the whole 2·(2r+1)-tap roll chain trips
    # XLA:CPU's compile-time blowup on many-tap shifted sums (146 s at
    # σ=20 on a 1-core host — past the 120 s deadlock watchdog). Eager is
    # bit-identical to the jitted lowering here (verified: no constants to
    # fold, and nc_mul already forces separately-rounded products on CPU
    # under jit and eager alike); eager==jit parity for jit-sized σ stays
    # pinned by test_blur.py's fuzz rows and the chip battery.
    ref = _jnp_blur(p, sigma)
    got = blur_pallas(p, gaussian_taps(sigma), chunk_rows=16, interpret=True)
    assert np.array_equal(np.asarray(ref), np.asarray(got))


def test_blur_pallas_halo_kernel_selected_and_matches_padded():
    """The in-kernel-DMA halo kernel (no XLA-materialized padded copy) is
    chosen for viable geometries — including the flagship 4096² one — and
    is bit-identical to the padded-copy kernel it replaces; unviable
    geometries still report 0 and fall back."""
    from kanter_core_tpu.ops.pallas_blur import _blur_kernel, _pick_halo_chunk

    assert _pick_halo_chunk(4096, 4096, 7, 64) == 32  # sigma=1 flagship (measured-best cap)
    assert _pick_halo_chunk(4096, 4096, 31, 48) == 32  # sigma=5: target max(32, rp 16)
    assert _pick_halo_chunk(50, 128, 7, 16) == 0  # height not 8-aligned
    assert _pick_halo_chunk(24, 128, 91, 16) == 0  # rp 48 > height: no c >= rp
    assert _pick_halo_chunk(64, 128, 1, 16) == 0  # radius 0: no strips

    rng = np.random.default_rng(21)
    p = rng.random((96, 128), dtype=np.float32)
    taps = tuple(float(w) for w in gaussian_taps(2.2))
    got = np.asarray(blur_pallas(p, taps, chunk_rows=16, interpret=True))
    ref = np.asarray(_blur_kernel(96, 128, taps, 16, True)(p))
    assert np.array_equal(got.view(np.uint32), ref.view(np.uint32))


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


def _mesh(n):
    from jax.sharding import Mesh

    return Mesh(np.asarray(jax.devices()[:n]), ("rows",))


@pytest.mark.parametrize("n,h,w,sigma", [
    (8, 256, 128, 1.0),
    (8, 64, 256, 2.2),   # block_h 8 == rp: minimum viable block
    (4, 96, 128, 5.0),
    (1, 96, 128, 2.2),   # single-device mesh (the real-chip battery case)
])
def test_blur_pallas_sharded_matches_jnp(n, h, w, sigma):
    """The shard_map'd kernel (ring ppermute halo exchange + per-shard Mosaic
    kernel) is bit-identical to the jnp wrap formulation — the mesh analog of
    `height_to_normal.rs:55-56`'s toroidal sampling."""
    from kanter_core_tpu.ops.pallas_blur import _blur_pallas_sharded, fits_sharded

    taps = gaussian_taps(round(float(sigma), 6))
    assert fits_sharded(h, w, len(taps), n)
    rng = np.random.default_rng(hash((n, h, w)) % 2**32)
    p = rng.random((h, w), dtype=np.float32)
    ref = np.asarray(jax.jit(lambda x: _jnp_blur(x, sigma))(p))
    got = np.asarray(
        jax.jit(_blur_pallas_sharded(tuple(float(x) for x in taps), _mesh(n), True))(p)
    )
    assert np.array_equal(ref.view(np.uint32), got.view(np.uint32))


def test_blur_pallas_sharded_gates():
    """Geometries the sharded kernel cannot serve fall back to jnp: rows not
    divisible by the mesh, blocks smaller than the halo, unaligned widths."""
    from kanter_core_tpu.ops.pallas_blur import fits_sharded

    assert not fits_sharded(100, 128, 7, 8)  # 100 % 8 != 0
    assert not fits_sharded(64, 128, 31, 8)  # block 8 < radius 15
    assert not fits_sharded(256, 100, 7, 8)  # width not lane-aligned
    assert fits_sharded(256, 128, 7, 8)


def test_blur_plane_sharded_dispatch_and_grad(monkeypatch):
    """blur_plane(mesh=…) + FORCE_PALLAS_INTERPRET routes through the
    shard_map'd kernel (asserted via the trace hook) and its custom_vjp
    backward agrees with differentiating the jnp path."""
    from kanter_core_tpu.ops import blur as blur_mod
    from kanter_core_tpu.ops import pallas_blur

    monkeypatch.setattr(blur_mod, "FORCE_PALLAS_INTERPRET", True)
    calls = []
    real = pallas_blur._blur_block

    def counting(*a, **k):
        calls.append(1)
        return real(*a, **k)

    monkeypatch.setattr(pallas_blur, "_blur_block", counting)
    mesh = _mesh(8)
    rng = np.random.default_rng(13)
    p = rng.random((64, 128), dtype=np.float32)
    got = np.asarray(jax.jit(lambda x: blur_plane(x, 1.7, mesh=mesh))(p))
    ref = np.asarray(jax.jit(lambda x: _jnp_blur(x, 1.7))(p))
    assert calls, "sharded Pallas path was not traced"
    assert np.array_equal(got, ref)

    g_pal = jax.grad(lambda x: jnp.sum(blur_plane(x, 1.7, mesh=mesh)) ** 2)(p)
    g_ref = jax.grad(lambda x: jnp.sum(_jnp_blur(x, 1.7)) ** 2)(p)
    np.testing.assert_array_equal(np.asarray(g_ref), np.asarray(g_pal))


def test_batched_graph_mesh_keeps_sharded_pallas(monkeypatch):
    """A BatchedGraph over a batch×rows mesh now keeps the Pallas blur: the
    shard_map'd kernel shards over the ROWS axis and composes with the
    batch vmap, bit-identically to the jnp lowering (previously any mesh
    forced pallas_ok=False for the whole program)."""
    from jax.sharding import Mesh

    from kanter_core_tpu import Node, NodeGraph, NodeType, SlotId
    from kanter_core_tpu.ops import blur as blur_mod
    from kanter_core_tpu.ops import pallas_blur
    from kanter_core_tpu.parallel import BatchedGraph

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")

    monkeypatch.setattr(blur_mod, "FORCE_PALLAS_INTERPRET", True)
    calls = []
    real = pallas_blur._blur_block

    def counting(*a, **k):
        calls.append(1)
        return real(*a, **k)

    monkeypatch.setattr(pallas_blur, "_blur_block", counting)

    graph = NodeGraph()
    gin = graph.add_node(Node(NodeType.InputGray("in")))
    bl = graph.add_node(Node(NodeType.Blur(1.5)))
    out = graph.add_node(Node(NodeType.OutputGray("out")))
    graph.connect(gin, bl, SlotId(0), SlotId(0))
    graph.connect(bl, out, SlotId(0), SlotId(0))

    mesh = Mesh(np.asarray(jax.devices()[:8]).reshape(2, 4), ("batch", "rows"))
    key = f"input_{int(gin)}"
    bg = BatchedGraph(graph, batch_keys={key}, targets=[(out, SlotId(0))], mesh=mesh)
    batch = np.random.default_rng(3).random((4, 64, 128), dtype=np.float32)
    result = bg(**{key: (bg.shard_batch_arg(batch),)})
    got = np.asarray(result[(out, SlotId(0))][0])
    assert calls, "sharded Pallas path was not traced under the batch mesh"
    ref = np.stack([np.asarray(jax.jit(lambda x: _jnp_blur(x, 1.5))(b)) for b in batch])
    assert np.array_equal(got, ref)


def test_blur_plane_dispatch_is_jnp_on_cpu():
    """On the CPU backend blur_plane must keep the plain jnp lowering (the
    Pallas gate is TPU-only); golden bit-exactness depends on it."""
    rng = np.random.default_rng(11)
    p = rng.random((33, 100), dtype=np.float32)  # unaligned width too
    a = np.asarray(jax.jit(lambda x: blur_plane(x, 2.2))(p))
    b = np.asarray(jax.jit(lambda x: _jnp_blur(x, 2.2))(p))
    assert np.array_equal(a, b)
