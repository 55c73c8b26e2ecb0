"""Mosaic JFA step kernel (`ops/pallas_distance`) — interpret-mode bit
parity vs the jnp roll ladder, geometry gates, and composition.

The kernel's contract is BIT-IDENTITY to `distance_plane`'s jnp
formulation (integer fold, same candidate order, same ties); interpret
mode runs as XLA:CPU, so these tests prove the fold/DMA bookkeeping —
the chip battery's `distance_jfa` row proves the Mosaic lowering."""

import numpy as np
import pytest

import jax

from kanter_core_tpu.ops import pallas_distance
from kanter_core_tpu.ops.distance import _jfa_steps, distance_plane


def _mask(h, w, seed=0, density=0.02):
    rng = np.random.default_rng(seed)
    return (rng.random((h, w)) < density).astype(np.float32)


def _both(mask, max_dist=23.0):
    """(kernel-path, jnp-path) fades for one mask."""
    md = np.float32(max_dist)
    pallas_distance.FORCE_PALLAS_INTERPRET = True
    try:
        assert pallas_distance.fits_kernel(*mask.shape)
        k = np.asarray(
            jax.jit(lambda m, d: distance_plane(m, d, pallas_ok=True))(mask, md)
        )
    finally:
        pallas_distance.FORCE_PALLAS_INTERPRET = False
    j = np.asarray(
        jax.jit(lambda m, d: distance_plane(m, d, pallas_ok=False))(mask, md)
    )
    return k, j


@pytest.mark.parametrize("shape,seed", [
    ((64, 128), 1),    # square-ish power of two
    ((256, 128), 2),   # k ladder reaches 128 ≥ H/2 (big far steps)
    ((32, 128), 3),    # minimum height (chunk halves to keep n >= 2)
    ((40, 256), 4),    # H not a power of two (k > H wrap-degenerate steps)
    ((64, 384), 5),    # W not a power of two (ox % W degenerate rolls)
])
def test_kernel_matches_jnp_bitwise(shape, seed):
    mask = _mask(*shape, seed=seed)
    k, j = _both(mask)
    assert np.array_equal(k, j), (
        f"{shape}: {int((k != j).sum())}/{k.size} pixels differ"
    )


def test_kernel_matches_jnp_degenerate_masks():
    # all-seed and seedless planes (the sentinel path end to end)
    for mask in (np.ones((32, 128), np.float32),
                 np.zeros((32, 128), np.float32)):
        k, j = _both(mask)
        assert np.array_equal(k, j)


def test_kernel_dense_seeds_tie_storm():
    """50% density maximizes equal-d² ties — the strict-< first-seen
    fold order must agree exactly."""
    k, j = _both(_mask(48, 128, seed=9, density=0.5))
    assert np.array_equal(k, j)


def test_fits_kernel_gates():
    assert pallas_distance.fits_kernel(64, 128)
    assert not pallas_distance.fits_kernel(60, 128)   # H % 8
    assert not pallas_distance.fits_kernel(24, 128)   # below minimum height
    assert not pallas_distance.fits_kernel(64, 96)    # W % 128
    # ungated geometries silently use the jnp ladder (no error)
    out = np.asarray(jax.jit(
        lambda m, d: distance_plane(m, d, pallas_ok=True)
    )(_mask(33, 41, seed=7), np.float32(7.0)))
    ref = np.asarray(jax.jit(
        lambda m, d: distance_plane(m, d, pallas_ok=False)
    )(_mask(33, 41, seed=7), np.float32(7.0)))
    assert np.array_equal(out, ref)


def test_kernel_vmap_composition():
    """BatchedGraph vmaps whole programs; the custom_vmap rule lax.maps
    the rank-2 kernel — stacked results must equal per-plane calls."""
    masks = np.stack([_mask(32, 128, seed=s) for s in range(3)])
    md = np.float32(11.0)
    pallas_distance.FORCE_PALLAS_INTERPRET = True
    try:
        batched = np.asarray(jax.jit(jax.vmap(
            lambda m: distance_plane(m, md, pallas_ok=True)
        ))(masks))
    finally:
        pallas_distance.FORCE_PALLAS_INTERPRET = False
    for i in range(3):
        single = np.asarray(jax.jit(
            lambda m: distance_plane(m, md, pallas_ok=False)
        )(masks[i]))
        assert np.array_equal(batched[i], single), i


def test_engine_forced_interpret_matches_dense():
    """The fused engine path with the kernel forced (interpret) must be
    bit-identical to the plain engine — the dryrun-style composition
    check at the product level."""
    from conftest import render_u8

    from kanter_core_tpu import Node, NodeGraph, NodeType, SlotId, TextureProcessor

    def build():
        g = NodeGraph()
        pat = g.add_node(Node(NodeType.Pattern(
            128, 64, "Checker", cells_x=4, cells_y=2,
            mortar=0.3, bevel=0.0, seed=2,
        )))
        ds = g.add_node(Node(NodeType.Distance(9.0)))
        out = g.add_node(Node(NodeType.OutputGray("out")))
        g.connect(pat, ds, SlotId(0), SlotId(0))
        g.connect(ds, out, SlotId(0), SlotId(0))
        return g, out

    px = {}
    for mode in ("kernel", "jnp"):
        pallas_distance.FORCE_PALLAS_INTERPRET = mode == "kernel"
        try:
            tp = TextureProcessor(10_000_000)
            try:
                lg = tp.new_live_graph()
                g, out = build()
                with lg.write() as gg:
                    gg.set_node_graph(g)
                px[mode] = render_u8(lg, out)
            finally:
                tp.shutdown_now()
        finally:
            pallas_distance.FORCE_PALLAS_INTERPRET = False
    assert np.array_equal(px["kernel"], px["jnp"])
