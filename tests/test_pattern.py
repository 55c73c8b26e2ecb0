"""Pattern node (extension): checker/brick/stripe tiling-mask semantics,
per-cell ID output, parameter-as-argument caching, and four-consumer
lockstep parity (also fuzz-covered via the shared generator in
test_fuzz_equivalence)."""

import numpy as np
import pytest

from conftest import render_u8

from kanter_core_tpu import (
    MixType,
    Node,
    NodeGraph,
    NodeType,
    PatternKind,
    SlotId,
    TextureProcessor,
)
from kanter_core_tpu.compiler import CompiledGraph, graph_fingerprint
from kanter_core_tpu.errors import TexProError
from kanter_core_tpu.ids import NodeId

DEFAULT = dict(pattern="Checker", cells_x=4, cells_y=4, mortar=0.1,
               bevel=0.05, seed=7)


def _build(width=96, height=64, slot=0, **kw):
    params = dict(DEFAULT, **kw)
    g = NodeGraph()
    pt = g.add_node(Node(NodeType.Pattern(width, height, **params)))
    out = g.add_node(Node(NodeType.OutputGray("out")))
    g.connect(pt, out, SlotId(slot), SlotId(0))
    return g, pt, out


def _planes(width=96, height=64, **kw):
    from kanter_core_tpu.ops.pattern import _kernel, pattern_bindings

    params = dict(DEFAULT, **kw)
    payload = NodeType.Pattern(width, height, **params).payload
    b = pattern_bindings(payload)
    mask, cells = _kernel(payload[2])(
        b["rows"], b["cols"], b["fx"], b["fy"], b["px"], b["py"],
        b["mortar"], b["bevel"], b["seed"],
    )
    return np.asarray(mask), np.asarray(cells)


def test_checker_parity_no_groove():
    """With mortar=bevel=0 the Checker mask is the exact 0/1 cell parity."""
    mask, cells = _planes(64, 64, cells_x=4, cells_y=4, mortar=0.0, bevel=0.0)
    assert mask.shape == (64, 64)
    assert set(np.unique(mask)) == {0.0, 1.0}
    # 16 px/cell: parity flips across every cell boundary, both axes
    assert np.array_equal(mask[:, :16], 1.0 - mask[:, 16:32])
    assert np.array_equal(mask[:16, :], 1.0 - mask[16:32, :])
    # exactly half the pixels are 1 (even cell counts)
    assert mask.sum() == 64 * 64 / 2
    # per-cell IDs are constant within a cell and distinct across the sheet
    assert cells.shape == (64, 64)
    first = cells[:16, :16]
    assert np.all(first == first[0, 0])
    assert len(np.unique(cells)) == 16


def test_stripe_ignores_rows():
    mask, _ = _planes(64, 48, pattern="Stripe", cells_x=4, mortar=0.0,
                      bevel=0.0)
    assert np.all(mask == mask[0:1, :])  # every row identical
    assert set(np.unique(mask)) == {0.0, 1.0}


def test_brick_running_bond_and_groove():
    """Odd brick rows shift half a cell; the groove field is 0 at cell
    boundaries and 1 deep inside bricks."""
    mask, cells = _planes(80, 80, pattern="Brick", cells_x=4, cells_y=4,
                          mortar=0.2, bevel=0.0)
    # 20 px/cell: row band 0 spans rows 0..19, band 1 spans 20..39; the
    # odd band's column phase is shifted by half a cell (10 px). Hard-step
    # mask (bevel=0): thresholds sit mid-pixel, so the half-cell roll is
    # exact even though fx=0.05 is inexact (the lattice offset error is
    # ~1e-8 against a 0.025 threshold margin)
    assert np.array_equal(mask[5, :], np.roll(mask[25, :], 10))
    assert mask.min() == 0.0 and mask.max() == 1.0
    # beveled variant stays finite and inside [0, 1]
    soft, _ = _planes(80, 80, pattern="Brick", cells_x=4, cells_y=4,
                      mortar=0.2, bevel=0.1)
    assert np.all(np.isfinite(soft))
    assert soft.min() == 0.0 and soft.max() == 1.0
    assert len(np.unique(soft)) > 2  # the ramp actually ramps
    # per-cell IDs shift with the bond too (cells differ between bands)
    assert not np.array_equal(cells[5, :], cells[25, :])


def test_pattern_tiles_seamlessly():
    """The lattice wraps toroidally: the sheet's right/bottom edges continue
    the left/top cells (cell indices wrap mod cells_x/cells_y), all kinds."""
    for kind in ("Checker", "Brick", "Stripe"):
        mask, cells = _planes(64, 64, pattern=kind, cells_x=4, cells_y=4,
                              mortar=0.0, bevel=0.0)
        two, cells2 = _planes(128, 128, pattern=kind, cells_x=8, cells_y=8,
                              mortar=0.0, bevel=0.0)
        # doubling size and cell count together is an exact 2x2 tiling
        assert np.array_equal(two[:64, :64], mask), kind
        assert np.array_equal(two[:64, 64:], mask), kind
        assert np.array_equal(two[64:, :64], mask), kind


def test_bevel_zero_is_exact_hard_step():
    """bevel == 0 must produce the exact >= step (no NaN/inf leaks from the
    unselected soft-ramp lanes)."""
    mask, _ = _planes(64, 64, mortar=0.3, bevel=0.0)
    assert np.all(np.isfinite(mask))
    assert set(np.unique(mask)) <= {0.0, 1.0}
    # widening mortar eats pixels; the survivors are a subset
    wide, _ = _planes(64, 64, mortar=0.5, bevel=0.0)
    assert np.all(wide <= mask)
    assert wide.sum() < mask.sum()


def test_cells_output_range_and_seed():
    _, a = _planes(64, 64, seed=1)
    _, b = _planes(64, 64, seed=1)
    assert np.array_equal(a, b)
    assert 0.0 <= a.min() and a.max() < 1.0
    _, c = _planes(64, 64, seed=2)
    assert not np.array_equal(a, c)


def test_pattern_kind_accepts_enum_and_validates():
    assert NodeType.Pattern(8, 8, PatternKind.BRICK).payload[2] == "Brick"
    with pytest.raises(ValueError):
        NodeType.Pattern(8, 8, "Plaid")
    with pytest.raises(TexProError):
        NodeType.Pattern(0, 8)
    with pytest.raises(TexProError):
        NodeType.Pattern(8, 8, cells_x=0)
    with pytest.raises(TexProError):
        NodeType.Pattern(8, 8, mortar=-0.1)
    with pytest.raises(TexProError):
        NodeType.Pattern(8, 8, bevel=float("nan"))


def test_pattern_serde_round_trip():
    g, pt, _ = _build(pattern="Brick", mortar=0.25, bevel=0.125, seed=99)
    clone = NodeGraph.from_json(g.to_json())
    assert clone.to_json() == g.to_json()
    assert clone.node(pt).node_type.payload == g.node(pt).node_type.payload


def test_pattern_params_are_arguments_not_structure():
    """cells/mortar/bevel/seed ride in program arguments (one cached
    executable serves groove drags); width/height/kind shape the trace."""
    base = graph_fingerprint(_build()[0])
    assert base == graph_fingerprint(
        _build(cells_x=9, cells_y=2, mortar=0.4, bevel=0.0, seed=123)[0]
    )
    assert base != graph_fingerprint(_build(width=97)[0])
    assert base != graph_fingerprint(_build(pattern="Brick")[0])


def test_pattern_recipe_distinguishes_payloads():
    """Content-hash memoization must not collide pattern nodes that differ
    only in parameters (recipe_cache.node_recipe)."""
    from kanter_core_tpu.recipe_cache import node_recipe

    def recipe(**kw):
        params = dict(DEFAULT, **kw)
        return node_recipe(
            Node(NodeType.Pattern(96, 64, **params), NodeId(1)), [], None
        )

    assert recipe() == recipe()
    assert recipe() != recipe(seed=8)
    assert recipe() != recipe(pattern="Stripe")
    assert recipe() != recipe(cells_x=5)
    assert recipe() != recipe(mortar=0.2)
    assert recipe() != recipe(bevel=0.04)


def test_pattern_engine_paths_bit_identical():
    """Fused, per-node, and tiled engine dispatches all agree with the
    standalone compiler on a pattern(mask)+pattern(cells) mix chain — both
    output slots of one node consumed at once."""
    g = NodeGraph()
    pt = g.add_node(Node(NodeType.Pattern(
        70, 50, "Brick", cells_x=5, cells_y=3, mortar=0.15, bevel=0.07,
        seed=42,
    )))
    mix = g.add_node(Node(NodeType.Mix(MixType.MULTIPLY)))
    out = g.add_node(Node(NodeType.OutputGray("out")))
    g.connect(pt, mix, SlotId(0), SlotId(0))
    g.connect(pt, mix, SlotId(1), SlotId(1))
    g.connect(mix, out, SlotId(0), SlotId(0))

    results = {}
    for name, fused, tile_bytes in [
        ("fused", True, None),
        ("pernode", False, None),
        ("tiled", True, 1),
    ]:
        tp = TextureProcessor(10_000_000, tile_bytes=tile_bytes)
        try:
            lg = tp.new_live_graph()
            with lg.write() as gg:
                gg.fuse_subgraphs = fused
                gg.set_node_graph(g.clone())
            results[name] = render_u8(lg, out)
        finally:
            tp.shutdown_now()

    prog = CompiledGraph(g.clone(), targets=[(out, SlotId(0))], include_u8=True)
    expect = np.asarray(prog()[(out, SlotId(0))]).reshape(-1)
    for name, px in results.items():
        assert np.array_equal(px, expect), name


@pytest.mark.parametrize("kind", ["Checker", "Brick", "Stripe"])
def test_pattern_tiled_bands_bit_identical(kind):
    """Band evaluation is a bit-exact crop for every kind — brick's
    row-parity shift depends on GLOBAL rows, which the band args carry."""
    from kanter_core_tpu.compiler import collect_value_bindings
    from kanter_core_tpu.tiled import TiledEvaluator

    g, pt, out = _build(96, 64, pattern=kind, mortar=0.12, bevel=0.06)
    whole, _ = _planes(96, 64, pattern=kind, mortar=0.12, bevel=0.06)
    for band_rows in (1, 13, 64, 200):
        ev = TiledEvaluator(
            g, [(out, SlotId(0))], collect_value_bindings(g),
            band_rows=band_rows,
        )
        got = ev.run()[(out, SlotId(0))][0]
        assert np.array_equal(got, whole), f"{kind} band_rows={band_rows}"


def test_pattern_bucketed_size_drag_single_trace():
    """A pattern size drag within one bucket reuses the executable (the
    padded index vectors carry the size), and every size is bit-exact —
    the CELLS slot too (slot 1 rides the same program)."""
    from kanter_core_tpu.bucketed import BucketedGraph

    g, pt, out = _build(130, 140, slot=1, pattern="Brick")
    bg = BucketedGraph(g, targets=[(out, SlotId(0))], bucket=256)
    first = np.asarray(bg()[(out, SlotId(0))][0])
    assert np.array_equal(first, _planes(130, 140, pattern="Brick")[1])
    t0 = bg.traces
    for w, h in [(150, 160), (200, 180), (256, 256)]:
        g.set_pattern(pt, w, h, **dict(DEFAULT, pattern="Brick"))
        got = np.asarray(bg()[(out, SlotId(0))][0])
        assert got.shape == (h, w)
        assert np.array_equal(got, _planes(w, h, pattern="Brick")[1]), (w, h)
    assert bg.traces == t0, "same-bucket pattern size drag must not retrace"


def test_pattern_edit_reuses_fused_program_and_rerenders():
    """Editing cells/mortar/seed through the LiveGraph mutator re-renders
    with fresh values through the engine's cached-program path."""
    tp = TextureProcessor(10_000_000)
    try:
        lg = tp.new_live_graph()
        g, pt, out = _build(64, 48)
        with lg.write() as gg:
            gg.set_node_graph(g)
        before = render_u8(lg, out)
        with lg.write() as gg:
            gg.set_pattern(pt, 64, 48,
                           **dict(DEFAULT, cells_x=6, mortar=0.3))
        after = render_u8(lg, out)
        assert not np.array_equal(before, after)
        expect, _ = _planes(64, 48, cells_x=6, mortar=0.3)
        u8 = np.clip(expect, 0.0, 1.0) * 255.0
        u8 = np.nan_to_num(u8, nan=255.0).astype(np.uint8)
        assert np.array_equal(after.reshape(48, 64, 4)[..., 0], u8)
    finally:
        tp.shutdown_now()
