"""Voronoi node (extension): cellular-noise semantics (F1 / F2−F1 / cell
ID), toroidal wrap correctness against a brute-force oracle, a bitwise
numpy oracle, parameter-as-argument caching, and four-consumer lockstep
parity (also fuzz-covered via the shared generator in
test_fuzz_equivalence)."""

import numpy as np
import pytest

from conftest import render_u8

from kanter_core_tpu import (
    MixType,
    Node,
    NodeGraph,
    NodeType,
    SlotId,
    TextureProcessor,
)
from kanter_core_tpu.compiler import CompiledGraph, graph_fingerprint
from kanter_core_tpu.errors import TexProError
from kanter_core_tpu.ids import NodeId

DEFAULT = dict(cells_x=4, cells_y=4, jitter=1.0, seed=7)


def _build(width=96, height=64, slot=0, **kw):
    params = dict(DEFAULT, **kw)
    g = NodeGraph()
    vo = g.add_node(Node(NodeType.Voronoi(width, height, **params)))
    out = g.add_node(Node(NodeType.OutputGray("out")))
    g.connect(vo, out, SlotId(slot), SlotId(0))
    return g, vo, out


def _planes(width=96, height=64, **kw):
    from kanter_core_tpu.ops.voronoi import _kernel, voronoi_bindings

    params = dict(DEFAULT, **kw)
    payload = NodeType.Voronoi(width, height, **params).payload
    b = voronoi_bindings(payload)
    distance, borders, cells = _kernel()(
        b["rows"], b["cols"], b["fx"], b["fy"], b["px"], b["py"],
        b["jitter"], b["seed"],
    )
    return np.asarray(distance), np.asarray(borders), np.asarray(cells)


# --- bitwise numpy oracle -------------------------------------------------

def _np_hash01(x_u32, y_u32, seed):
    """ops/noise._hash01 in numpy u32 wraparound arithmetic."""
    with np.errstate(over="ignore"):
        h = (
            x_u32 * np.uint32(0x9E3779B1)
            ^ y_u32 * np.uint32(0x85EBCA77)
            ^ np.uint32(seed) * np.uint32(0xC2B2AE3D)
        )
        h = h ^ (h >> np.uint32(16))
        h = (h * np.uint32(0x7FEB352D)) & np.uint32(0xFFFFFFFF)
        h = h ^ (h >> np.uint32(15))
        h = (h * np.uint32(0x846CA68B)) & np.uint32(0xFFFFFFFF)
        h = h ^ (h >> np.uint32(16))
    return (h >> np.uint32(8)).astype(np.float32) * np.float32(2.0**-24)


def _np_voronoi(width, height, cells_x, cells_y, jitter, seed):
    """Bitwise oracle for voronoi_planes on the CPU backend: numpy's
    correctly-rounded f32 mul/add/sub/sqrt match XLA:CPU's non-contracted
    (nc_mul-guarded) kernels; the select chains are order-identical
    (the candidate ORDER is imported from the kernel so tie-breaks stay
    in lockstep)."""
    from kanter_core_tpu.ops.voronoi import _OFFSETS, _SALT_ID, _SALT_JY

    f32 = np.float32
    b_fx = f32(np.float64(cells_x) / np.float64(width))
    b_fy = f32(np.float64(cells_y) / np.float64(height))
    cx = np.arange(width, dtype=f32) + f32(0.5)
    cy = np.arange(height, dtype=f32) + f32(0.5)
    u = cx * b_fx  # [nc]
    v = cy * b_fy  # [nr]
    xi = np.floor(u).astype(np.int32)
    yi = np.floor(v).astype(np.int32)
    seed = np.uint32(seed & 0xFFFFFFFF)
    jit = f32(jitter)

    def cand(dx, dy):
        gx = xi + np.int32(dx)
        gy = yi + np.int32(dy)
        wx = np.mod(gx, np.int32(cells_x)).astype(np.uint32)[None, :]
        wy = np.mod(gy, np.int32(cells_y)).astype(np.uint32)[:, None]
        jx = _np_hash01(wx, wy, seed)
        jy = _np_hash01(wx, wy, seed ^ np.uint32(_SALT_JY))
        cid = _np_hash01(wx, wy, seed ^ np.uint32(_SALT_ID))
        ox = (jx - f32(0.5)) * jit
        oy = (jy - f32(0.5)) * jit
        ddx = (gx.astype(f32) + f32(0.5) - u)[None, :] + ox
        ddy = (gy.astype(f32) + f32(0.5) - v)[:, None] + oy
        d2 = ddx * ddx + ddy * ddy
        return d2, cid

    best1, best_id = cand(*_OFFSETS[0])
    best2 = np.full((height, width), np.inf, f32)
    for off in _OFFSETS[1:]:
        d2, cid = cand(*off)
        closer = d2 < best1
        best2 = np.where(closer, best1, np.minimum(best2, d2))
        best_id = np.where(closer, cid, best_id)
        best1 = np.where(closer, d2, best1)
    f1 = np.sqrt(best1)
    f2 = np.sqrt(best2)
    return (
        np.clip(f1, f32(0.0), f32(1.0)),
        np.clip(f2 - f1, f32(0.0), f32(1.0)),
        best_id,
    )


def test_numpy_oracle_bitwise():
    got = _planes(96, 64, cells_x=5, cells_y=3, jitter=0.8, seed=42)
    want = _np_voronoi(96, 64, 5, 3, 0.8, 42)
    for g, w, name in zip(got, want, ("distance", "borders", "cells")):
        assert np.array_equal(g, w), name


@pytest.mark.parametrize("cfg", [
    # (cells_x, cells_y, jitter, seed) — jitter=1.0 rows are the regime
    # where a 3×3 window demonstrably misses (round-3 advisor finding);
    # the brute force is independent of ANY windowed search.
    (4, 4, 1.0, 11),
    (4, 4, 1.0, 77),
    (4, 4, 1.0, 123456),
    (5, 3, 1.0, 7),
    (8, 8, 1.0, 2),
    (3, 6, 0.85, 9),
    (4, 4, 0.5, 11),
])
def test_brute_force_toroidal_f1_f2_id(cfg):
    """The 5×5 neighbourhood search must find the true nearest two feature
    points AND the true nearest ID under the TOROIDAL metric — every pixel
    of the plane checked against an all-cells f64 brute force with wrap
    copies (independent of the kernel's windowed search; a genuine
    neighbourhood miss fails deterministically rather than by seed luck)."""
    W = H = 32
    CX, CY, J, S = cfg
    from kanter_core_tpu.ops.voronoi import _SALT_ID, _SALT_JY

    # feature points (f64) + IDs at every cell, from the same hashes
    pts = []
    for cyi in range(CY):
        for cxi in range(CX):
            jx = float(_np_hash01(np.uint32(cxi), np.uint32(cyi), np.uint32(S)))
            jy = float(_np_hash01(np.uint32(cxi), np.uint32(cyi),
                                  np.uint32(S) ^ np.uint32(_SALT_JY)))
            cid = float(_np_hash01(np.uint32(cxi), np.uint32(cyi),
                                   np.uint32(S) ^ np.uint32(_SALT_ID)))
            pts.append((cxi + 0.5 + (jx - 0.5) * J,
                        cyi + 0.5 + (jy - 0.5) * J, cid))
    distance, borders, cells = _planes(
        W, H, cells_x=CX, cells_y=CY, jitter=J, seed=S)
    fx, fy = CX / W, CY / H
    for py in range(H):
        for px in range(W):
            u, v = (px + 0.5) * fx, (py + 0.5) * fy
            ranked = sorted(
                (
                    min(
                        ((x + sx * CX) - u) ** 2 + ((y + sy * CY) - v) ** 2
                        for sx in (-1, 0, 1)
                        for sy in (-1, 0, 1)
                    ),
                    cid,
                )
                for (x, y, cid) in pts
            )
            f1, f2 = np.sqrt(ranked[0][0]), np.sqrt(ranked[1][0])
            assert abs(min(f1, 1.0) - distance[py, px]) < 1e-5, (px, py)
            assert abs(min(max(f2 - f1, 0.0), 1.0) - borders[py, px]) < 1e-5, \
                (px, py)
            # ID must be the nearest point's (skip near-ties, where f32
            # vs f64 ranking may legitimately differ)
            if ranked[1][0] - ranked[0][0] > 1e-5:
                assert abs(ranked[0][1] - cells[py, px]) < 1e-6, (px, py)


def test_jitter_zero_is_cell_center_grid():
    """jitter=0 puts every point at its cell center: the Voronoi regions
    are the lattice cells, the ID plane is constant per cell, and the
    distance at a cell center is 0."""
    distance, borders, cells = _planes(64, 64, jitter=0.0, seed=3)
    # 16 px/cell; centers sit between px 7 and 8 → distance min per cell
    block = cells[:16, :16]
    assert np.all(block == block[0, 0])
    assert len(np.unique(cells)) == 16
    # distance field is periodic cell-to-cell (all points at centers)
    assert np.array_equal(distance[:, :16], distance[:, 16:32])
    assert np.array_equal(distance[:16, :], distance[16:32, :])
    # F2−F1 vanishes ON cell boundaries (equidistant) and peaks at the
    # points — row 0 sits on a boundary, row 8 crosses the centers
    assert borders[0, :].mean() < borders[8, :].mean()


def test_output_ranges_and_seed():
    d, b, c = _planes(64, 64, seed=1)
    d2, b2, c2 = _planes(64, 64, seed=1)
    assert np.array_equal(c, c2) and np.array_equal(d, d2) and np.array_equal(b, b2)
    assert d.min() >= 0.0 and d.max() <= 1.0
    assert b.min() >= 0.0 and b.max() <= 1.0
    assert c.min() >= 0.0 and c.max() < 1.0
    _, _, c3 = _planes(64, 64, seed=2)
    assert not np.array_equal(c, c3)


def test_voronoi_validates():
    with pytest.raises(TexProError):
        NodeType.Voronoi(0, 8)
    with pytest.raises(TexProError):
        NodeType.Voronoi(8, 8, cells_x=0)
    with pytest.raises(TexProError):
        NodeType.Voronoi(8, 8, jitter=1.5)
    with pytest.raises(TexProError):
        NodeType.Voronoi(8, 8, jitter=-0.1)
    with pytest.raises(TexProError):
        NodeType.Voronoi(8, 8, jitter=float("nan"))


def test_voronoi_serde_round_trip():
    g, vo, _ = _build(cells_x=5, cells_y=3, jitter=0.25, seed=99)
    clone = NodeGraph.from_json(g.to_json())
    assert clone.to_json() == g.to_json()
    assert clone.node(vo).node_type.payload == g.node(vo).node_type.payload


def test_voronoi_params_are_arguments_not_structure():
    """cells/jitter/seed ride in program arguments (one cached executable
    serves slider drags); only width/height shape the trace."""
    base = graph_fingerprint(_build()[0])
    assert base == graph_fingerprint(
        _build(cells_x=9, cells_y=2, jitter=0.1, seed=123)[0]
    )
    assert base != graph_fingerprint(_build(width=97)[0])


def test_voronoi_recipe_distinguishes_payloads():
    from kanter_core_tpu.recipe_cache import node_recipe

    def recipe(**kw):
        params = dict(DEFAULT, **kw)
        return node_recipe(
            Node(NodeType.Voronoi(96, 64, **params), NodeId(1)), [], None
        )

    assert recipe() == recipe()
    assert recipe() != recipe(seed=8)
    assert recipe() != recipe(cells_x=5)
    assert recipe() != recipe(cells_y=5)
    assert recipe() != recipe(jitter=0.5)


def test_voronoi_engine_paths_bit_identical():
    """Fused, per-node, and tiled engine dispatches all agree with the
    standalone compiler on a distance×borders mix chain — two output slots
    of one node consumed at once (the cells slot is covered by _build)."""
    g = NodeGraph()
    vo = g.add_node(Node(NodeType.Voronoi(
        70, 50, cells_x=5, cells_y=3, jitter=0.9, seed=42,
    )))
    mix = g.add_node(Node(NodeType.Mix(MixType.MULTIPLY)))
    out = g.add_node(Node(NodeType.OutputGray("out")))
    g.connect(vo, mix, SlotId(0), SlotId(0))
    g.connect(vo, mix, SlotId(1), SlotId(1))
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


@pytest.mark.parametrize("slot", [0, 1, 2])
def test_voronoi_tiled_bands_bit_identical(slot):
    """Band evaluation is a bit-exact crop for every output slot — the
    kernel is elementwise in the GLOBAL rows the band args carry."""
    from kanter_core_tpu.compiler import collect_value_bindings
    from kanter_core_tpu.tiled import TiledEvaluator

    g, vo, out = _build(96, 64, slot=slot, jitter=0.7)
    whole = _planes(96, 64, jitter=0.7)[slot]
    for band_rows in (1, 13, 64, 200):
        ev = TiledEvaluator(
            g, [(out, SlotId(0))], collect_value_bindings(g),
            band_rows=band_rows,
        )
        got = ev.run()[(out, SlotId(0))][0]
        assert np.array_equal(got, whole), f"slot={slot} band_rows={band_rows}"


def test_voronoi_bucketed_size_drag_single_trace():
    """A voronoi size drag within one bucket reuses the executable (the
    padded index vectors carry the size), and every size is bit-exact —
    the BORDERS slot rides the same program."""
    from kanter_core_tpu.bucketed import BucketedGraph

    g, vo, out = _build(130, 140, slot=1)
    bg = BucketedGraph(g, targets=[(out, SlotId(0))], bucket=256)
    first = np.asarray(bg()[(out, SlotId(0))][0])
    assert np.array_equal(first, _planes(130, 140)[1])
    t0 = bg.traces
    for w, h in [(150, 160), (200, 180), (256, 256)]:
        g.set_voronoi(vo, w, h, **DEFAULT)
        got = np.asarray(bg()[(out, SlotId(0))][0])
        assert got.shape == (h, w)
        assert np.array_equal(got, _planes(w, h)[1]), (w, h)
    assert bg.traces == t0, "same-bucket voronoi size drag must not retrace"


def test_voronoi_edit_reuses_fused_program_and_rerenders():
    """Editing cells/jitter/seed through the LiveGraph mutator re-renders
    with fresh values through the engine's cached-program path."""
    tp = TextureProcessor(10_000_000)
    try:
        lg = tp.new_live_graph()
        g, vo, out = _build(64, 48)
        with lg.write() as gg:
            gg.set_node_graph(g)
        before = render_u8(lg, out)
        with lg.write() as gg:
            gg.set_voronoi(vo, 64, 48, **dict(DEFAULT, cells_x=6, seed=8))
        after = render_u8(lg, out)
        assert not np.array_equal(before, after)
        expect = _planes(64, 48, cells_x=6, seed=8)[0]
        u8 = np.clip(expect, 0.0, 1.0) * 255.0
        u8 = np.nan_to_num(u8, nan=255.0).astype(np.uint8)
        assert np.array_equal(after.reshape(48, 64, 4)[..., 0], u8)
    finally:
        tp.shutdown_now()
