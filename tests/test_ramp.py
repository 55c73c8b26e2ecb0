"""Ramp node (extension): gradient-source semantics for all three kinds,
a bitwise numpy oracle, parameter-as-argument caching, serde, and
four-consumer lockstep parity (also fuzz-covered via the shared
generator in test_fuzz_equivalence)."""

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

DEFAULT = dict(kind="Linear", angle=30.0, cx=0.4, cy=0.6, scale=1.3)


def _build(width=96, height=64, **kw):
    params = dict(DEFAULT, **kw)
    g = NodeGraph()
    rp = g.add_node(Node(NodeType.Ramp(width, height, **params)))
    out = g.add_node(Node(NodeType.OutputGray("out")))
    g.connect(rp, out, SlotId(0), SlotId(0))
    return g, rp, out


def _plane(width=96, height=64, **kw):
    from kanter_core_tpu.ops.ramp import _kernel, ramp_bindings

    params = dict(DEFAULT, **kw)
    payload = NodeType.Ramp(width, height, **params).payload
    b = ramp_bindings(payload)
    return np.asarray(
        _kernel(payload[2])(b["rows"], b["cols"], b["iw"], b["ih"], b["k"])
    )


# --- bitwise numpy oracle -------------------------------------------------

def _np_ramp(width, height, kind, angle, cx, cy, scale):
    """Bitwise oracle on the CPU backend: numpy's correctly-rounded f32
    mul/add/sub/sqrt/max match XLA:CPU's non-contracted (nc_mul-guarded)
    kernel; host-side cos/sin/reciprocals replayed exactly."""
    from kanter_core_tpu.ops.ramp import _QUARTER

    f32 = np.float32
    d = float(angle) % 360.0
    if d in _QUARTER:
        cos, sin = _QUARTER[d]
    else:
        r = np.deg2rad(np.float64(d))
        cos, sin = float(np.cos(r)), float(np.sin(r))
    cos, sin = f32(cos), f32(sin)
    cx, cy, scale = f32(cx), f32(cy), f32(scale)
    iw = f32(np.float64(1.0) / np.float64(width))
    ih = f32(np.float64(1.0) / np.float64(height))
    u = (np.arange(width, dtype=f32) + f32(0.5)) * iw
    v = (np.arange(height, dtype=f32) + f32(0.5)) * ih
    du = (u - cx)[None, :]
    dv = (v - cy)[:, None]
    if kind == "Linear":
        t = f32(0.5) + scale * (du * cos + dv * sin)
    elif kind == "Radial":
        dsq = np.sqrt(du * du + dv * dv, dtype=f32)
        t = scale * (dsq + dsq)
    else:
        m = np.maximum(np.broadcast_to(np.abs(du), (height, width)), np.abs(dv))
        t = scale * (m + m)
    return np.clip(t, f32(0.0), f32(1.0))


@pytest.mark.parametrize("kind", ["Linear", "Radial", "Box"])
def test_numpy_oracle_bitwise(kind):
    got = _plane(96, 64, kind=kind, angle=37.0, cx=0.3, cy=0.7, scale=1.7)
    want = _np_ramp(96, 64, kind, 37.0, 0.3, 0.7, 1.7)
    assert np.array_equal(got, want), kind


def test_linear_semantics():
    """angle 0 ⇒ left-to-right through the center: 0.5 at cx, monotone in
    u, constant down columns; quarter-turn angles are exactly axis-
    aligned (the _QUARTER table)."""
    p = _plane(64, 32, kind="Linear", angle=0.0, cx=0.5, cy=0.5, scale=1.0)
    assert np.array_equal(p[0], p[-1])  # constant in v
    assert np.all(np.diff(p[0]) >= 0.0)  # monotone in u
    mid = _np_ramp(64, 32, "Linear", 0.0, 0.5, 0.5, 1.0)
    assert np.array_equal(p, mid)
    p90 = _plane(64, 32, kind="Linear", angle=90.0, cx=0.5, cy=0.5, scale=1.0)
    assert np.array_equal(p90[:, 0], p90[:, -1])  # constant in u
    assert np.all(np.diff(p90[:, 0]) >= 0.0)


def test_radial_and_box_semantics():
    r = _plane(65, 65, kind="Radial", angle=0.0, cx=0.5, cy=0.5, scale=1.0)
    assert r[32, 32] < 0.03  # ~0 at the center pixel
    assert r[0, 0] == 1.0  # corner beyond d = 0.5 clips to 1
    # radially symmetric about the center (left/right mirror)
    assert np.allclose(r[:, :32], r[:, 33:][:, ::-1], atol=0)
    b = _plane(65, 65, kind="Box", angle=0.0, cx=0.5, cy=0.5, scale=1.0)
    assert b[32, 32] < 0.03
    # edge-midpoint pixel CENTERS sit half a pixel inside the clip line
    assert b[0, 32] == b[32, 0]
    assert b[0, 32] > 0.98
    # Chebyshev iso-lines are squares: constant along each edge ring
    assert b[10, 10] == b[10, 54] == b[54, 10] == b[54, 54]


def test_ramp_validates():
    with pytest.raises(TexProError):
        NodeType.Ramp(0, 8)
    with pytest.raises(TexProError):
        NodeType.Ramp(8, 8, "Swirl")
    with pytest.raises(TexProError):
        NodeType.Ramp(8, 8, "Linear", angle=float("nan"))
    with pytest.raises(TexProError):
        NodeType.Ramp(8, 8, "Linear", scale=float("inf"))


def test_ramp_serde_round_trip():
    g, rp, _ = _build(kind="Box", angle=12.5, cx=0.1, cy=0.9, scale=2.0)
    clone = NodeGraph.from_json(g.to_json())
    assert clone.to_json() == g.to_json()
    assert clone.node(rp).node_type.payload == g.node(rp).node_type.payload


def test_ramp_params_are_arguments_not_structure():
    """angle/center/scale ride in program arguments (one cached
    executable serves slider drags); size and KIND shape the trace."""
    base = graph_fingerprint(_build()[0])
    assert base == graph_fingerprint(
        _build(angle=275.0, cx=0.9, cy=0.1, scale=0.2)[0]
    )
    assert base != graph_fingerprint(_build(kind="Radial")[0])
    assert base != graph_fingerprint(_build(width=97)[0])


def test_ramp_recipe_distinguishes_payloads():
    from kanter_core_tpu.ids import NodeId
    from kanter_core_tpu.recipe_cache import node_recipe

    def recipe(**kw):
        params = dict(DEFAULT, **kw)
        return node_recipe(
            Node(NodeType.Ramp(96, 64, **params), NodeId(1)), [], None
        )

    assert recipe() == recipe()
    assert recipe() != recipe(kind="Box")
    assert recipe() != recipe(angle=31.0)
    assert recipe() != recipe(cx=0.41)
    assert recipe() != recipe(cy=0.61)
    assert recipe() != recipe(scale=1.31)


@pytest.mark.parametrize("kind", ["Linear", "Radial", "Box"])
def test_ramp_engine_paths_bit_identical(kind):
    """Fused, per-node, and tiled engine dispatches all agree with the
    standalone compiler on a ramp×ramp mix chain."""
    g = NodeGraph()
    r1 = g.add_node(Node(NodeType.Ramp(70, 50, kind, 33.0, 0.45, 0.55, 1.1)))
    r2 = g.add_node(Node(NodeType.Ramp(70, 50, "Linear", 120.0, 0.5, 0.5, 0.7)))
    mix = g.add_node(Node(NodeType.Mix(MixType.MULTIPLY)))
    out = g.add_node(Node(NodeType.OutputGray("out")))
    g.connect(r1, mix, SlotId(0), SlotId(0))
    g.connect(r2, mix, SlotId(0), SlotId(1))
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


@pytest.mark.parametrize("kind", ["Linear", "Radial", "Box"])
def test_ramp_tiled_bands_bit_identical(kind):
    """Band evaluation is a bit-exact crop — the kernel is elementwise in
    the GLOBAL rows the band args carry."""
    from kanter_core_tpu.compiler import collect_value_bindings
    from kanter_core_tpu.tiled import TiledEvaluator

    g, rp, out = _build(96, 64, kind=kind)
    whole = _plane(96, 64, kind=kind)
    for band_rows in (1, 13, 64, 200):
        ev = TiledEvaluator(
            g, [(out, SlotId(0))], collect_value_bindings(g),
            band_rows=band_rows,
        )
        got = ev.run()[(out, SlotId(0))][0]
        assert np.array_equal(got, whole), f"{kind} band_rows={band_rows}"


def test_ramp_bucketed_size_drag_single_trace():
    """A ramp size drag within one bucket reuses the executable (padded
    index vectors carry the size), and every size is bit-exact."""
    from kanter_core_tpu.bucketed import BucketedGraph

    g, rp, out = _build(130, 140)
    bg = BucketedGraph(g, targets=[(out, SlotId(0))], bucket=256)
    first = np.asarray(bg()[(out, SlotId(0))][0])
    assert np.array_equal(first, _plane(130, 140))
    t0 = bg.traces
    for w, h in [(150, 160), (200, 180), (256, 256)]:
        g.set_ramp(rp, w, h, **DEFAULT)
        got = np.asarray(bg()[(out, SlotId(0))][0])
        assert got.shape == (h, w)
        assert np.array_equal(got, _plane(w, h)), (w, h)
    assert bg.traces == t0, "same-bucket ramp size drag must not retrace"


def test_ramp_edit_reuses_fused_program_and_rerenders():
    """Editing angle/center/scale through the LiveGraph mutator re-renders
    with fresh values through the engine's cached-program path."""
    tp = TextureProcessor(10_000_000)
    try:
        lg = tp.new_live_graph()
        g, rp, out = _build(64, 48)
        with lg.write() as gg:
            gg.set_node_graph(g)
        before = render_u8(lg, out)
        with lg.write() as gg:
            gg.set_ramp(rp, 64, 48, **dict(DEFAULT, angle=200.0, scale=0.6))
        after = render_u8(lg, out)
        assert not np.array_equal(before, after)
        expect = _plane(64, 48, angle=200.0, scale=0.6)
        u8 = np.clip(expect, 0.0, 1.0) * 255.0
        u8 = np.nan_to_num(u8, nan=255.0).astype(np.uint8)
        assert np.array_equal(after.reshape(48, 64, 4)[..., 0], u8)
    finally:
        tp.shutdown_now()
