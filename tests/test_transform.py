"""Transform node (extension): affine wrap-sampling semantics, exact
special cases (identity / integer translate / quarter turns), a numpy f32
oracle replica, parameter-as-argument caching, and four-consumer lockstep
parity (also fuzz-covered via the shared generator)."""

import numpy as np
import pytest

from conftest import render_u8

from kanter_core_tpu import (
    Node,
    NodeGraph,
    NodeType,
    SlotId,
    TextureProcessor,
)
from kanter_core_tpu.compiler import CompiledGraph, graph_fingerprint
from kanter_core_tpu.errors import TexProError
from kanter_core_tpu.ids import NodeId


def _apply(plane, payload):
    import jax

    from kanter_core_tpu.ops.transform import transform_bindings, transform_planes

    h, w = plane.shape
    b = transform_bindings(NodeType.Transform(*payload).payload)
    out, = jax.jit(transform_planes, static_argnums=(6, 7))(
        (np.asarray(plane, np.float32),),
        np.arange(h, dtype=np.int32), np.arange(w, dtype=np.int32),
        b["cs"], b["inv_s"], b["off"], h, w,
    )
    return np.asarray(out)


def _np_oracle(plane, payload):
    """Numpy f32 replica of transform_planes' exact op order (numpy never
    FMA-contracts, so with nc_mul on the XLA side the bits must match)."""
    from kanter_core_tpu.ops.transform import transform_bindings

    f = np.float32
    h, w = plane.shape
    b = transform_bindings(NodeType.Transform(*payload).payload)
    cos, sin = b["cs"]
    isx, isy = b["inv_s"]
    ox, oy = b["off"]
    cxc = f(w) * f(0.5)
    cyc = f(h) * f(0.5)
    cx = np.arange(w, dtype=np.int32).astype(np.float32) + f(0.5)
    cy = np.arange(h, dtype=np.int32).astype(np.float32) + f(0.5)
    px = (cx - cxc) - ox
    py = (cy - cyc) - oy
    qx = (px * cos)[None, :] + (py * sin)[:, None]
    qy = (py * cos)[:, None] - (px * sin)[None, :]
    u = qx * isx + (cxc - f(0.5))
    v = qy * isy + (cyc - f(0.5))
    uf = np.clip(np.floor(u), f(-1e9), f(1e9))
    vf = np.clip(np.floor(v), f(-1e9), f(1e9))
    fu, fv = u - uf, v - vf
    x0 = np.mod(uf.astype(np.int32), np.int32(w))
    y0 = np.mod(vf.astype(np.int32), np.int32(h))
    x1 = np.where(x0 + 1 == w, 0, x0 + 1)
    y1 = np.where(y0 + 1 == h, 0, y0 + 1)
    flat = np.asarray(plane, np.float32).reshape(-1)
    n00 = flat[y0 * w + x0]
    n10 = flat[y0 * w + x1]
    n01 = flat[y1 * w + x0]
    n11 = flat[y1 * w + x1]
    nx0 = n00 + fu * (n10 - n00)
    nx1 = n01 + fu * (n11 - n01)
    return nx0 + fv * (nx1 - nx0)


def test_transform_exact_special_cases():
    rng = np.random.default_rng(3)
    plane = rng.random((24, 40), dtype=np.float32)
    assert np.array_equal(_apply(plane, (0, 0, 0, 1, 1)), plane)  # identity
    # integer translation == toroidal roll (content moves +x / −y)
    got = _apply(plane, (5, -3, 0, 1, 1))
    assert np.array_equal(got, np.roll(plane, (-3, 5), axis=(0, 1)))
    sq = rng.random((16, 16), dtype=np.float32)
    assert np.array_equal(_apply(sq, (0, 0, 180, 1, 1)), sq[::-1, ::-1])
    assert np.array_equal(_apply(sq, (0, 0, 90, 1, 1)), np.rot90(sq, 3))
    assert np.array_equal(_apply(sq, (0, 0, 270, 1, 1)), np.rot90(sq, 1))


def test_transform_matches_numpy_oracle_bitwise():
    """Random affine params: the XLA:CPU kernel must match a plain-numpy
    replica bit-for-bit (nc_mul blocks the only divergence source, FMA)."""
    rng = np.random.default_rng(11)
    for _ in range(12):
        h, w = int(rng.integers(3, 80)), int(rng.integers(3, 80))
        plane = rng.random((h, w), dtype=np.float32)
        payload = (
            float(rng.uniform(-100, 100)), float(rng.uniform(-100, 100)),
            float(rng.uniform(0, 360)),
            float(rng.uniform(0.2, 4.0)), float(rng.uniform(0.2, 4.0)),
        )
        got = _apply(plane, payload)
        exp = _np_oracle(plane, payload)
        assert np.array_equal(got, exp), payload


def test_transform_zero_scale_is_deterministic():
    """scale=0 → host reciprocal inf → clamped gather index; IEEE
    propagation like Levels' degenerate span — run twice, bits equal."""
    plane = np.random.default_rng(0).random((8, 8), dtype=np.float32)
    a = _apply(plane, (0, 0, 30, 0.0, 1.0))
    b = _apply(plane, (0, 0, 30, 0.0, 1.0))
    assert np.array_equal(a, b, equal_nan=True)
    assert a.shape == plane.shape


def _build(payload=(7.0, -4.0, 33.0, 1.3, 0.8)):
    g = NodeGraph()
    nz = g.add_node(Node(NodeType.Noise(72, 56, 4, 3, 5, 0.5)))
    xf = g.add_node(Node(NodeType.Transform(*payload)))
    out = g.add_node(Node(NodeType.OutputRgba("out")))
    g.connect(nz, xf, SlotId(0), SlotId(0))
    g.connect(xf, out, SlotId(0), SlotId(0))
    return g, xf, out


def test_transform_serde_round_trip():
    g, xf, _ = _build()
    clone = NodeGraph.from_json(g.to_json())
    assert clone.to_json() == g.to_json()
    assert clone.node(xf).node_type.payload == g.node(xf).node_type.payload


def test_transform_params_are_arguments_not_structure():
    assert graph_fingerprint(_build()[0]) == graph_fingerprint(
        _build((0.0, 99.0, 271.0, 0.1, 8.0))[0]
    )
    from kanter_core_tpu.recipe_cache import node_recipe

    r1 = node_recipe(Node(NodeType.Transform(1, 2, 3, 4, 5), NodeId(1)), ["x"], None)
    r2 = node_recipe(Node(NodeType.Transform(1, 2, 3, 4, 6), NodeId(1)), ["x"], None)
    assert r1 != r2


def test_transform_engine_paths_bit_identical():
    results = {}
    g, xf, out = _build()
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


def test_transform_bucketed_and_band_parity():
    from kanter_core_tpu.bucketed import BucketedGraph
    from kanter_core_tpu.compiler import collect_value_bindings
    from kanter_core_tpu.tiled import TiledEvaluator

    g, xf, out = _build()
    prog = CompiledGraph(g.clone(), targets=[(out, SlotId(0))])
    expect = [np.asarray(p) for p in prog()[(out, SlotId(0))]]
    for band_rows in (1, 7, 64):
        ev = TiledEvaluator(
            g, [(out, SlotId(0))], collect_value_bindings(g), band_rows=band_rows
        )
        got = ev.run()[(out, SlotId(0))]
        assert all(np.array_equal(a, b) for a, b in zip(got, expect)), band_rows
    bg = BucketedGraph(g, targets=[(out, SlotId(0))], bucket=32)
    got = [np.asarray(p) for p in bg()[(out, SlotId(0))]]
    assert all(np.array_equal(a, b) for a, b in zip(got, expect))


def test_transform_rgba_planes_and_drag():
    """RGBA input: all 4 planes transform (constant alpha stays 1);
    set_transform dirties and re-renders through a cached program."""
    g = NodeGraph()
    nz = g.add_node(Node(NodeType.Noise(48, 48, 4, 2, 9, 0.5)))
    h2n = g.add_node(Node(NodeType.HeightToNormal()))
    xf = g.add_node(Node(NodeType.Transform(0, 0, 45, 1, 1)))
    out = g.add_node(Node(NodeType.OutputRgba("out")))
    g.connect(nz, h2n, SlotId(0), SlotId(0))
    g.connect(h2n, xf, SlotId(0), SlotId(0))
    g.connect(xf, out, SlotId(0), SlotId(0))
    tp = TextureProcessor(10_000_000)
    try:
        lg = tp.new_live_graph()
        with lg.write() as gg:
            gg.set_node_graph(g)
        before = render_u8(lg, out)
        assert np.all(before.reshape(-1, 4)[:, 3] == 255)  # alpha preserved
        with lg.write() as gg:
            gg.set_transform(xf, 10.0, 0.0, 45.0, 1.0, 1.0)
        after = render_u8(lg, out)
        assert not np.array_equal(before, after)
        with pytest.raises(TexProError):
            lg.set_transform(out, 0, 0, 0, 1, 1)  # not a Transform node
    finally:
        tp.shutdown_now()
