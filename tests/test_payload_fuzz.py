"""Property fuzz over every NodeTypeKind's payload (VERDICT r4 #6).

Every numeric payload field is swept with NaN/±inf/negative/huge/zero, and
every kind string with garbage. Contract (the reference's degrade-don't-
crash stance, `/root/reference/src/node/image.rs:13-18`): the constructor
either raises TexProError, or the constructed node EVALUATES on tiny
inputs — no host hang (the conftest watchdog bounds each test), no crash.
NaN/inf pixels are acceptable (IEEE propagation is the documented Levels/
Mix contract); a dead process or a hung trace is not. After each type's
sweep, the worst accepted payload renders once through the LIVE engine and
the engine must still serve a sane graph afterwards.

The r4 caps this systematizes (Blur sigma, AO radius, Noise octaves —
commit 8fbe499) came from targeted review; this sweep covers all 26 kinds
so any future payload hazard lands with a pin.
"""

import math

import numpy as np
import pytest

from kanter_core_tpu import (
    MixType,
    Node,
    NodeGraph,
    NodeType,
    SlotId,
    TextureProcessor,
)
from kanter_core_tpu.compiler import CompiledGraph
from kanter_core_tpu.errors import TexProError

NAN = float("nan")
INF = float("inf")
FLOAT_PROBES = [NAN, INF, -INF, -1.0, 1e12, 0.0]
INT_PROBES = [-1, 0, 1 << 40]
STR_PROBES = ["Garbage", ""]


def _gray_source():
    """Standard tiny gray input for filter nodes (16x16 procedural)."""
    return Node(NodeType.Pattern(16, 16, "Checker", cells_x=2, cells_y=2,
                                 mortar=0.2, bevel=0.1, seed=1))


def _eval_graph(build):
    """Build a tiny graph around the node under test and evaluate it
    directly (compiler path — the same kernels the engine runs, without
    per-case thread spin-up). Returns the output planes."""
    g = NodeGraph()
    out = build(g)
    prog = CompiledGraph(g, targets=[(out, SlotId(0))])
    return prog()[(out, SlotId(0))]


def _wire_gray_filter(node):
    def build(g):
        src = g.add_node(_gray_source())
        n = g.add_node(node)
        g.connect(src, n, SlotId(0), SlotId(0))
        out = g.add_node(Node(NodeType.OutputGray("out")))
        g.connect(n, out, SlotId(0), SlotId(0))
        return out
    return build


def _wire_gray_to_rgba(node):
    def build(g):
        src = g.add_node(_gray_source())
        n = g.add_node(node)
        g.connect(src, n, SlotId(0), SlotId(0))
        out = g.add_node(Node(NodeType.OutputRgba("out")))
        g.connect(n, out, SlotId(0), SlotId(0))
        return out
    return build


def _wire_rgba_filter(node):
    def build(g):
        src = g.add_node(_gray_source())
        comb = g.add_node(Node(NodeType.CombineRgba()))
        for i in range(3):
            g.connect(src, comb, SlotId(0), SlotId(i))
        n = g.add_node(node)
        g.connect(comb, n, SlotId(0), SlotId(0))
        out = g.add_node(Node(NodeType.OutputRgba("out")))
        g.connect(n, out, SlotId(0), SlotId(0))
        return out
    return build


def _wire_warp(node):
    def build(g):
        src = g.add_node(_gray_source())
        n = g.add_node(node)
        g.connect(src, n, SlotId(0), SlotId(0))
        g.connect(src, n, SlotId(1), SlotId(1))
        out = g.add_node(Node(NodeType.OutputGray("out")))
        g.connect(n, out, SlotId(0), SlotId(0))
        return out
    return build


def _wire_source(node):
    def build(g):
        n = g.add_node(node)
        out = g.add_node(Node(NodeType.OutputGray("out")))
        g.connect(n, out, SlotId(0), SlotId(0))
        return out
    return build


def _float_variants(base_args, positions):
    """All single-field float substitutions of `base_args`."""
    for pos in positions:
        for probe in FLOAT_PROBES:
            args = list(base_args)
            args[pos] = probe
            yield tuple(args)


def _int_variants(base_args, positions):
    for pos in positions:
        for probe in INT_PROBES:
            args = list(base_args)
            args[pos] = probe
            yield tuple(args)


# (kind name, constructor, base args, float field positions,
#  int field positions, string field positions, wiring)
SWEEPS = [
    ("Value", NodeType.Value, (0.5,), [0], [], [], _wire_source),
    ("Blur", NodeType.Blur, (1.0,), [0], [], [], _wire_gray_filter),
    ("Levels", NodeType.Levels, (0.0, 1.0, 1.0, 0.0, 1.0),
     [0, 1, 2, 3, 4], [], [], _wire_gray_filter),
    ("Curvature", NodeType.Curvature, (4.0,), [0], [], [], _wire_gray_filter),
    ("Distance", NodeType.Distance, (16.0,), [0], [], [], _wire_gray_filter),
    ("AmbientOcclusion", NodeType.AmbientOcclusion, (2.0, 2.0),
     [0, 1], [], [], _wire_gray_filter),
    ("Hsv", NodeType.Hsv, (0.0, 1.0, 1.0), [0, 1, 2], [], [], _wire_rgba_filter),
    ("Transform", NodeType.Transform, (0.0, 0.0, 0.0, 1.0, 1.0),
     [0, 1, 2, 3, 4], [], [], _wire_gray_filter),
    ("Warp", NodeType.Warp, (0.0, 4.0), [0, 1], [], [], _wire_warp),
    ("Noise", NodeType.Noise, (16, 16, 4, 2, 0, 0.5),
     [5], [0, 1, 2, 3, 4], [], _wire_source),
    ("Pattern", NodeType.Pattern, (16, 16, "Checker", 2, 2, 0.2, 0.1, 0),
     [5, 6], [0, 1, 3, 4, 7], [2], _wire_source),
    ("Voronoi", NodeType.Voronoi, (16, 16, 2, 2, 0.8, 0),
     [4], [0, 1, 2, 3, 5], [], _wire_source),
    ("Ramp", NodeType.Ramp, (16, 16, "Linear", 0.3, 0.5, 0.5, 1.0),
     [3, 4, 5, 6], [0, 1], [2], _wire_source),
]


@pytest.mark.parametrize(
    "name,ctor,base,fpos,ipos,spos,wire",
    SWEEPS,
    ids=[s[0] for s in SWEEPS],
)
def test_payload_fuzz(name, ctor, base, fpos, ipos, spos, wire):
    variants = list(_float_variants(base, fpos))
    variants += list(_int_variants(base, ipos))
    for pos in spos:
        for probe in STR_PROBES:
            args = list(base)
            args[pos] = probe
            variants.append(tuple(args))

    accepted = []
    for args in variants:
        try:
            nt = ctor(*args)
        except TexProError:
            continue  # rejected at construction: the degrade contract holds
        except (ValueError, OverflowError) as e:
            # int(NaN)-style Python-level rejection is acceptable too, but
            # it must be deterministic, not a crash
            continue
        accepted.append((args, nt))

    # every ACCEPTED payload must evaluate without hanging or killing the
    # process (the conftest watchdog fails this test if a trace hangs)
    for args, nt in accepted:
        try:
            planes = _eval_graph(wire(Node(nt)))
        except TexProError:
            continue  # eval-time diagnosable rejection is fine
        for p in planes:
            assert np.asarray(p).shape[0] >= 1  # evaluated to real planes

    # the worst accepted payload renders through the LIVE engine, and the
    # engine still serves a sane graph afterwards
    if accepted:
        from conftest import render_u8

        tp = TextureProcessor(10_000_000)
        try:
            lg = tp.new_live_graph()
            with lg.write() as g:
                out = wire(Node(accepted[-1][1]))(g)
            try:
                render_u8(lg, out)
            except TexProError:
                pass  # graph-fatal is allowed; processor death is not
            assert not tp.shutdown.load()
            lg2 = tp.new_live_graph()
            with lg2.write() as g:
                out2 = _wire_gray_filter(Node(NodeType.Curvature(2.0)))(g)
            assert render_u8(lg2, out2) is not None
        finally:
            tp.shutdown_now()


def test_image_and_embed_degrade():
    """Garbage Image paths degrade to the magenta 1x1 placeholder
    (`image.rs:13-18`); an Embed id with no registered data surfaces a
    diagnosable TexProError through the engine, not a crash."""
    from kanter_core_tpu.ops.embed import EmbeddedSlotDataId

    def wire_rgba_source(node):
        def build(g):
            n = g.add_node(node)
            out = g.add_node(Node(NodeType.OutputRgba("out")))
            g.connect(n, out, SlotId(0), SlotId(0))
            return out
        return build

    planes = _eval_graph(
        wire_rgba_source(Node(NodeType.Image("/nonexistent/junk.png")))
    )
    rgba = [np.asarray(p).reshape(-1)[0] for p in planes]
    assert rgba[0] == 1.0 and rgba[1] == 0.0 and rgba[2] == 1.0  # magenta

    g = NodeGraph()
    emb = g.add_node(Node(NodeType.Embed(EmbeddedSlotDataId(1 << 40))))
    out = g.add_node(Node(NodeType.OutputRgba("out")))
    g.connect(emb, out, SlotId(0), SlotId(0))
    with pytest.raises(TexProError):
        CompiledGraph(g, targets=[(out, SlotId(0))])()


def test_gradient_map_stop_count_bounded():
    """GradientMap's stop COUNT shapes the trace (one select per stop in
    every traced consumer — the Blur(1e9) hazard class): 64 stops work,
    the constructor caps at 256 (r5 review finding), and the serde path
    TRUNCATES an absurd saved list instead of refusing the load."""
    stops = [[i / 63.0, i / 63.0, 0.5, 0.5, 1.0] for i in range(64)]
    planes = _eval_graph(_wire_gray_to_rgba(Node(NodeType.GradientMap(stops))))
    assert np.asarray(planes[0]).shape == (16, 16)

    huge = [[i / 9999.0, 0.5, 0.5, 0.5, 1.0] for i in range(10_000)]
    with pytest.raises(TexProError):
        NodeType.GradientMap(huge)
    nt = NodeType.from_json({"GradientMap": {"stops": huge}})
    assert len(nt.payload) == 256

    # serde fidelity (r5 review): values the constructors accept
    # round-trip bit-unchanged — the clamps only catch out-of-range
    nt = NodeType.from_json({"Blur": 1e-9})
    assert nt.payload == 1e-9
    nt = NodeType.from_json({"Ramp": {
        "width": 16, "height": 16, "kind": "Linear", "angle": 2e9,
        "cx": 0.5, "cy": 0.5, "scale": 1.0,
    }})
    assert nt.payload[3] == 2e9
    nt = NodeType.from_json({"Noise": {
        "width": 16, "height": 16, "cells": 4, "octaves": 2,
        "seed": "garbage", "persistence": 0.5,
    }})
    assert nt.payload[4] == 0  # non-numeric seed falls back, file loads


def test_write_failure_is_graph_fatal_only():
    """A Write node with an unwritable path (user-payload hazard, the bad
    Image-path class) fails ITS graph with a diagnosable IO error; the
    processor survives and other graphs keep rendering (r5 — previously
    the raw OSError shut the whole processor down)."""
    import time

    from conftest import render_u8
    from kanter_core_tpu.errors import ErrorKind

    tp = TextureProcessor(10_000_000)
    try:
        lg = tp.new_live_graph()
        with lg.write() as g:
            v = g.add_node(Node(NodeType.Value(0.5)))
            w = g.add_node(Node(NodeType.Write("/nonexistent-dir/x.png")))
            g.connect(v, w, SlotId(0), SlotId(0))
            g.request(w)
        deadline = time.time() + 30
        while lg.fatal_error is None and time.time() < deadline:
            time.sleep(0.05)
        assert isinstance(lg.fatal_error, TexProError)
        assert lg.fatal_error.kind == ErrorKind.IO
        assert not tp.shutdown.load(), "Write failure killed the processor"

        lg2 = tp.new_live_graph()
        with lg2.write() as g:
            out = _wire_gray_filter(Node(NodeType.Curvature(2.0)))(g)
        assert render_u8(lg2, out) is not None
    finally:
        tp.shutdown_now()


def test_garbage_enum_serde_refuses_diagnosably(tmp_path):
    """Garbage enum strings in a saved graph FILE refuse the load with the
    documented IO TexProError (`from_path` wraps ValueError — the
    reference's io::Result contract, node_graph.rs:33), never a raw
    Python exception."""
    import json

    from kanter_core_tpu import NodeGraph

    for payload in (
        {"node_id": 1, "node_type": {"Mix": "Garbage"},
         "resize_policy": "MostPixels", "resize_filter": "Triangle"},
        {"node_id": 1, "node_type": {"Bogus": 1},
         "resize_policy": "MostPixels", "resize_filter": "Triangle"},
        {"node_id": 1, "node_type": "Value",
         "resize_policy": "MostPixels", "resize_filter": "Bogus"},
    ):
        path = tmp_path / "bad.json"
        path.write_text(json.dumps({"nodes": [payload], "edges": []}))
        with pytest.raises(TexProError) as exc:
            NodeGraph.from_path(str(path))
        from kanter_core_tpu.errors import ErrorKind

        assert exc.value.kind == ErrorKind.IO
