"""API-contract tests: graph topology, slot typing, serde.

Ports `/root/reference/tests/integration_tests.rs` contract tests
(connect_invalid_slot `:787-810`, wrong_slot_type `:1330-1347`, remove_node
`:772-785`, unconnected `:555-565`, request_empty_buffer `:307-333`,
deadlock `:109-138`) plus NodeGraph unit coverage.
"""

import json

import numpy as np
import pytest

from conftest import IMAGE_1, INVERT_GRAPH_JSON, render_u8

from kanter_core_tpu import (
    Edge,
    ErrorKind,
    LiveGraph,
    MixType,
    Node,
    NodeGraph,
    NodeId,
    NodeType,
    Side,
    SlotId,
    TexProError,
)


def test_connect_invalid_slot(tex_pro):
    lg = tex_pro.new_live_graph()
    with lg.write() as g:
        value_node = g.add_node(Node(NodeType.Value(0.0)))
        mix_node = g.add_node(Node(NodeType.Mix()))
        g.connect(value_node, mix_node, SlotId(0), SlotId(0))
        g.connect(value_node, mix_node, SlotId(0), SlotId(1))
        with pytest.raises(TexProError) as exc:
            g.connect(value_node, mix_node, SlotId(0), SlotId(2))
        assert exc.value.kind == ErrorKind.INVALID_SLOT_ID


def test_wrong_slot_type(tex_pro):
    lg = tex_pro.new_live_graph()
    with lg.write() as g:
        image_node = g.add_node(Node(NodeType.Image(IMAGE_1)))
        gray_node = g.add_node(Node(NodeType.OutputGray("out")))
        with pytest.raises(TexProError) as exc:
            g.connect(image_node, gray_node, SlotId(0), SlotId(0))
        assert exc.value.kind == ErrorKind.INVALID_SLOT_TYPE


def test_remove_node(tex_pro):
    lg = tex_pro.new_live_graph()
    with lg.write() as g:
        value_node = g.add_node(Node(NodeType.Value(0.0)))
        g.remove_node(value_node)
    assert len(lg.node_ids()) == 0


def test_unconnected(tex_pro):
    lg = tex_pro.new_live_graph()
    with lg.write() as g:
        g.add_node(Node(NodeType.OutputRgba("out")))


def test_request_empty_buffer(tex_pro):
    """Mix with no inputs yields a 1×1 output (`:307-333`)."""
    lg = tex_pro.new_live_graph()
    with lg.write() as g:
        mix_node = g.add_node(Node(NodeType.Mix()))
        output_node = g.add_node(Node(NodeType.OutputRgba("out")))
        g.connect(mix_node, output_node, SlotId(0), SlotId(0))
    data = render_u8(lg, output_node)
    assert data.shape == (4,)  # 1×1 RGBA


def test_deadlock(tex_pro):
    """One Value node feeding both Mix inputs must not deadlock (`:109-138`)."""
    lg = tex_pro.new_live_graph()
    with lg.write() as g:
        value_node = g.add_node(Node(NodeType.Value(0.0)))
        mix_node = g.add_node(Node(NodeType.Mix(MixType.ADD)))
        g.connect(value_node, mix_node, SlotId(0), SlotId(0))
        g.connect(value_node, mix_node, SlotId(0), SlotId(1))
    with LiveGraph.await_clean_read(lg, mix_node) as g:
        g.slot_data(mix_node, SlotId(0))


def test_implicit_disconnect(tex_pro):
    """Force-connecting into an occupied input slot replaces the old edge
    (`node_graph.rs:434`)."""
    lg = tex_pro.new_live_graph()
    with lg.write() as g:
        v1 = g.add_node(Node(NodeType.Value(0.25)))
        v2 = g.add_node(Node(NodeType.Value(0.75)))
        out = g.add_node(Node(NodeType.OutputGray("out")))
        g.connect(v1, out, SlotId(0), SlotId(0))
        g.connect(v2, out, SlotId(0), SlotId(0))
        assert len(g.edges()) == 1
        assert g.edges()[0].output_id == v2


def test_name_dedup(tex_pro):
    """Input/output node names dedup as name_0, name_1… (`node_graph.rs:141-189`)."""
    graph = NodeGraph()
    graph.add_node(Node(NodeType.OutputGray("out")))
    graph.add_node(Node(NodeType.OutputGray("out")))
    graph.add_node(Node(NodeType.OutputGray("out")))
    graph.add_node(Node(NodeType.OutputGray("")))
    assert graph.output_names() == ["out", "out_0", "out_1", "untitled"]


def test_rename_output_node():
    graph = NodeGraph()
    a = graph.add_node(Node(NodeType.OutputGray("a")))
    graph.add_node(Node(NodeType.OutputGray("b")))
    old = graph.rename_output_node(a, "b")
    assert old == "a"
    assert graph.output_names() == ["b_0", "b"]


def test_edge_from_arbitrary():
    edge = Edge.from_arbitrary(
        NodeId(1), Side.INPUT, SlotId(2), NodeId(3), Side.OUTPUT, SlotId(4)
    )
    assert edge == Edge(NodeId(3), NodeId(1), SlotId(4), SlotId(2))
    with pytest.raises(TexProError):
        Edge.from_arbitrary(NodeId(1), Side.INPUT, SlotId(0), NodeId(1), Side.OUTPUT, SlotId(0))
    with pytest.raises(TexProError):
        Edge.from_arbitrary(NodeId(1), Side.INPUT, SlotId(0), NodeId(2), Side.INPUT, SlotId(0))


def test_json_format_compat():
    """The serialized shape matches serde_json's output for the reference
    types (`data/invert_graph.json`)."""
    with open(INVERT_GRAPH_JSON) as f:
        reference = json.load(f)
    graph = NodeGraph.from_json(reference)
    assert graph.to_json() == reference


def test_json_round_trip(tmp_path):
    graph = NodeGraph.from_path(INVERT_GRAPH_JSON)
    path = str(tmp_path / "rt.json")
    graph.export_json(path)
    graph2 = NodeGraph.from_path(path)
    assert len(graph2.nodes) == 4
    assert len(graph2.edges) == 3
    assert graph2.node(NodeId(3098157114)).node_type.payload == MixType.SUBTRACT
    # id counter resumes above the max existing id (`node_graph.rs:33-46`)
    assert int(graph2.new_id()) == 3948812723


def test_get_children_parents():
    graph = NodeGraph()
    a = graph.add_node(Node(NodeType.Value(0.0)))
    b = graph.add_node(Node(NodeType.Mix()))
    c = graph.add_node(Node(NodeType.Mix()))
    graph.connect(a, b, SlotId(0), SlotId(0))
    graph.connect(a, c, SlotId(0), SlotId(0))
    graph.connect(b, c, SlotId(0), SlotId(1))
    assert graph.get_children(a) == [b, c]
    assert graph.get_parents(c) == [a, b]
    assert set(graph.get_children_recursive(a)) == {b, c}


def test_node_type_discriminant_equality():
    assert NodeType.Value(1.0) == NodeType.Value(2.0)
    assert NodeType.Mix(MixType.ADD) == NodeType.Mix(MixType.POW)
    assert NodeType.Value(1.0) != NodeType.Mix()


def test_live_set_mix_type_dirties(tex_pro):
    from conftest import render_u8

    lg = tex_pro.new_live_graph()
    with lg.write() as g:
        v = g.add_node(Node(NodeType.Value(0.5)))
        mix = g.add_node(Node(NodeType.Mix(MixType.ADD)))
        comb = g.add_node(Node(NodeType.CombineRgba()))
        out = g.add_node(Node(NodeType.OutputRgba("out")))
        g.connect(v, mix, SlotId(0), SlotId(0))
        g.connect(v, mix, SlotId(0), SlotId(1))
        g.connect(mix, comb, SlotId(0), SlotId(0))
        g.connect(comb, out, SlotId(0), SlotId(0))
    assert render_u8(lg, out).tolist() == [255, 0, 0, 255]  # 0.5 + 0.5
    with lg.write() as g:
        g.set_mix_type(mix, MixType.MULTIPLY)
    assert render_u8(lg, out).tolist() == [63, 0, 0, 255]  # 0.5 * 0.5


def test_try_connect_and_can_connect():
    """try_connect refuses an occupied slot with SLOT_OCCUPIED
    (`node_graph.rs:376-413`)."""
    graph = NodeGraph()
    v1 = graph.add_node(Node(NodeType.Value(0.0)))
    v2 = graph.add_node(Node(NodeType.Value(1.0)))
    mix = graph.add_node(Node(NodeType.Mix()))
    graph.try_connect(v1, mix, SlotId(0), SlotId(0))
    with pytest.raises(TexProError) as exc:
        graph.can_connect(v2, mix, SlotId(0), SlotId(0))
    assert exc.value.kind == ErrorKind.SLOT_OCCUPIED
    with pytest.raises(TexProError):
        graph.try_connect(v2, mix, SlotId(0), SlotId(0))
    assert len(graph.edges) == 1


def test_remove_edge_and_connected_edges():
    graph = NodeGraph()
    v = graph.add_node(Node(NodeType.Value(0.0)))
    mix = graph.add_node(Node(NodeType.Mix()))
    edge = graph.connect(v, mix, SlotId(0), SlotId(0))
    assert graph.connected_edges(mix, Side.INPUT, SlotId(0)) == [edge]
    assert graph.slot_occupied(mix, Side.INPUT, SlotId(0))
    removed = graph.remove_edge(edge)
    assert removed == edge
    with pytest.raises(TexProError) as exc:
        graph.remove_edge(edge)
    assert exc.value.kind == ErrorKind.INVALID_EDGE
    with pytest.raises(TexProError) as exc:
        graph.connected_edges(mix, Side.INPUT, SlotId(0))
    assert exc.value.kind == ErrorKind.SLOT_NOT_OCCUPIED


def test_disconnect_slot_errors():
    graph = NodeGraph()
    v = graph.add_node(Node(NodeType.Value(0.0)))
    with pytest.raises(TexProError) as exc:
        graph.disconnect_slot(v, Side.OUTPUT, SlotId(0))
    assert exc.value.kind == ErrorKind.SLOT_NOT_OCCUPIED


def test_add_node_with_id_conflict():
    graph = NodeGraph()
    v = graph.add_node(Node(NodeType.Value(0.0)))
    with pytest.raises(TexProError) as exc:
        graph.add_node_with_id(Node(NodeType.Value(1.0), node_id=v))
    assert exc.value.kind == ErrorKind.INVALID_NODE_ID


def test_set_mix_type_wrong_node():
    graph = NodeGraph()
    v = graph.add_node(Node(NodeType.Value(0.0)))
    with pytest.raises(TexProError) as exc:
        graph.set_mix_type(v, MixType.POW)
    assert exc.value.kind == ErrorKind.INVALID_NODE_ID


def test_cli_info_and_render(tmp_path):
    from kanter_core_tpu.__main__ import main

    assert main(["info", INVERT_GRAPH_JSON]) == 0

    out_path = str(tmp_path / "cli.png")
    rc = main([
        "render", INVERT_GRAPH_JSON,
        "--input", "in=/root/reference/data/heart_256.png",
        "--output", f"out={out_path}",
    ])
    assert rc == 0
    from PIL import Image as PILImage

    rendered = np.asarray(PILImage.open(out_path))
    golden = np.asarray(
        PILImage.open("/root/reference/data/test_compare/invert_graph_node_import.png")
    )
    assert rendered.shape == golden.shape

    # absolute pixel check against an INDEPENDENT render of the same graph
    # and input through the library API — a CLI that ignored --input or
    # saved the wrong slot would still produce a right-shaped PNG
    from kanter_core_tpu import NodeGraph as NG, SlotData, SlotImage, TextureProcessor
    from kanter_core_tpu.ops.image_io import read_slot_image

    with TextureProcessor(10_000_000) as tp:
        lg = tp.new_live_graph()
        graph = NG.from_path(INVERT_GRAPH_JSON)
        with lg.write() as g:
            g.set_node_graph(graph)
            (inp,) = graph.input_ids()
            si = read_slot_image("/root/reference/data/heart_256.png").as_type(False)
            g.add_input_slot_data(SlotData(inp, SlotId(0), si))
        (out_id,) = graph.output_ids()
        expected = TextureProcessor.buffer_rgba(lg, out_id, SlotId(0))
    assert np.array_equal(rendered.reshape(expected.shape), expected)

    # --tile-bytes forces the row-banded engine path; pixels must not change
    tiled_path = str(tmp_path / "cli_tiled.png")
    rc = main([
        "render", INVERT_GRAPH_JSON,
        "--input", "in=/root/reference/data/heart_256.png",
        "--output", f"out={tiled_path}",
        "--tile-bytes", "1",
    ])
    assert rc == 0
    assert np.array_equal(rendered, np.asarray(PILImage.open(tiled_path)))


def test_reset_node_states_and_edge_queries():
    """Coverage for small topology/state APIs the big tests use indirectly:
    reset_node_states (live_graph.rs:reset analog), edge_indices_slot,
    input_edges."""
    from kanter_core_tpu import NodeState, Side, TextureProcessor

    tp = TextureProcessor(1 << 30)
    lg = tp.new_live_graph()
    with lg.write() as g:
        a = g.add_node(Node(NodeType.Value(0.3)))
        b = g.add_node(Node(NodeType.Mix(MixType.ADD)))
        out = g.add_node(Node(NodeType.OutputGray("out")))
        g.connect(a, b, SlotId(0), SlotId(0))
        g.connect(a, b, SlotId(0), SlotId(1))
        g.connect(b, out, SlotId(0), SlotId(0))
    TextureProcessor.buffer_rgba(lg, out, SlotId(0))
    with lg.write() as g:
        assert g.node_state(out) == NodeState.CLEAN
        g.reset_node_states()
        assert g.node_state(a) == NodeState.DIRTY  # default state
        assert g.node_state(out) == NodeState.DIRTY

        ng = g.node_graph
        assert ng.edge_indices_slot(b, Side.INPUT, SlotId(0)) == [0]
        assert ng.edge_indices_slot(b, Side.INPUT, SlotId(1)) == [1]
        assert ng.edge_indices_slot(a, Side.OUTPUT, SlotId(0)) == [0, 1]
        assert [int(e.output_id) for e in ng.input_edges(b)] == [int(a), int(a)]
        assert ng.input_edges(a) == []
    # states reset to Dirty → a re-read re-evaluates and works
    pixels = TextureProcessor.buffer_rgba(lg, out, SlotId(0))
    assert pixels[0] == int(0.6 * 255)
    tp.shutdown_now()


def test_cli_error_paths(tmp_path):
    import pytest

    from kanter_core_tpu.__main__ import main

    # unknown input/output names exit 2 with a message, not a traceback
    assert (
        main(["render", INVERT_GRAPH_JSON, "--input", "nope=x.png"]) == 2
    )
    assert (
        main(["render", INVERT_GRAPH_JSON, "--output", "nope=" + str(tmp_path / "o.png")])
        == 2
    )
    # missing graph file raises the engine's error type
    from kanter_core_tpu.errors import ErrorKind, TexProError

    with pytest.raises((TexProError, OSError)):
        main(["info", str(tmp_path / "missing.json")])

    # malformed JSON → IO-kind TexProError (reference returns io::Result)
    bad = tmp_path / "bad.json"
    bad.write_text("{not json")
    with pytest.raises(TexProError) as exc_info:
        NodeGraph.from_path(str(bad))
    assert exc_info.value.kind == ErrorKind.IO


def test_cycle_connect_rejected(tex_pro):
    """Deliberate improvement: a cycle-creating connect raises InvalidEdge
    (the reference accepts it and then never finishes evaluating)."""
    import pytest

    from kanter_core_tpu.errors import ErrorKind, TexProError

    lg = tex_pro.new_live_graph()
    with lg.write() as g:
        a = g.add_node(Node(NodeType.Mix(MixType.ADD)))
        b = g.add_node(Node(NodeType.Mix(MixType.ADD)))
        c = g.add_node(Node(NodeType.Mix(MixType.ADD)))
        g.connect(a, b, SlotId(0), SlotId(0))
        g.connect(b, c, SlotId(0), SlotId(0))
        for bad in [(c, a), (b, a), (a, a)]:
            with pytest.raises(TexProError) as exc_info:
                g.connect(bad[0], bad[1], SlotId(0), SlotId(1))
            assert exc_info.value.kind == ErrorKind.INVALID_EDGE
        # legal re-wiring still works
        g.connect(a, c, SlotId(0), SlotId(1))


def test_cycle_try_connect_rejected():
    """try_connect inherits the cycle check via can_connect (ADVICE r1)."""
    graph = NodeGraph()
    a = graph.add_node(Node(NodeType.Mix(MixType.ADD)))
    b = graph.add_node(Node(NodeType.Mix(MixType.ADD)))
    graph.try_connect(a, b, SlotId(0), SlotId(0))
    with pytest.raises(TexProError) as exc_info:
        graph.try_connect(b, a, SlotId(0), SlotId(0))
    assert exc_info.value.kind == ErrorKind.INVALID_EDGE
    with pytest.raises(TexProError) as exc_info:
        graph.can_connect(b, a, SlotId(0), SlotId(1))
    assert exc_info.value.kind == ErrorKind.INVALID_EDGE
    assert len(graph.edges) == 1


def test_cyclic_graph_load_rejected(tmp_path, tex_pro):
    """A hand-edited cyclic graph JSON is rejected at load / set_node_graph
    instead of hanging the engine (ADVICE r1)."""
    graph = NodeGraph()
    a = graph.add_node(Node(NodeType.Mix(MixType.ADD)))
    b = graph.add_node(Node(NodeType.Mix(MixType.ADD)))
    graph.connect(a, b, SlotId(0), SlotId(0))
    data = graph.to_json()
    # hand-edit in the reverse edge, forming a 2-cycle
    back = dict(data["edges"][0])
    back["output_id"], back["input_id"] = back["input_id"], back["output_id"]
    back["input_slot"] = 1
    data["edges"].append(back)

    path = tmp_path / "cyclic.json"
    path.write_text(json.dumps(data))
    with pytest.raises(TexProError) as exc_info:
        NodeGraph.from_path(str(path))
    assert exc_info.value.kind == ErrorKind.INVALID_EDGE

    cyclic = NodeGraph.from_json(data)  # from_json itself stays permissive
    lg = tex_pro.new_live_graph()
    with lg.write() as g:
        with pytest.raises(TexProError) as exc_info:
            g.set_node_graph(cyclic)
        assert exc_info.value.kind == ErrorKind.INVALID_EDGE


def test_name_collision_u32_overflow():
    """Numeric suffix > u32::MAX resets to 0, mirroring Rust's failed
    `parse::<u32>()` (`node_graph.rs:141-164`): "x_4294967296" -> "x_0"."""
    dedup = NodeGraph._avoid_name_collision
    assert dedup(["x_4294967296"], "x_4294967296") == "x_0"
    # wrapping_add at exactly u32::MAX
    assert dedup(["x_4294967295"], "x_4294967295") == "x_0"
    assert dedup(["x_7"], "x_7") == "x_8"
    # empty numeric suffix: parse fails -> 0
    assert dedup(["x_"], "x_") == "x_0"
    # non-numeric suffix rebuilds from the head, dropping the suffix
    assert dedup(["foo_bar"], "foo_bar") == "foo_0"
    assert dedup(["plain"], "plain") == "plain_0"


def test_cli_value_requires_value_node(tmp_path, capsys):
    """CLI --value on a non-Value node exits 2 with an error (ADVICE r1)."""
    from kanter_core_tpu.__main__ import main

    graph = NodeGraph()
    v = graph.add_node(Node(NodeType.Value(0.2)))
    out = graph.add_node(Node(NodeType.OutputGray("out")))
    graph.connect(v, out, SlotId(0), SlotId(0))
    path = tmp_path / "g.json"
    graph.export_json(str(path))

    png = tmp_path / "o.png"
    rc = main(["render", str(path), "--value", f"{int(out)}=0.5",
               "--output", f"out={png}"])
    assert rc == 2
    assert "not a Value node" in capsys.readouterr().err
    # the happy path still renders
    rc = main(["render", str(path), "--value", f"{int(v)}=0.5",
               "--output", f"out={png}"])
    assert rc == 0 and png.exists()


def test_node_clone_owns_its_node_type():
    """`NodeGraph.node()` returns a clone (reference `Node: Clone` — the
    enum clones by VALUE); a shallow copy shared the NodeType object, so
    `node().node_type.set_name(...)` renamed the REAL node behind the dirty
    tracker, cloned engine snapshots could be mutated mid-flight by
    concurrent renames, and nested-Graph payloads leaked across clones."""
    g = NodeGraph()
    out = g.add_node(Node(NodeType.OutputGray("out")))
    g.node(out).node_type.set_name("hijacked")
    assert g.node(out).node_type.name() == "out"

    clone = g.clone()
    clone.rename_output_node(out, "renamed")
    assert g.node(out).node_type.name() == "out"

    # nested Graph payloads must not be shared either
    inner = NodeGraph()
    iv = inner.add_node(Node(NodeType.Value(0.5)))
    host = NodeGraph()
    sub = host.add_node(Node(NodeType.Graph(inner)))
    payload_via_clone = host.node(sub).node_type.payload
    assert payload_via_clone is not host._node_with_id_mut(sub).node_type.payload
    payload_via_clone._node_with_id_mut(iv).node_type = NodeType.Value(0.9)
    assert (
        host._node_with_id_mut(sub).node_type.payload._node_with_id_mut(iv)
        .node_type.payload == 0.5
    )


def test_validate_acyclic_recurses_and_rejects_dangling(tmp_path):
    """A cyclic NESTED subgraph or a dangling edge endpoint must fail at
    load (they used to pass silently and hang/crash evaluation later)."""
    import json as _json

    # cyclic inner graph inside a Graph node
    inner = NodeGraph()
    a = inner.add_node(Node(NodeType.Mix()))
    b = inner.add_node(Node(NodeType.Mix()))
    inner.connect(a, b, SlotId(0), SlotId(0))
    inner.edges.append(Edge(b, a, SlotId(0), SlotId(0)))  # forced cycle
    host = NodeGraph()
    host.add_node(Node(NodeType.Graph(inner)))
    with pytest.raises(TexProError):
        host.validate_acyclic()

    # dangling consumer: write JSON with an edge to a missing node id
    g = NodeGraph()
    v = g.add_node(Node(NodeType.Value(0.1)))
    o = g.add_node(Node(NodeType.OutputGray("o")))
    g.connect(v, o, SlotId(0), SlotId(0))
    data = g.to_json()
    data["edges"].append(
        {"output_id": int(v), "input_id": 999, "output_slot": 0, "input_slot": 0}
    )
    path = tmp_path / "dangling.json"
    path.write_text(_json.dumps(data))
    with pytest.raises(TexProError):
        NodeGraph.from_path(str(path))


def test_name_collision_rejects_unicode_digits_like_rust():
    """Rust's u32::parse accepts ASCII digits only; Python's int() parses
    Unicode decimals — 'a_٣' must dedup to 'a_0' (parse failure), not
    'a_4'."""
    assert NodeGraph._avoid_name_collision(["a_٣"], "a_٣") == "a_0"
    assert NodeGraph._avoid_name_collision(["a_3"], "a_3") == "a_4"


def test_serde_clamps_out_of_range_payloads():
    """ADVICE r4: payload caps (Blur sigma, AO radius, Noise octaves —
    r4 host-hang guards) are enforced with a hard TexProError on
    PROGRAMMATIC construction, but previously-saved graphs must still
    LOAD: the serde path clamps out-of-range / non-finite values into the
    accepted range instead of refusing the whole file."""
    from kanter_core_tpu.node import NodeType, NodeTypeKind

    # constructor: hard raise (unchanged)
    with pytest.raises(TexProError):
        NodeType.Blur(300.0)
    with pytest.raises(TexProError):
        NodeType.AmbientOcclusion(1.0, 1000.0)
    with pytest.raises(TexProError):
        NodeType.Noise(64, 64, octaves=99)

    # serde: clamp
    nt = NodeType.from_json({"Blur": 300.0})
    assert nt.kind == NodeTypeKind.BLUR and nt.payload == 256.0
    nt = NodeType.from_json({"Blur": float("nan")})
    assert nt.payload == 1.0  # non-finite -> default
    nt = NodeType.from_json(
        {"AmbientOcclusion": {"strength": 1.0, "radius": 1000.0}}
    )
    assert nt.payload == (1.0, 64.0)
    nt = NodeType.from_json({"Noise": {
        "width": 64, "height": 64, "cells": 8, "octaves": 99,
        "seed": 0, "persistence": 0.5,
    }})
    assert nt.payload[3] == 24
    # in-range payloads round-trip untouched
    nt = NodeType.from_json({"Blur": 2.5})
    assert nt.payload == 2.5
