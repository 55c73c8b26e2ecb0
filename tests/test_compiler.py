"""Fused whole-graph compiler tests: parity with the eager engine, program
caching, and argument re-binding."""

import numpy as np

from conftest import IMAGE_1, IMAGE_2, INVERT_GRAPH_JSON, golden

from kanter_core_tpu import (
    MixType,
    Node,
    NodeGraph,
    NodeType,
    NodeTypeKind,
    SlotId,
)
from kanter_core_tpu.compiler import CompiledGraph, compile_graph


def _invert_main_graph():
    ig = NodeGraph.from_path(INVERT_GRAPH_JSON)
    main = NodeGraph()
    img = main.add_node(Node(NodeType.Image(IMAGE_2)))
    sep = main.add_node(Node(NodeType.SeparateRgba()))
    gn = main.add_node(Node(NodeType.Graph(ig)))
    out = main.add_node(Node(NodeType.OutputGray("out")))
    main.connect(img, sep, SlotId(0), SlotId(0))
    main.connect(sep, gn, SlotId(0), ig.input_slot_id_with_name("in"))
    main.connect(gn, out, ig.output_slot_id_with_name("out"), SlotId(0))
    return main, ig, gn, out


def test_fused_matches_golden():
    main, _, _, out = _invert_main_graph()
    prog = compile_graph(main, include_u8=True)
    u8 = np.asarray(prog()[(out, SlotId(0))])
    ref = golden("invert_graph_node_import.png")
    assert np.array_equal(u8.reshape(ref.shape), ref)


def test_program_cache_hit():
    main, _, _, _ = _invert_main_graph()
    assert compile_graph(main) is compile_graph(main)


def test_value_rebind_without_recompile():
    main, ig, gn, out = _invert_main_graph()
    prog = compile_graph(main, include_u8=True)
    base = np.asarray(prog()[(out, SlotId(0))])
    inner_value = next(
        n.node_id for n in ig.nodes if n.node_type.kind == NodeTypeKind.VALUE
    )
    key = f"g{int(gn)}_value_{int(inner_value)}"
    half = np.asarray(prog(**{key: np.float32(0.5)})[(out, SlotId(0))])
    assert not np.array_equal(base, half)
    again = np.asarray(prog()[(out, SlotId(0))])
    assert np.array_equal(base, again)


def test_fused_matches_engine_mix(tex_pro):
    """The fused program and the eager per-node engine produce identical
    pixels for a multi-op graph with resizing."""
    from conftest import render_u8

    graph = NodeGraph()
    i1 = graph.add_node(Node(NodeType.Image(IMAGE_1)))
    i2 = graph.add_node(Node(NodeType.Image(IMAGE_2)))
    mul = graph.add_node(Node(NodeType.Mix(MixType.MULTIPLY)))
    val = graph.add_node(Node(NodeType.Value(0.25)))
    add = graph.add_node(Node(NodeType.Mix(MixType.ADD)))
    out = graph.add_node(Node(NodeType.OutputRgba("out")))
    graph.connect(i1, mul, SlotId(0), SlotId(0))
    graph.connect(i2, mul, SlotId(0), SlotId(1))
    graph.connect(mul, add, SlotId(0), SlotId(0))
    graph.connect(val, add, SlotId(0), SlotId(1))
    graph.connect(add, out, SlotId(0), SlotId(0))

    prog = CompiledGraph(graph, targets=[(out, SlotId(0))], include_u8=True)
    fused = np.asarray(prog()[(out, SlotId(0))]).reshape(-1)

    lg = tex_pro.new_live_graph()
    with lg.write() as g:
        g.set_node_graph(graph.clone())
    eager = render_u8(lg, out)
    assert np.array_equal(fused, eager)


def test_batched_graph_vmap():
    """BatchedGraph evaluates B canvases in one fused, vmapped program."""
    from kanter_core_tpu.parallel import BatchedGraph

    graph = NodeGraph()
    gin = graph.add_node(Node(NodeType.InputGray("in")))
    val = graph.add_node(Node(NodeType.Value(1.0)))
    sub = graph.add_node(Node(NodeType.Mix(MixType.SUBTRACT)))
    out = graph.add_node(Node(NodeType.OutputGray("out")))
    graph.connect(val, sub, SlotId(0), SlotId(0))
    graph.connect(gin, sub, SlotId(0), SlotId(1))
    graph.connect(sub, out, SlotId(0), SlotId(0))

    key = f"input_{int(gin)}"
    bg = BatchedGraph(graph, batch_keys={key}, targets=[(out, SlotId(0))])
    batch = np.random.default_rng(0).random((4, 32, 32), dtype=np.float32)
    result = bg(**{key: (batch,)})
    plane = np.asarray(result[(out, SlotId(0))][0])
    assert plane.shape == (4, 32, 32)
    assert np.allclose(plane, 1.0 - batch)


def test_sharded_batch_eval():
    """DP over an 8-device CPU mesh: outputs keep the batch sharding."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    from kanter_core_tpu.parallel import BatchedGraph, make_mesh

    if len(jax.devices()) < 8:
        import pytest

        pytest.skip("needs 8 virtual devices")

    graph = NodeGraph()
    gin = graph.add_node(Node(NodeType.InputGray("in")))
    val = graph.add_node(Node(NodeType.Value(1.0)))
    sub = graph.add_node(Node(NodeType.Mix(MixType.SUBTRACT)))
    out = graph.add_node(Node(NodeType.OutputGray("out")))
    graph.connect(val, sub, SlotId(0), SlotId(0))
    graph.connect(gin, sub, SlotId(0), SlotId(1))
    graph.connect(sub, out, SlotId(0), SlotId(0))

    mesh = make_mesh(8)
    key = f"input_{int(gin)}"
    bg = BatchedGraph(graph, batch_keys={key}, targets=[(out, SlotId(0))], mesh=mesh)
    batch = np.random.default_rng(0).random((8, 32, 32), dtype=np.float32)
    sharded = bg.shard_batch_arg(batch)
    result = bg(**{key: (sharded,)})
    plane = result[(out, SlotId(0))][0]
    assert plane.shape == (8, 32, 32)
    assert np.allclose(np.asarray(plane), 1.0 - batch)
    # output stays sharded over the batch axis
    assert "batch" in str(plane.sharding)


def test_dryrun_multichip():
    import sys

    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)


def test_value_edit_reuses_fused_program(tex_pro):
    """Dragging a Value slider must re-run the cached fused program, never
    retrace/recompile (fingerprint normalizes Value constants)."""
    from conftest import render_u8

    lg = tex_pro.new_live_graph()
    with lg.write() as g:
        val = g.add_node(Node(NodeType.Value(0.25)))
        comb = g.add_node(Node(NodeType.CombineRgba()))
        out = g.add_node(Node(NodeType.OutputRgba("out")))
        g.connect(val, comb, SlotId(0), SlotId(0))
        g.connect(comb, out, SlotId(0), SlotId(0))

    assert render_u8(lg, out).tolist() == [63, 0, 0, 255]

    for value, red in [(0.5, 127), (1.0, 255), (0.75, 191)]:
        with lg.write() as g:
            node = g.node_mut(val)  # marks dirty + cancels, like the reference
            node.node_type = NodeType.Value(value)
        assert render_u8(lg, out).tolist() == [red, 0, 0, 255]

    assert len(tex_pro.engine._fused_programs) == 1, "value edits must not recompile"


def test_row_sharded_h2n_halo():
    """Spatial TP: a row-sharded HeightToNormal (wrap stencil) must match the
    unsharded result — XLA GSPMD inserts the halo exchange for jnp.roll."""
    import jax
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    if len(jax.devices()) < 8:
        import pytest

        pytest.skip("needs 8 virtual devices")

    from kanter_core_tpu.ops.height_to_normal import _h2n_jnp

    h = np.random.default_rng(7).random((64, 128), dtype=np.float32)
    ref = [np.asarray(p) for p in jax.jit(_h2n_jnp)(h)]

    mesh = Mesh(np.asarray(jax.devices()[:8]), ("rows",))
    sharded = jax.device_put(h, NamedSharding(mesh, P("rows", None)))
    out = jax.jit(_h2n_jnp)(sharded)
    for i in range(4):
        assert np.array_equal(ref[i], np.asarray(out[i])), f"plane {i}"
    assert "rows" in str(out[0].sharding)
