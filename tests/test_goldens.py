"""Golden-image (bit-exact) tests.

Ports the dominant test pattern of the reference suite
(`/root/reference/tests/integration_tests.rs:951-989` `save_and_compare`):
render through the live engine, export u8, compare byte-for-byte against the
PNGs committed under the reference's `data/test_compare/`.
"""

import numpy as np
import pytest

from conftest import (
    CLOUDS,
    HEART_110,
    HEART_128,
    IMAGE_1,
    IMAGE_2,
    INVERT_GRAPH_JSON,
    assert_matches_golden,
    render_u8,
)

from kanter_core_tpu import (
    EmbeddedSlotDataId,
    MixType,
    Node,
    NodeGraph,
    NodeType,
    ResizePolicy,
    Size,
    SlotId,
    TextureProcessor,
)


def build_mix_gray(tex_pro, mix_type):
    lg = tex_pro.new_live_graph()
    with lg.write() as g:
        image_node = g.add_node(Node(NodeType.Image(IMAGE_2)))
        separate_node = g.add_node(Node(NodeType.SeparateRgba()))
        mix_node = g.add_node(Node(NodeType.Mix(mix_type)))
        output_node = g.add_node(Node(NodeType.OutputGray("out")))
        g.connect(image_node, separate_node, SlotId(0), SlotId(0))
        g.connect(separate_node, mix_node, SlotId(0), SlotId(0))
        g.connect(separate_node, mix_node, SlotId(1), SlotId(1))
        g.connect(mix_node, output_node, SlotId(0), SlotId(0))
    return lg, output_node


def build_mix_rgba(tex_pro, mix_type):
    lg = tex_pro.new_live_graph()
    with lg.write() as g:
        image_node_1 = g.add_node(Node(NodeType.Image(IMAGE_1)))
        image_node_2 = g.add_node(Node(NodeType.Image(IMAGE_2)))
        mix_node = g.add_node(Node(NodeType.Mix(mix_type)))
        output_node = g.add_node(Node(NodeType.OutputRgba("out")))
        g.connect(image_node_1, mix_node, SlotId(0), SlotId(0))
        g.connect(image_node_2, mix_node, SlotId(0), SlotId(1))
        g.connect(mix_node, output_node, SlotId(0), SlotId(0))
    return lg, output_node


@pytest.mark.parametrize(
    "mix_type,name",
    [
        (MixType.ADD, "add_node_gray.png"),
        (MixType.SUBTRACT, "subtract_node_gray.png"),
        (MixType.MULTIPLY, "multiply_node_gray.png"),
        (MixType.DIVIDE, "divide_node_gray.png"),
        (MixType.POW, "pow_node_gray.png"),
    ],
)
def test_mix_node_gray(tex_pro, mix_type, name):
    lg, out = build_mix_gray(tex_pro, mix_type)
    assert_matches_golden(lg, out, name)


@pytest.mark.parametrize(
    "mix_type,name",
    [
        (MixType.ADD, "add_node_rgba.png"),
        (MixType.SUBTRACT, "subtract_node_rgba.png"),
        (MixType.MULTIPLY, "multiply_node_rgba.png"),
        (MixType.DIVIDE, "divide_node_rgba.png"),
        (MixType.POW, "pow_node_rgba.png"),
    ],
)
def test_mix_node_rgba(tex_pro, mix_type, name):
    lg, out = build_mix_rgba(tex_pro, mix_type)
    assert_matches_golden(lg, out, name)


def test_input_output(tex_pro):
    """Image → Output roundtrips the file bit-exactly (`:51-95`)."""
    from PIL import Image as PILImage

    lg = tex_pro.new_live_graph()
    with lg.write() as g:
        input_node = g.add_node(Node(NodeType.Image(IMAGE_2)))
        output_node = g.add_node(Node(NodeType.OutputRgba("out")))
        g.connect(input_node, output_node, SlotId(0), SlotId(0))
    data = render_u8(lg, output_node)
    orig = np.asarray(PILImage.open(IMAGE_2).convert("RGBA"))
    assert np.array_equal(data.reshape(orig.shape), orig)


def test_mix_node_single_input(tex_pro):
    lg = tex_pro.new_live_graph()
    with lg.write() as g:
        value_node = g.add_node(Node(NodeType.Image(IMAGE_2)))
        mix_node = g.add_node(Node(NodeType.Mix(MixType.ADD)))
        output_node = g.add_node(Node(NodeType.OutputGray("out")))
        g.connect(value_node, mix_node, SlotId(0), SlotId(0))
        g.connect(mix_node, output_node, SlotId(0), SlotId(0))
    assert_matches_golden(lg, output_node, "mix_node_single_input.png")


def test_mix_node_single_input_2(tex_pro):
    """Only the right input connected: left defaults to 0.0 (`:527-553`)."""
    lg = tex_pro.new_live_graph()
    with lg.write() as g:
        value_node = g.add_node(Node(NodeType.Image(IMAGE_2)))
        mix_node = g.add_node(Node(NodeType.Mix(MixType.SUBTRACT)))
        output_node = g.add_node(Node(NodeType.OutputGray("out")))
        g.connect(value_node, mix_node, SlotId(0), SlotId(1))
        g.connect(mix_node, output_node, SlotId(0), SlotId(0))
    assert_matches_golden(lg, output_node, "mix_node_single_input_2.png")


def test_separate_combine(tex_pro):
    """Channel shuffle across two images (`:620-674`, golden mix_images)."""
    lg = tex_pro.new_live_graph()
    with lg.write() as g:
        input_1 = g.add_node(Node(NodeType.Image(IMAGE_1)))
        separate_1 = g.add_node(Node(NodeType.SeparateRgba()))
        input_2 = g.add_node(Node(NodeType.Image(IMAGE_2)))
        separate_2 = g.add_node(Node(NodeType.SeparateRgba()))
        output_node = g.add_node(Node(NodeType.OutputRgba("out")))
        combine = g.add_node(Node(NodeType.CombineRgba()))
        g.connect(input_1, separate_1, SlotId(0), SlotId(0))
        g.connect(input_2, separate_2, SlotId(0), SlotId(0))
        g.connect(separate_1, combine, SlotId(3), SlotId(0))
        g.connect(separate_1, combine, SlotId(1), SlotId(1))
        g.connect(separate_2, combine, SlotId(2), SlotId(2))
        g.connect(separate_2, combine, SlotId(3), SlotId(3))
        g.connect(combine, output_node, SlotId(0), SlotId(0))
    assert_matches_golden(lg, output_node, "mix_images.png")


def test_irregular_sizes(tex_pro):
    """128² + 110² mixed under MostPixels: 110² is Triangle-resampled to 128²
    — the decisive resampler bit-exactness test (`:676-738`)."""
    lg = tex_pro.new_live_graph()
    with lg.write() as g:
        input_1 = g.add_node(Node(NodeType.Image(HEART_128)))
        input_2 = g.add_node(Node(NodeType.Image(HEART_110)))
        mix = g.add_node(Node(NodeType.Mix()))
        output_node = g.add_node(Node(NodeType.OutputRgba("out")))
        g.connect(input_1, mix, SlotId(0), SlotId(0))
        g.connect(input_2, mix, SlotId(0), SlotId(1))
        g.connect(mix, output_node, SlotId(0), SlotId(0))
    assert_matches_golden(lg, output_node, "irregular_sizes.png")


def test_value_node(tex_pro):
    """Four 1×1 Value nodes upscaled to 256² through CombineRgba (`:812-846`)."""
    lg = tex_pro.new_live_graph()
    with lg.write() as g:
        nodes = [g.add_node(Node(NodeType.Value(v))) for v in (0.0, 0.33, 0.66, 1.0)]
        combine = Node(NodeType.CombineRgba())
        combine.resize_policy = ResizePolicy.SpecificSize(Size(256, 256))
        combine_node = g.add_node(combine)
        for i, node_id in enumerate(nodes):
            g.connect(node_id, combine_node, SlotId(0), SlotId(i))
    assert_matches_golden(lg, combine_node, "value_node.png")


def test_height_to_normal_node(tex_pro):
    lg = tex_pro.new_live_graph()
    with lg.write() as g:
        input_node = g.add_node(Node(NodeType.Image(CLOUDS)))
        separate_node = g.add_node(Node(NodeType.SeparateRgba()))
        h2n_node = g.add_node(Node(NodeType.HeightToNormal()))
        output_node = g.add_node(Node(NodeType.OutputRgba("out")))
        g.connect(input_node, separate_node, SlotId(0), SlotId(0))
        g.connect(separate_node, h2n_node, SlotId(0), SlotId(0))
        g.connect(h2n_node, output_node, SlotId(0), SlotId(0))
    assert_matches_golden(lg, output_node, "height_to_normal_node.png")


def test_embedded_node_data(tex_pro):
    """SlotData transferred between live graphs via Embed (`:567-617`)."""
    lg_embed = tex_pro.new_live_graph()
    with lg_embed.write() as g:
        input_node = g.add_node(Node(NodeType.Image(IMAGE_1)))
        output_node = g.add_node(Node(NodeType.OutputRgba("out")))
        g.connect(input_node, output_node, SlotId(0), SlotId(0))
    from kanter_core_tpu import LiveGraph

    with LiveGraph.await_clean_read(lg_embed, output_node) as g:
        slot_data = g.slot_data(output_node, SlotId(0))

    lg_out = tex_pro.new_live_graph()
    with lg_out.write() as g:
        output_node_out = g.add_node(Node(NodeType.OutputRgba("out")))
        esd_id = g.embed_slot_data_with_id(slot_data, EmbeddedSlotDataId(0))
        embed_node = g.add_node(Node(NodeType.Embed(esd_id)))
        g.connect(embed_node, output_node_out, SlotId(0), SlotId(0))
    assert_matches_golden(lg_out, output_node_out, "embedded_node_data.png")


def _build_invert_graph() -> NodeGraph:
    invert_graph = NodeGraph()
    white = invert_graph.add_node(Node(NodeType.Value(1.0)))
    inp = invert_graph.add_node(Node(NodeType.InputGray("in")))
    sub = invert_graph.add_node(Node(NodeType.Mix(MixType.SUBTRACT)))
    out = invert_graph.add_node(Node(NodeType.OutputGray("out")))
    invert_graph.connect(white, sub, SlotId(0), SlotId(0))
    invert_graph.connect(inp, sub, SlotId(0), SlotId(1))
    invert_graph.connect(sub, out, SlotId(0), SlotId(0))
    return invert_graph


def _run_invert_graph(tex_pro, invert_graph, golden_name):
    in_slot = invert_graph.input_slot_id_with_name("in")
    out_slot = invert_graph.output_slot_id_with_name("out")
    lg = tex_pro.new_live_graph()
    with lg.write() as g:
        image_node = g.add_node(Node(NodeType.Image(IMAGE_2)))
        separate_node = g.add_node(Node(NodeType.SeparateRgba()))
        graph_node = g.add_node(Node(NodeType.Graph(invert_graph)))
        output_node = g.add_node(Node(NodeType.OutputGray("out")))
        g.connect(image_node, separate_node, SlotId(0), SlotId(0))
        g.connect(separate_node, graph_node, SlotId(0), in_slot)
        g.connect(graph_node, output_node, out_slot, SlotId(0))
    assert_matches_golden(lg, output_node, golden_name)


def test_invert_graph_node(tex_pro):
    _run_invert_graph(tex_pro, _build_invert_graph(), "invert_graph_node.png")


def test_invert_graph_node_import(tex_pro):
    _run_invert_graph(
        tex_pro, NodeGraph.from_path(INVERT_GRAPH_JSON), "invert_graph_node_import.png"
    )


def test_invert_graph_node_export(tmp_path, tex_pro):
    """Export → import → render matches the same golden (`:1073-1160`)."""
    path = str(tmp_path / "invert_graph.json")
    _build_invert_graph().export_json(path)
    _run_invert_graph(tex_pro, NodeGraph.from_path(path), "invert_graph_node.png")


def test_graph_node_rgba(tex_pro):
    """RGBA passthrough subgraph (`:1207-1261`)."""
    nested = NodeGraph()
    nin = nested.add_node(Node(NodeType.InputRgba("in")))
    nout = nested.add_node(Node(NodeType.OutputRgba("out")))
    nested.connect(nin, nout, SlotId(0), SlotId(0))
    in_slot = nested.input_slot_id_with_name("in")
    out_slot = nested.output_slot_id_with_name("out")

    lg = tex_pro.new_live_graph()
    with lg.write() as g:
        input_node = g.add_node(Node(NodeType.Image(IMAGE_2)))
        graph_node = g.add_node(Node(NodeType.Graph(nested)))
        output_node = g.add_node(Node(NodeType.OutputRgba("out")))
        g.connect(input_node, graph_node, SlotId(0), in_slot)
        g.connect(graph_node, output_node, out_slot, SlotId(0))
    assert_matches_golden(lg, output_node, "graph_node_rgba.png")


def test_graph_node_gray(tex_pro):
    """Gray passthrough subgraph (`:1264-1328`)."""
    nested = NodeGraph()
    nin = nested.add_node(Node(NodeType.InputGray("in")))
    nout = nested.add_node(Node(NodeType.OutputGray("out")))
    nested.connect(nin, nout, SlotId(0), SlotId(0))
    in_slot = nested.input_slot_id_with_name("in")
    out_slot = nested.output_slot_id_with_name("out")

    lg = tex_pro.new_live_graph()
    with lg.write() as g:
        input_node = g.add_node(Node(NodeType.Image(IMAGE_2)))
        separate_node = g.add_node(Node(NodeType.SeparateRgba()))
        graph_node = g.add_node(Node(NodeType.Graph(nested)))
        output_node = g.add_node(Node(NodeType.OutputGray("out")))
        g.connect(input_node, separate_node, SlotId(0), SlotId(0))
        g.connect(separate_node, graph_node, SlotId(0), in_slot)
        g.connect(graph_node, output_node, out_slot, SlotId(0))
    assert_matches_golden(lg, output_node, "graph_node_gray.png")


def test_write_node(tmp_path, tex_pro):
    """Write saves RGBA8 PNG; reloading it reproduces the source image."""
    from PIL import Image as PILImage

    out_path = str(tmp_path / "written.png")
    lg = tex_pro.new_live_graph()
    with lg.write() as g:
        input_node = g.add_node(Node(NodeType.Image(IMAGE_1)))
        write_node = g.add_node(Node(NodeType.Write(out_path)))
        g.connect(input_node, write_node, SlotId(0), SlotId(0))
        g.auto_update = True

    import time

    deadline = time.time() + 30
    while time.time() < deadline:
        try:
            written = np.asarray(PILImage.open(out_path).convert("RGBA"))
            break
        except Exception:
            time.sleep(0.05)
    else:
        raise AssertionError("Write node never produced a file")
    orig = np.asarray(PILImage.open(IMAGE_1).convert("RGBA"))
    assert np.array_equal(written, orig)


def test_triple_nested_graph(tex_pro):
    """Graphs in graphs in graphs: three inversion levels compose to a single
    inversion (invert∘invert∘invert) and match the invert golden."""
    from kanter_core_tpu.graphs import invert_graph

    def wrap(inner: NodeGraph) -> NodeGraph:
        outer = NodeGraph()
        inp = outer.add_node(Node(NodeType.InputGray("in")))
        gnode = outer.add_node(Node(NodeType.Graph(inner)))
        out = outer.add_node(Node(NodeType.OutputGray("out")))
        outer.connect(inp, gnode, SlotId(0), inner.input_slot_id_with_name("in"))
        outer.connect(gnode, out, inner.output_slot_id_with_name("out"), SlotId(0))
        return outer

    level1 = invert_graph()
    level2 = wrap(level1)

    # level3 = invert(level2(level1-ish...)): chain three inverts
    level3 = NodeGraph()
    inp = level3.add_node(Node(NodeType.InputGray("in")))
    g_a = level3.add_node(Node(NodeType.Graph(level2)))
    g_b = level3.add_node(Node(NodeType.Graph(invert_graph())))
    g_c = level3.add_node(Node(NodeType.Graph(invert_graph())))
    out = level3.add_node(Node(NodeType.OutputGray("out")))
    level3.connect(inp, g_a, SlotId(0), level2.input_slot_id_with_name("in"))
    level3.connect(g_a, g_b, level2.output_slot_id_with_name("out"),
                   invert_graph().input_slot_id_with_name("in"))
    level3.connect(g_b, g_c, invert_graph().output_slot_id_with_name("out"),
                   invert_graph().input_slot_id_with_name("in"))
    level3.connect(g_c, out, invert_graph().output_slot_id_with_name("out"), SlotId(0))

    lg = tex_pro.new_live_graph()
    with lg.write() as g:
        image_node = g.add_node(Node(NodeType.Image(IMAGE_2)))
        separate_node = g.add_node(Node(NodeType.SeparateRgba()))
        graph_node = g.add_node(Node(NodeType.Graph(level3)))
        output_node = g.add_node(Node(NodeType.OutputGray("out")))
        g.connect(image_node, separate_node, SlotId(0), SlotId(0))
        g.connect(separate_node, graph_node, SlotId(0), level3.input_slot_id_with_name("in"))
        g.connect(graph_node, output_node, level3.output_slot_id_with_name("out"), SlotId(0))
    # three inversions == one inversion
    assert_matches_golden(lg, output_node, "invert_graph_node.png")
