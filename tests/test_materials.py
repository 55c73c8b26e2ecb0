"""Material pipeline templates (`models.materials`)."""

import numpy as np

from kanter_core_tpu import (
    NodeGraph,
    SlotData,
    SlotId,
    SlotImage,
    TextureProcessor,
)
from kanter_core_tpu.models import (
    ambient_occlusion_graph,
    emboss_graph,
    pbr_material_graph,
)


def _height_plane(n=64, seed=0):
    rng = np.random.default_rng(seed)
    base = rng.random((n, n), dtype=np.float32)
    # smooth it a bit so AO cavities are meaningful
    return ((base + np.roll(base, 1, 0) + np.roll(base, 1, 1)) / 3.0).astype(np.float32)


def _evaluate(graph: NodeGraph, fused: bool = True):
    tp = TextureProcessor(10_000_000)
    try:
        lg = tp.new_live_graph()
        with lg.write() as g:
            g.fuse_subgraphs = fused
            g.set_node_graph(graph)
            (inp,) = [n for n in g.node_graph.nodes if "Input" in n.node_type.kind.value]
            g.add_input_slot_data(
                SlotData(inp.node_id, SlotId(0), SlotImage.Gray(_height_plane()))
            )
        outs = {}
        for out_id in lg.node_graph.output_ids():
            name = lg.node_graph.node(out_id).node_type.payload
            outs[name] = np.asarray(TextureProcessor.buffer_rgba(lg, out_id, SlotId(0)))
        return outs
    finally:
        tp.shutdown_now()


def test_pbr_material_all_outputs():
    outs = _evaluate(pbr_material_graph())
    assert set(outs) == {"normal", "ao", "roughness", "albedo"}
    n = 64 * 64 * 4
    for name, px in outs.items():
        assert px.shape == (n,), name
    # normal maps: x/y center on 0.5, z biased positive (toward the viewer)
    normal = outs["normal"].reshape(64, 64, 4)
    assert 110 < normal[..., 0].mean() < 145, "normal x should center on 0.5"
    assert 110 < normal[..., 1].mean() < 145, "normal y should center on 0.5"
    assert normal[..., 2].mean() > 140, "normal z should bias positive"
    assert normal[..., 3].min() == 255, "alpha forced to 1"
    # ao is mostly white with darker cavities
    ao = outs["ao"].reshape(64, 64, 4)[..., 0]
    assert ao.mean() > 128
    # roughness stays in its configured band (base=0.35, cavity up to +0.5)
    rough = outs["roughness"].reshape(64, 64, 4)[..., 0]
    assert 0.1 * 255 < rough.mean() < 0.8 * 255


def test_pbr_material_fused_matches_pernode():
    fused = _evaluate(pbr_material_graph(), fused=True)
    pernode = _evaluate(pbr_material_graph(), fused=False)
    for name in fused:
        assert np.array_equal(fused[name], pernode[name]), name


def test_ambient_occlusion_darkens_cavities():
    outs = _evaluate(ambient_occlusion_graph(sigma=3.0, strength=1.0))
    ao = outs["ao"].reshape(64, 64, 4)[..., 0]
    # strength=1 with a rough height must produce real cavity darkening
    assert ao.min() < 250 and ao.mean() > 128


def test_emboss_centers_on_mid_gray():
    outs = _evaluate(emboss_graph(strength=0.6))
    emboss = outs["emboss"].reshape(64, 64, 4)[..., 0].astype(np.float64)
    assert abs(emboss.mean() - 127.5) < 12.0


def test_material_as_nested_graph_node():
    """The material pipeline embeds as a `Graph` node: the outer graph wires
    a height source into it and reads each named output through the node's
    output slots — multi-output nested graphs through the real engine."""
    from kanter_core_tpu import Node, NodeType

    inner = pbr_material_graph()
    outer = NodeGraph()
    gray = _height_plane(32)
    gin = outer.add_node(Node(NodeType.InputGray("height")))
    material = outer.add_node(Node(NodeType.Graph(inner)))
    outer.connect(gin, material, SlotId(0), inner.input_slot_id_with_name("height"))
    outs = {}
    for name in ("normal", "ao", "roughness", "albedo"):
        out_kind = NodeType.OutputRgba(name) if name in ("normal", "albedo") else NodeType.OutputGray(name)
        oid = outer.add_node(Node(out_kind))
        outer.connect(material, oid, inner.output_slot_id_with_name(name), SlotId(0))
        outs[name] = oid

    tp = TextureProcessor(10_000_000)
    try:
        lg = tp.new_live_graph()
        with lg.write() as g:
            g.set_node_graph(outer)
            g.add_input_slot_data(SlotData(gin, SlotId(0), SlotImage.Gray(gray)))
        nested = {
            name: np.asarray(TextureProcessor.buffer_rgba(lg, oid, SlotId(0)))
            for name, oid in outs.items()
        }
    finally:
        tp.shutdown_now()

    # must match evaluating the material graph directly
    direct_tp = TextureProcessor(10_000_000)
    try:
        lg = direct_tp.new_live_graph()
        with lg.write() as g:
            g.set_node_graph(pbr_material_graph())
            (inp,) = [
                n for n in g.node_graph.nodes if "Input" in n.node_type.kind.value
            ]
            g.add_input_slot_data(SlotData(inp.node_id, SlotId(0), SlotImage.Gray(gray)))
        for oid in lg.node_graph.output_ids():
            name = lg.node_graph.node(oid).node_type.payload
            direct = np.asarray(TextureProcessor.buffer_rgba(lg, oid, SlotId(0)))
            assert np.array_equal(nested[name], direct), name
    finally:
        direct_tp.shutdown_now()


def test_material_graph_serde_round_trip():
    """Material pipelines (incl. the extension Blur node) survive JSON
    round-trips byte-identically, so they checkpoint/share like any graph."""
    graph = pbr_material_graph()
    clone = NodeGraph.from_json(graph.to_json())
    assert graph.to_json() == clone.to_json()
    a = _evaluate(graph)
    b = _evaluate(clone)
    for name in a:
        assert np.array_equal(a[name], b[name]), name


def test_materials_tiled_matches_dense():
    """The material graph is tileable (mix/blur/h2n/combine only): the
    row-banded engine path must reproduce it bit-for-bit."""
    results = {}
    for tile_bytes in (None, 1):
        tp = TextureProcessor(10_000_000, tile_bytes=tile_bytes)
        try:
            lg = tp.new_live_graph()
            with lg.write() as g:
                g.set_node_graph(pbr_material_graph())
                (inp,) = [
                    n for n in g.node_graph.nodes if "Input" in n.node_type.kind.value
                ]
                g.add_input_slot_data(
                    SlotData(inp.node_id, SlotId(0), SlotImage.Gray(_height_plane()))
                )
            outs = {}
            for out_id in lg.node_graph.output_ids():
                name = lg.node_graph.node(out_id).node_type.payload
                outs[name] = np.asarray(
                    TextureProcessor.buffer_rgba(lg, out_id, SlotId(0))
                )
            results[tile_bytes] = outs
            if tile_bytes is not None:
                # the banded path must actually have run, or this compares
                # dense against dense
                assert len(tp.engine._tiled_programs) >= 1
                assert len(tp.engine._fused_programs) == 0
        finally:
            tp.shutdown_now()
    for name in results[None]:
        assert np.array_equal(results[None][name], results[1][name]), name


def _evaluate_procedural(graph: NodeGraph, fused: bool = True, tile_bytes=None):
    """Evaluate a ZERO-input material template through the engine."""
    tp = TextureProcessor(50_000_000, tile_bytes=tile_bytes)
    try:
        lg = tp.new_live_graph()
        with lg.write() as g:
            g.fuse_subgraphs = fused
            g.set_node_graph(graph)
        outs = {}
        for out_id in lg.node_graph.output_ids():
            name = lg.node_graph.node(out_id).node_type.payload
            outs[name] = np.asarray(TextureProcessor.buffer_rgba(lg, out_id, SlotId(0)))
        return outs
    finally:
        tp.shutdown_now()


def test_wood_material_outputs():
    from kanter_core_tpu.models import wood_material_graph

    outs = _evaluate_procedural(wood_material_graph(size=64))
    assert set(outs) == {"albedo", "height", "normal", "roughness"}
    h = outs["height"].reshape(64, 64, 4)[..., 0]
    assert len(np.unique(h)) > 40, "height must be a rich field, not flat"
    albedo = outs["albedo"].reshape(64, 64, 4)
    # wood tones: red channel dominates blue everywhere on the ramp
    assert (albedo[..., 0].astype(int) >= albedo[..., 2].astype(int)).mean() > 0.99
    normal = outs["normal"].reshape(64, 64, 4)
    assert normal[..., 2].mean() > 140, "normal z biases toward viewer"
    # roughness uses the INVERTING Levels remap: bounded to [0.45, 0.85]
    rough = outs["roughness"].reshape(64, 64, 4)[..., 0]
    assert 0.40 * 255 <= rough.min() and rough.max() <= 0.90 * 255


def test_stone_material_outputs():
    from kanter_core_tpu.models import stone_material_graph

    outs = _evaluate_procedural(stone_material_graph(size=64))
    assert set(outs) == {"albedo", "height", "normal", "roughness", "ao"}
    ao = outs["ao"].reshape(64, 64, 4)[..., 0]
    assert ao.mean() > 200 and ao.min() < 250, "mostly lit with real cavities"
    # near-neutral stone: albedo channel means within a tight band
    albedo = outs["albedo"].reshape(64, 64, 4).astype(np.float64)
    means = [albedo[..., c].mean() for c in range(3)]
    assert max(means) - min(means) < 12.0


def test_stone_material_ramp_vignette():
    """The optional vignette wires a radial Ramp into the albedo path:
    corners darken relative to the un-vignetted template, the center is
    untouched (ramp ≈ 0 there), and vignette=0 keeps the historical
    topology (no Ramp node added)."""
    from kanter_core_tpu.models import stone_material_graph
    from kanter_core_tpu.node import NodeTypeKind

    plain_graph = stone_material_graph(size=64)
    assert not any(
        n.node_type.kind == NodeTypeKind.RAMP for n in plain_graph.nodes
    )
    plain = _evaluate_procedural(plain_graph)["albedo"].reshape(64, 64, 4)
    vig = _evaluate_procedural(
        stone_material_graph(size=64, vignette=0.8)
    )["albedo"].reshape(64, 64, 4)
    # corners darker than the plain render; center essentially unchanged
    assert int(vig[0, 0, 0]) < int(plain[0, 0, 0])
    assert int(vig[-1, -1, 0]) < int(plain[-1, -1, 0])
    assert abs(int(vig[32, 32, 0]) - int(plain[32, 32, 0])) <= 2


def test_metal_material_outputs():
    from kanter_core_tpu.models import metal_material_graph

    outs = _evaluate_procedural(metal_material_graph(size=64))
    assert set(outs) == {"albedo", "height", "normal", "roughness", "metallic"}
    h = outs["height"].reshape(64, 64, 4)[..., 0]
    assert len(np.unique(h)) > 20, "height must carry brushing detail"
    # near-flat plate: height concentrates in a narrow band around 0.55
    assert 0.30 * 255 < np.median(h) < 0.75 * 255
    # cool steel: blue channel >= red essentially everywhere on the ramp
    albedo = outs["albedo"].reshape(64, 64, 4)
    assert (albedo[..., 2].astype(int) >= albedo[..., 0].astype(int)).mean() > 0.99
    # metallic is a CONSTANT plane at canvas size (degenerate Levels remap)
    metal = outs["metallic"].reshape(64, 64, 4)[..., 0]
    assert len(np.unique(metal)) == 1 and abs(int(metal[0, 0]) - round(0.92 * 255)) <= 1
    # polished base with scratch-driven wear: rough floor near 0.15
    rough = outs["roughness"].reshape(64, 64, 4)[..., 0]
    assert 0.10 * 255 <= rough.min() <= 0.25 * 255 and rough.max() > rough.min()
    normal = outs["normal"].reshape(64, 64, 4)
    assert normal[..., 2].mean() > 140, "normal z biases toward viewer"


def test_brick_material_outputs():
    from kanter_core_tpu.models import brick_material_graph

    outs = _evaluate_procedural(brick_material_graph(size=64, bricks_x=4,
                                                     bricks_y=8))
    assert set(outs) == {"albedo", "height", "normal", "roughness", "ao"}
    h = outs["height"].reshape(64, 64, 4)[..., 0].astype(np.float64) / 255.0
    # bimodal plateau: recessed mortar near 0.2, raised bricks near 0.75+
    assert (h < 0.45).mean() > 0.05, "mortar grooves must be present"
    assert (h > 0.6).mean() > 0.5, "bricks must dominate the sheet"
    albedo = outs["albedo"].reshape(64, 64, 4)
    # brick tones: red dominates blue on brick pixels (most of the sheet)
    assert (albedo[..., 0].astype(int) > albedo[..., 2].astype(int)).mean() > 0.5
    # mortar pixels are near-neutral gray: some pixels have |r-b| small
    assert (np.abs(albedo[..., 0].astype(int) - albedo[..., 2].astype(int)) < 12).mean() > 0.05
    # per-brick tint variation: bricks are NOT one flat color — the red
    # channel on raised pixels spans a real range
    brick_red = albedo[..., 0][h > 0.6]
    assert brick_red.max() - brick_red.min() > 20
    rough = outs["roughness"].reshape(64, 64, 4)[..., 0]
    # mortar (low height) is rougher than brick faces
    assert rough[h < 0.45].mean() > rough[h > 0.6].mean() + 20
    ao = outs["ao"].reshape(64, 64, 4)[..., 0]
    assert ao.mean() > 180 and ao.min() < 250, "mostly lit with groove shadows"
    normal = outs["normal"].reshape(64, 64, 4)
    assert normal[..., 2].mean() > 140, "normal z biases toward viewer"


def test_brick_edge_wear_polishes_edges():
    """The Curvature-driven wear stage: convex brick edges (bevel
    shoulders) lose roughness and gain albedo brightness vs the wear=0
    variant — and ONLY there (mortar floors are concave, untouched)."""
    from kanter_core_tpu.models import brick_material_graph

    kw = dict(size=64, bricks_x=4, bricks_y=8)
    worn = _evaluate_procedural(brick_material_graph(**kw))
    plain = _evaluate_procedural(brick_material_graph(wear=0.0, **kw))
    r_worn = worn["roughness"].reshape(64, 64, 4)[..., 0].astype(int)
    r_plain = plain["roughness"].reshape(64, 64, 4)[..., 0].astype(int)
    diff = r_plain - r_worn
    assert diff.min() >= 0, "wear must only REDUCE roughness"
    assert diff.max() > 30, "edge pixels must be visibly polished"
    assert (diff > 0).mean() < 0.5, "wear must be localized to edges"
    a_worn = worn["albedo"].reshape(64, 64, 4)[..., 0].astype(int)
    a_plain = plain["albedo"].reshape(64, 64, 4)[..., 0].astype(int)
    assert (a_worn - a_plain)[diff > 30].mean() > 0, "worn edges lighten"
    # height/normal/ao are upstream of the wear stage: bit-identical
    for name in ("height", "normal", "ao"):
        assert np.array_equal(worn[name], plain[name]), name


def test_cobblestone_material_outputs():
    from kanter_core_tpu.models import cobblestone_material_graph

    outs = _evaluate_procedural(cobblestone_material_graph(size=64, cells=4))
    assert set(outs) == {"albedo", "height", "normal", "roughness", "ao"}
    h = outs["height"].reshape(64, 64, 4)[..., 0].astype(np.float64) / 255.0
    # joints recessed near 0.15, domed stones rise well above
    assert (h < 0.25).mean() > 0.05, "mortar joints must be present"
    assert (h > 0.4).mean() > 0.2, "stone domes must dominate"
    assert len(np.unique(h)) > 40, "domes are smooth fields, not plateaus"
    # per-stone tint variation: the albedo has multiple distinct stone tones
    albedo = outs["albedo"].reshape(64, 64, 4)
    assert len(np.unique(albedo[..., 0])) > 20
    # warm-neutral stone ramp: red >= blue essentially everywhere
    assert (albedo[..., 0].astype(int) >= albedo[..., 2].astype(int)).mean() > 0.99
    rough = outs["roughness"].reshape(64, 64, 4)[..., 0]
    # joints (groove=0) sit at 0.9; stone tops drop below
    assert rough.max() >= round(0.88 * 255)
    assert rough.min() < round(0.6 * 255)
    ao = outs["ao"].reshape(64, 64, 4)[..., 0]
    assert ao.mean() > 180 and ao.min() < 250, "mostly lit with real cavities"
    normal = outs["normal"].reshape(64, 64, 4)
    assert normal[..., 2].mean() > 140, "normal z biases toward viewer"


def test_procedural_materials_fused_matches_pernode():
    from kanter_core_tpu.models import (
        brick_material_graph,
        cobblestone_material_graph,
        metal_material_graph,
        stone_material_graph,
        wood_material_graph,
    )

    for factory in (wood_material_graph, stone_material_graph,
                    metal_material_graph, brick_material_graph,
                    cobblestone_material_graph):
        fused = _evaluate_procedural(factory(size=48), fused=True)
        pernode = _evaluate_procedural(factory(size=48), fused=False)
        for name in fused:
            assert np.array_equal(fused[name], pernode[name]), (factory.__name__, name)


def test_procedural_materials_tiled_matches_dense():
    from kanter_core_tpu.models import wood_material_graph

    dense = _evaluate_procedural(wood_material_graph(size=48), tile_bytes=None)
    tiled = _evaluate_procedural(wood_material_graph(size=48), tile_bytes=1)
    for name in dense:
        assert np.array_equal(dense[name], tiled[name]), name


def test_procedural_material_serde_round_trip():
    from kanter_core_tpu.models import stone_material_graph

    graph = stone_material_graph(size=48)
    clone = NodeGraph.from_json(graph.to_json())
    assert graph.to_json() == clone.to_json()
    a = _evaluate_procedural(graph)
    b = _evaluate_procedural(clone)
    for name in a:
        assert np.array_equal(a[name], b[name]), name


def test_wood_knob_drag_with_undo():
    """Knob edits are program-argument swaps AND single history units:
    drag the wobble, undo, and land bit-exactly on the original render."""
    from kanter_core_tpu.models import wood_material_graph

    tp = TextureProcessor(50_000_000)
    try:
        lg = tp.new_live_graph()
        with lg.write() as g:
            g.set_node_graph(wood_material_graph(size=48))
        (height_out,) = [
            oid for oid in lg.node_graph.output_ids()
            if lg.node_graph.node(oid).node_type.payload == "height"
        ]
        (warp_id,) = [
            n.node_id for n in lg.node_graph.nodes
            if n.node_type.kind.value == "Warp"
        ]
        before = np.asarray(TextureProcessor.buffer_rgba(lg, height_out, SlotId(0)))
        lg.set_warp(warp_id, 0.0, 20.0)
        dragged = np.asarray(TextureProcessor.buffer_rgba(lg, height_out, SlotId(0)))
        assert not np.array_equal(before, dragged)
        assert lg.undo()
        after = np.asarray(TextureProcessor.buffer_rgba(lg, height_out, SlotId(0)))
        assert np.array_equal(before, after)
    finally:
        tp.shutdown_now()


def test_brick_damp_apron_darkens_near_mortar():
    """The Distance-driven damp stage: a jump-flooded moisture ring hugs
    every mortar line — brick pixels NEAR mortar lose albedo brightness vs
    the damp=0 variant, far-from-mortar brick cores lose less, and
    everything upstream of the albedo coordinate is bit-identical."""
    from kanter_core_tpu.models import brick_material_graph

    kw = dict(size=64, bricks_x=4, bricks_y=8, wear=0.0)
    wet = _evaluate_procedural(brick_material_graph(damp=0.6, **kw))
    dry = _evaluate_procedural(brick_material_graph(damp=0.0, **kw))
    a_wet = wet["albedo"].reshape(64, 64, 4)[..., 0].astype(int)
    a_dry = dry["albedo"].reshape(64, 64, 4)[..., 0].astype(int)
    dark = a_dry - a_wet
    h = dry["height"].reshape(64, 64, 4)[..., 0].astype(np.float64) / 255.0
    brick = h > 0.6
    assert dark[brick].max() > 10, "damp ring must visibly darken bricks"
    assert dark.min() >= -2, "damp must only darken (ramp quantization aside)"
    # the ring is localized: the darkest decile of brick pixels darkens
    # far more than the brightest (brick cores away from mortar)
    ring = np.quantile(dark[brick], 0.95)
    core = np.quantile(dark[brick], 0.05)
    assert ring > core + 5, (ring, core)
    for name in ("height", "normal", "ao", "roughness"):
        assert np.array_equal(wet[name], dry[name]), name
