"""Randomized structural fuzz: the fused engine path, the per-node engine
path, and the standalone compiler must produce bit-identical pixels for the
same graph.

Graphs are generated bottom-up from seeded RNGs over all fusable node types
(Value, Image, all five Mix types, Separate/CombineRgba, HeightToNormal),
with random slot wiring, resize policies, and filters — so size inference,
type coercion, plane aliasing, and default-input rules are all exercised on
irregular shapes.
"""

import numpy as np
import pytest

from conftest import HEART_110, HEART_128, IMAGE_1, render_u8

from kanter_core_tpu import (
    MixType,
    Node,
    NodeGraph,
    NodeType,
    ResizeFilter,
    ResizePolicy,
    Size,
    SlotId,
    SlotType,
    TextureProcessor,
)
from kanter_core_tpu.compiler import CompiledGraph


def _build_random_graph(seed: int, allow_graph_nodes: bool = True,
                        bucketable_only: bool = False) -> tuple[NodeGraph, list]:
    rng = np.random.default_rng(seed)
    graph = NodeGraph()
    # (node_id, output slots: list[(SlotId, SlotType)])
    producers: list = []

    def add(node, outputs):
        node_id = graph.add_node(node)
        producers.append((node_id, outputs))
        return node_id

    # seed producers
    add(Node(NodeType.Value(float(rng.random()))), [(SlotId(0), SlotType.GRAY)])
    add(
        Node(NodeType.Image(str(rng.choice([HEART_128, HEART_110, IMAGE_1])))),
        [(SlotId(0), SlotType.RGBA)],
    )

    def pick(slot_type, pool=None, r=None):
        """A random producer output compatible with `slot_type`. `r`
        defaults to the main rng; appended coverage blocks pass their own
        so pre-existing seeds keep their exact graphs."""
        options = []
        for node_id, outputs in (producers if pool is None else pool):
            for slot_id, st in outputs:
                if slot_type == SlotType.GRAY_OR_RGBA or st == slot_type:
                    options.append((node_id, slot_id))
        if not options:
            return None
        return options[(rng if r is None else r).integers(len(options))]

    def rand_policy():
        r = rng.integers(4)
        if r == 0:
            return ResizePolicy.MostPixels()
        if r == 1:
            return ResizePolicy.LeastPixels()
        if r == 2:
            return ResizePolicy.LargestAxes()
        return ResizePolicy.SpecificSize(Size(int(rng.integers(30, 90)), int(rng.integers(30, 90))))

    def rand_filter():
        return list(ResizeFilter)[rng.integers(len(ResizeFilter))]

    for _ in range(int(rng.integers(4, 9))):
        kind = rng.integers(7)
        if kind == 6 and not allow_graph_nodes:
            kind = rng.integers(6)  # tiled evaluation has no nested-Graph twin
        pool = list(producers)  # only pre-existing nodes: keeps the DAG acyclic
        if kind in (0, 1):  # Mix
            mix = Node(NodeType.Mix(list(MixType)[rng.integers(5)]))
            mix.resize_policy = rand_policy()
            mix.resize_filter = rand_filter()
            mix_id = add(mix, [(SlotId(0), SlotType.GRAY_OR_RGBA)])
            # randomize slot wiring ORDER: resize-policy pixel-count ties
            # resolve by edge insertion order, which must stay path-parity
            wiring = [(SlotId(0), 0.9), (SlotId(1), 0.7)]
            if rng.random() < 0.5:
                wiring.reverse()
            for slot, prob in wiring:
                src = pick(SlotType.GRAY_OR_RGBA, pool)
                if src is not None and rng.random() < prob:
                    graph.connect(src[0], mix_id, src[1], slot)
        elif kind == 2:  # CombineRgba
            node = Node(NodeType.CombineRgba())
            node.resize_policy = rand_policy()
            combine_id = add(node, [(SlotId(0), SlotType.RGBA)])
            for slot in range(4):
                src = pick(SlotType.GRAY, pool)
                if src is not None and rng.random() < 0.6:
                    graph.connect(src[0], combine_id, src[1], SlotId(slot))
        elif kind == 3:  # SeparateRgba
            src = pick(SlotType.RGBA, pool)
            sep_id = add(
                Node(NodeType.SeparateRgba()),
                [(SlotId(i), SlotType.GRAY) for i in range(4)],
            )
            if src is not None:
                graph.connect(src[0], sep_id, src[1], SlotId(0))
        elif kind == 4:  # HeightToNormal — only with a guaranteed gray input
            src = pick(SlotType.GRAY, pool)
            if src is None:
                continue
            h2n_id = add(Node(NodeType.HeightToNormal()), [(SlotId(0), SlotType.RGBA)])
            graph.connect(src[0], h2n_id, src[1], SlotId(0))
        elif kind == 5:  # Blur (extension node), any input type
            src = pick(SlotType.GRAY_OR_RGBA, pool)
            if src is None:
                continue
            node = Node(NodeType.Blur(float(rng.uniform(0.4, 3.0))))
            node.resize_policy = rand_policy()
            node.resize_filter = rand_filter()
            blur_id = add(node, [(SlotId(0), SlotType.GRAY_OR_RGBA)])
            graph.connect(src[0], blur_id, src[1], SlotId(0))
        else:  # nested Graph node (the invert subgraph), gray in → gray out
            from kanter_core_tpu.graphs import invert_graph

            src = pick(SlotType.GRAY, pool)
            if src is None:
                continue
            inner = invert_graph()
            gnode_id = add(
                Node(NodeType.Graph(inner)),
                [(inner.output_slot_id_with_name("out"), SlotType.GRAY)],
            )
            graph.connect(src[0], gnode_id, src[1], inner.input_slot_id_with_name("in"))

    # Levels coverage via a SEPARATE rng so pre-existing seeds keep their
    # exact graphs (appending never perturbs the main stream) — the four
    # lockstep consumers all get fuzzed over the op automatically
    lrng = np.random.default_rng(seed * 7919 + 13)
    src = pick(SlotType.GRAY_OR_RGBA)
    if src is not None:
        node = Node(
            NodeType.Levels(
                float(lrng.uniform(0.0, 0.3)),
                float(lrng.uniform(0.5, 1.0)),
                float(lrng.uniform(0.3, 3.0)),
                float(lrng.uniform(0.0, 0.2)),
                float(lrng.uniform(0.8, 1.0)),
            )
        )
        node.resize_policy = ResizePolicy.MostPixels()
        levels_id = add(node, [(SlotId(0), SlotType.GRAY_OR_RGBA)])
        graph.connect(src[0], levels_id, src[1], SlotId(0))

    # Noise coverage (like Levels: separate rng, appended — never perturbs
    # the main stream): a procedural source mixed into the existing chain so
    # all four lockstep consumers fuzz it, including through random resizes
    nrng = np.random.default_rng(seed * 104729 + 7)
    noise = Node(
        NodeType.Noise(
            int(nrng.integers(20, 70)),
            int(nrng.integers(20, 70)),
            cells=int(nrng.integers(2, 7)),
            octaves=int(nrng.integers(1, 4)),
            seed=int(nrng.integers(0, 2**31)),
            persistence=float(nrng.uniform(0.3, 0.8)),
        )
    )
    noise_id = add(noise, [(SlotId(0), SlotType.GRAY)])
    nsrc = pick(SlotType.GRAY_OR_RGBA, r=nrng)
    if nsrc is not None and nsrc[0] != noise_id:
        mix = Node(NodeType.Mix(list(MixType)[nrng.integers(5)]))
        mix.resize_policy = ResizePolicy.MostPixels()
        mix.resize_filter = list(ResizeFilter)[nrng.integers(len(ResizeFilter))]
        mix_id = add(mix, [(SlotId(0), SlotType.GRAY_OR_RGBA)])
        graph.connect(noise_id, mix_id, SlotId(0), SlotId(0))
        graph.connect(nsrc[0], mix_id, nsrc[1], SlotId(1))

    # GradientMap coverage (separate rng, appended): colorize a random gray
    # producer through 2-5 random stops
    grng = np.random.default_rng(seed * 15485863 + 3)
    gsrc = pick(SlotType.GRAY, r=grng)
    if gsrc is not None:
        n_stops = int(grng.integers(2, 6))
        pos = np.sort(grng.random(n_stops))
        stops = [
            (float(p), *(float(v) for v in grng.random(4))) for p in pos
        ]
        gm_id = add(Node(NodeType.GradientMap(stops)), [(SlotId(0), SlotType.RGBA)])
        graph.connect(gsrc[0], gm_id, gsrc[1], SlotId(0))

    # Extension blend-mode coverage (separate rng, appended): mix two random
    # producers through a random Darken/Lighten/Difference/Screen/Overlay —
    # the five extension MixTypes the main block's `integers(5)` never draws
    brng = np.random.default_rng(seed * 32452843 + 5)
    bsrc_l = pick(SlotType.GRAY_OR_RGBA, r=brng)
    bsrc_r = pick(SlotType.GRAY_OR_RGBA, r=brng)
    if bsrc_l is not None and bsrc_r is not None:
        blend = Node(NodeType.Mix(list(MixType)[5 + brng.integers(5)]))
        blend.resize_policy = ResizePolicy.MostPixels()
        blend.resize_filter = list(ResizeFilter)[brng.integers(len(ResizeFilter))]
        blend_id = add(blend, [(SlotId(0), SlotType.GRAY_OR_RGBA)])
        graph.connect(bsrc_l[0], blend_id, bsrc_l[1], SlotId(0))
        graph.connect(bsrc_r[0], blend_id, bsrc_r[1], SlotId(1))

    # Transform coverage (separate rng, appended): affine-place a random
    # gray-or-rgba producer with random offset/rotation/scale
    xrng = np.random.default_rng(seed * 22801763 + 9)
    xsrc = pick(SlotType.GRAY_OR_RGBA, r=xrng)
    if xsrc is not None:
        xf_id = add(
            Node(NodeType.Transform(
                float(xrng.uniform(-40, 40)), float(xrng.uniform(-40, 40)),
                float(xrng.uniform(0, 360)),
                float(xrng.uniform(0.4, 2.5)), float(xrng.uniform(0.4, 2.5)),
            )),
            [(SlotId(0), SlotType.GRAY_OR_RGBA)],
        )
        graph.connect(xsrc[0], xf_id, xsrc[1], SlotId(0))

    # Warp coverage (separate rng, appended): displace a random producer by
    # a random gray strength map at a random direction/intensity; ~1 in 4
    # graphs leaves the strength dangling to fuzz the pass-through alias
    wrng = np.random.default_rng(seed * 49979687 + 11)
    wsrc = pick(SlotType.GRAY_OR_RGBA, r=wrng)
    if wsrc is not None:
        wp_id = add(
            Node(NodeType.Warp(
                float(wrng.uniform(0, 360)), float(wrng.uniform(1.0, 30.0)),
            )),
            [(SlotId(0), SlotType.GRAY_OR_RGBA)],
        )
        graph.connect(wsrc[0], wp_id, wsrc[1], SlotId(0))
        msrc = pick(SlotType.GRAY, r=wrng)
        if msrc is not None and wrng.random() < 0.75:
            graph.connect(msrc[0], wp_id, msrc[1], SlotId(1))

    # Pattern coverage (separate rng, appended): a structured tiling-mask
    # source over all three kinds; BOTH outputs (mask + per-cell id) enter
    # the gray pool, and one random output mixes into the existing chain
    prng = np.random.default_rng(seed * 67867967 + 17)
    bevel = float(prng.uniform(0.02, 0.25))
    if prng.random() < 0.3:
        bevel = 0.0  # the exact-hard-step branch must stay fuzzed
    pat = Node(
        NodeType.Pattern(
            int(prng.integers(20, 70)), int(prng.integers(20, 70)),
            pattern=("Checker", "Brick", "Stripe")[int(prng.integers(3))],
            cells_x=int(prng.integers(1, 9)), cells_y=int(prng.integers(1, 9)),
            mortar=float(prng.uniform(0.0, 0.4)), bevel=bevel,
            seed=int(prng.integers(0, 2**31)),
        )
    )
    pat_id = add(pat, [(SlotId(0), SlotType.GRAY), (SlotId(1), SlotType.GRAY)])
    psrc = pick(SlotType.GRAY_OR_RGBA, r=prng)
    if psrc is not None and psrc[0] != pat_id:
        pmix = Node(NodeType.Mix(list(MixType)[prng.integers(5)]))
        pmix.resize_policy = ResizePolicy.MostPixels()
        pmix.resize_filter = list(ResizeFilter)[prng.integers(len(ResizeFilter))]
        pmix_id = add(pmix, [(SlotId(0), SlotType.GRAY_OR_RGBA)])
        graph.connect(pat_id, pmix_id, SlotId(int(prng.integers(2))), SlotId(0))
        graph.connect(psrc[0], pmix_id, psrc[1], SlotId(1))

    # Voronoi coverage (separate rng, appended): a cellular-noise source;
    # all THREE outputs (F1 distance, F2−F1 borders, per-cell id) enter the
    # gray pool, and one random output mixes into the existing chain
    vrng = np.random.default_rng(seed * 29996224275833 % 87178291199 + 31)
    vor = Node(
        NodeType.Voronoi(
            int(vrng.integers(20, 70)), int(vrng.integers(20, 70)),
            cells_x=int(vrng.integers(1, 9)), cells_y=int(vrng.integers(1, 9)),
            jitter=float(vrng.uniform(0.0, 1.0)),
            seed=int(vrng.integers(0, 2**31)),
        )
    )
    vor_id = add(vor, [(SlotId(0), SlotType.GRAY), (SlotId(1), SlotType.GRAY),
                       (SlotId(2), SlotType.GRAY)])
    vsrc = pick(SlotType.GRAY_OR_RGBA, r=vrng)
    if vsrc is not None and vsrc[0] != vor_id:
        vmix = Node(NodeType.Mix(list(MixType)[vrng.integers(5)]))
        vmix.resize_policy = ResizePolicy.MostPixels()
        vmix.resize_filter = list(ResizeFilter)[vrng.integers(len(ResizeFilter))]
        vmix_id = add(vmix, [(SlotId(0), SlotType.GRAY_OR_RGBA)])
        graph.connect(vor_id, vmix_id, SlotId(int(vrng.integers(3))), SlotId(0))
        graph.connect(vsrc[0], vmix_id, vsrc[1], SlotId(1))

    # Ramp coverage (separate rng, appended): a gradient source — all
    # three kinds drawn — mixed into the existing chain so every lockstep
    # consumer fuzzes it, including through random resizes
    rrng = np.random.default_rng(seed * 15487469 + 41)
    rmp = Node(
        NodeType.Ramp(
            int(rrng.integers(20, 70)), int(rrng.integers(20, 70)),
            ("Linear", "Radial", "Box")[int(rrng.integers(3))],
            angle=float(rrng.uniform(-400.0, 400.0)),
            cx=float(rrng.uniform(-0.3, 1.3)),
            cy=float(rrng.uniform(-0.3, 1.3)),
            scale=float(rrng.uniform(0.2, 3.0)),
        )
    )
    rmp_id = add(rmp, [(SlotId(0), SlotType.GRAY)])
    rsrc = pick(SlotType.GRAY_OR_RGBA, r=rrng)
    if rsrc is not None and rsrc[0] != rmp_id:
        rmix = Node(NodeType.Mix(list(MixType)[rrng.integers(5)]))
        rmix.resize_policy = ResizePolicy.MostPixels()
        rmix.resize_filter = list(ResizeFilter)[rrng.integers(len(ResizeFilter))]
        rmix_id = add(rmix, [(SlotId(0), SlotType.GRAY_OR_RGBA)])
        graph.connect(rmp_id, rmix_id, SlotId(0), SlotId(0))
        graph.connect(rsrc[0], rmix_id, rsrc[1], SlotId(1))

    # Hsv coverage (separate rng, appended): a hue/sat/value adjust of a
    # random producer — gray draws the value-scale path, rgba the full
    # hexcone transform with the aliased alpha
    hrng = np.random.default_rng(seed * 94906249 + 23)
    hsrc = pick(SlotType.GRAY_OR_RGBA, r=hrng)
    if hsrc is not None:
        hs_id = add(
            Node(NodeType.Hsv(
                float(hrng.uniform(-400.0, 400.0)),
                float(hrng.uniform(0.0, 2.2)),
                float(hrng.uniform(0.3, 1.6)),
            )),
            [(SlotId(0), SlotType.GRAY_OR_RGBA)],
        )
        graph.connect(hsrc[0], hs_id, hsrc[1], SlotId(0))

    # Curvature coverage (separate rng, appended): a wrap-Laplacian mask of
    # a random GRAY producer at a random strength — its output joins the
    # gray pool via the terminal pick below
    crng = np.random.default_rng(seed * 86028121 + 19)
    csrc = pick(SlotType.GRAY, r=crng)
    if csrc is not None:
        cv_id = add(
            Node(NodeType.Curvature(float(crng.uniform(0.2, 20.0)))),
            [(SlotId(0), SlotType.GRAY)],
        )
        graph.connect(csrc[0], cv_id, csrc[1], SlotId(0))

    # AmbientOcclusion coverage (separate rng, appended): a multi-scale
    # blurred-height occlusion mask of a random GRAY producer — random
    # strength (argument) and radius (trace-baked taps); its output joins
    # the gray pool via the terminal pick below
    arng = np.random.default_rng(seed * 122949829 + 29)
    asrc = pick(SlotType.GRAY, r=arng)
    if asrc is not None:
        ao_id = add(
            Node(NodeType.AmbientOcclusion(
                float(arng.uniform(0.5, 8.0)), float(arng.uniform(0.6, 2.5))
            )),
            [(SlotId(0), SlotType.GRAY)],
        )
        graph.connect(asrc[0], ao_id, asrc[1], SlotId(0))

    # Distance coverage (separate rng, appended): a jump-flooded fade of a
    # random GRAY producer's >0.5 region. NOT bucketable (a padded plane
    # cannot wrap-roll) — the bucketed fuzz passes `bucketable_only=True`
    # to skip it; the engine-route fuzz keeps it and exercises the
    # bucketed path's dense fallback
    if not bucketable_only:
        drng = np.random.default_rng(seed * 179424673 + 31)
        dsrc = pick(SlotType.GRAY, r=drng)
        if dsrc is not None:
            ds_id = add(
                Node(NodeType.Distance(float(drng.uniform(2.0, 24.0)))),
                [(SlotId(0), SlotType.GRAY)],
            )
            graph.connect(dsrc[0], ds_id, dsrc[1], SlotId(0))

    # terminal outputs: one per leaf-ish producer kind
    targets = []
    gray = pick(SlotType.GRAY)
    if gray is not None:
        out = graph.add_node(Node(NodeType.OutputGray("g")))
        graph.connect(gray[0], out, gray[1], SlotId(0))
        targets.append(out)
    rgba = pick(SlotType.RGBA)
    if rgba is not None:
        out = graph.add_node(Node(NodeType.OutputRgba("r")))
        graph.connect(rgba[0], out, rgba[1], SlotId(0))
        targets.append(out)
    return graph, targets


@pytest.mark.parametrize("seed", [0, 1, 2, 3, 4, 5, 6, 7])
def test_fused_pernode_compiler_equivalence(seed):
    graph, targets = _build_random_graph(seed)
    if not targets:
        pytest.skip("degenerate graph")

    results = {}
    # four engine paths, all required to be bit-identical: fused partitions,
    # per-node, tiled partitions (row bands), and per-node tiled — nested
    # Graph nodes make the tiled gate fall back per partition, which is part
    # of what this asserts (path choice must be unobservable)
    modes = [
        ("fused", True, None),
        ("pernode", False, None),
        ("tiled", True, 1),
        ("pernode_tiled", False, 1),
    ]
    for name, fused, tile_bytes in modes:
        tp = TextureProcessor(10_000_000, tile_bytes=tile_bytes)
        try:
            lg = tp.new_live_graph()
            with lg.write() as g:
                g.fuse_subgraphs = fused
                g.set_node_graph(graph.clone())
            for target in targets:
                results[(name, target)] = render_u8(lg, target)
            tp.remove_live_graph(lg)
        finally:
            tp.shutdown_now()

    prog = CompiledGraph(
        graph.clone(), targets=[(t, SlotId(0)) for t in targets], include_u8=True
    )
    compiled = prog()
    for target in targets:
        comp_px = np.asarray(compiled[(target, SlotId(0))]).reshape(-1)
        for name, _, _ in modes:
            assert np.array_equal(results[(name, target)], comp_px), (
                f"{name} != compiler (seed {seed})"
            )


@pytest.mark.parametrize("seed", [0, 1, 2, 3, 4, 5, 7, 11])
def test_fuzz_mesh_fused_matches_compiler(seed):
    """Random graphs through the MESH engine (8-virtual-device row
    sharding: shard_map'd blur/warp kernels where their viability gates
    admit the geometry, GSPMD partitioning elsewhere) must be bit-identical
    to the standalone dense compiler — shard-kernel gate decisions must be
    unobservable in the pixels."""
    import jax
    from jax.sharding import Mesh

    graph, targets = _build_random_graph(seed)
    if not targets:
        pytest.skip("degenerate graph")
    mesh = Mesh(np.asarray(jax.devices()[:8]), ("rows",))
    results = {}
    tp = TextureProcessor(10_000_000, mesh=mesh)
    try:
        lg = tp.new_live_graph()
        with lg.write() as g:
            g.set_node_graph(graph.clone())
        for target in targets:
            results[target] = render_u8(lg, target)
    finally:
        tp.shutdown_now()
    prog = CompiledGraph(
        graph.clone(), targets=[(t, SlotId(0)) for t in targets], include_u8=True
    )
    compiled = prog()
    for target in targets:
        comp_px = np.asarray(compiled[(target, SlotId(0))]).reshape(-1)
        assert np.array_equal(results[target], comp_px), (
            f"mesh != compiler (seed {seed})"
        )


def test_resize_tie_break_parity(tex_pro):
    """MostPixels pixel-count ties resolve by edge INSERTION order (the
    reference gathers inputs before sorting edges, `node_type.rs:229-236`);
    the fused/compiled path must match the per-node path exactly."""
    def build():
        g = NodeGraph()
        v = g.add_node(Node(NodeType.Value(0.5)))
        a = Node(NodeType.CombineRgba())
        a.resize_policy = ResizePolicy.SpecificSize(Size(4, 2))
        a = g.add_node(a)
        b = Node(NodeType.CombineRgba())
        b.resize_policy = ResizePolicy.SpecificSize(Size(2, 4))
        b = g.add_node(b)
        g.connect(v, a, SlotId(0), SlotId(0))
        g.connect(v, b, SlotId(0), SlotId(0))
        mix = g.add_node(Node(NodeType.Mix(MixType.ADD)))
        out = g.add_node(Node(NodeType.OutputRgba("out")))
        g.connect(b, mix, SlotId(0), SlotId(1))  # slot 1 inserted FIRST
        g.connect(a, mix, SlotId(0), SlotId(0))
        g.connect(mix, out, SlotId(0), SlotId(0))
        return g, out

    results = {}
    for fused in (True, False):
        graph, out = build()
        lg = tex_pro.new_live_graph()
        with lg.write() as g:
            g.fuse_subgraphs = fused
            g.set_node_graph(graph)
        results[fused] = render_u8(lg, out)
        tex_pro.remove_live_graph(lg)
    assert np.array_equal(results[True], results[False])

    graph, out = build()
    prog = CompiledGraph(graph, targets=[(out, SlotId(0))], include_u8=True)
    comp = np.asarray(prog()[(out, SlotId(0))]).reshape(-1)
    assert np.array_equal(comp, results[False])


def test_top_level_input_nodes_parity(tex_pro):
    """Top-level InputGray/InputRgba nodes (bound via add_input_slot_data)
    evaluate identically on the fused and per-node paths."""
    from kanter_core_tpu import SlotData, SlotImage

    rng = np.random.default_rng(11)
    gray_plane = rng.random((24, 24), dtype=np.float32)
    rgba_planes = [rng.random((24, 24), dtype=np.float32) for _ in range(4)]

    def build_and_render(fused):
        graph = NodeGraph()
        gin = graph.add_node(Node(NodeType.InputGray("g")))
        rin = graph.add_node(Node(NodeType.InputRgba("r")))
        mix = graph.add_node(Node(NodeType.Mix(MixType.MULTIPLY)))
        out = graph.add_node(Node(NodeType.OutputRgba("out")))
        graph.connect(rin, mix, SlotId(0), SlotId(0))
        graph.connect(gin, mix, SlotId(0), SlotId(1))
        graph.connect(mix, out, SlotId(0), SlotId(0))

        lg = tex_pro.new_live_graph()
        with lg.write() as g:
            g.fuse_subgraphs = fused
            g.set_node_graph(graph)
            g.add_input_slot_data(SlotData(rin, SlotId(0), SlotImage.Rgba(list(rgba_planes))))
            g.add_input_slot_data(SlotData(gin, SlotId(0), SlotImage.Gray(gray_plane)))
        pixels = render_u8(lg, out)
        tex_pro.remove_live_graph(lg)
        return pixels

    assert np.array_equal(build_and_render(True), build_and_render(False))
