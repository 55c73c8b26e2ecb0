"""Partition splitting around unfusable nodes (VERDICT r1 #7).

A Write sink (or an in-flight node) must not defeat fusion for the rest of
the request: the engine carves it and its dirty descendants out, fuses the
maximal remainder into ONE program, and schedules the carved-out nodes
per-node once their parents are Clean.
"""

import time

import numpy as np
import pytest

from conftest import IMAGE_1, render_u8

from kanter_core_tpu import (
    MixType,
    Node,
    NodeState,
    NodeType,
    SlotId,
    TextureProcessor,
)


def _chain_with_write(g, out_path, depth=20):
    img = g.add_node(Node(NodeType.Image(IMAGE_1)))
    val = g.add_node(Node(NodeType.Value(1.0)))
    prev = img
    for i in range(depth):
        mix = g.add_node(
            Node(NodeType.Mix(MixType.SUBTRACT if i % 2 else MixType.ADD))
        )
        g.connect(prev, mix, SlotId(0), SlotId(0))
        g.connect(val, mix, SlotId(0), SlotId(1))
        prev = mix
    out = g.add_node(Node(NodeType.OutputRgba("out")))
    g.connect(prev, out, SlotId(0), SlotId(0))
    write = g.add_node(Node(NodeType.Write(out_path)))
    g.connect(prev, write, SlotId(0), SlotId(0))
    return out, write


def test_write_sink_does_not_defeat_fusion(tmp_path, tex_pro):
    from PIL import Image as PILImage

    out_path = str(tmp_path / "written.png")
    lg = tex_pro.new_live_graph()
    with lg.write() as g:
        out, write = _chain_with_write(g, out_path, depth=20)
        g.request(write)

    pixels = render_u8(lg, out)

    # the 22 fusable nodes ran as ONE fused program, not per-node
    fused_events = [
        e for e in tex_pro.timeline.events() if e.extra.get("fused", 0) >= 20
    ]
    assert fused_events, [
        (e.kind, e.extra) for e in tex_pro.timeline.events()
    ]

    # the Write sink still executes (per-node, once parents are Clean)
    deadline = time.time() + 30
    while time.time() < deadline:
        try:
            written = np.asarray(PILImage.open(out_path).convert("RGBA"))
            break
        except Exception:
            time.sleep(0.05)
    else:
        raise AssertionError("Write node never produced a file")
    deadline = time.time() + 30
    while lg.node_state(write) != NodeState.CLEAN and time.time() < deadline:
        time.sleep(0.01)
    assert lg.node_state(write) == NodeState.CLEAN

    # the fused result is identical to the same graph without the Write sink
    with TextureProcessor(10_000_000) as plain:
        lg2 = plain.new_live_graph()
        with lg2.write() as g:
            img = g.add_node(Node(NodeType.Image(IMAGE_1)))
            val = g.add_node(Node(NodeType.Value(1.0)))
            prev = img
            for i in range(20):
                mix = g.add_node(
                    Node(NodeType.Mix(MixType.SUBTRACT if i % 2 else MixType.ADD))
                )
                g.connect(prev, mix, SlotId(0), SlotId(0))
                g.connect(val, mix, SlotId(0), SlotId(1))
                prev = mix
            out2 = g.add_node(Node(NodeType.OutputRgba("out")))
            g.connect(prev, out2, SlotId(0), SlotId(0))
        assert np.array_equal(pixels, render_u8(lg2, out2))


def test_requested_write_alone_still_runs(tmp_path, tex_pro):
    """Requesting ONLY the Write node fuses its ancestors, then runs the
    Write per-node — no hang, no per-node fallback for the chain."""
    from PIL import Image as PILImage

    out_path = str(tmp_path / "only_write.png")
    lg = tex_pro.new_live_graph()
    with lg.write() as g:
        out, write = _chain_with_write(g, out_path, depth=12)
        g.request(write)

    deadline = time.time() + 30
    while time.time() < deadline:
        try:
            written = np.asarray(PILImage.open(out_path).convert("RGBA"))
            break
        except Exception:
            time.sleep(0.05)
    else:
        raise AssertionError("Write node never produced a file")
    # content check: the written pixels equal the chain's Output render
    # (a Write that saved the wrong slot would still produce a file)
    expected = render_u8(lg, out).reshape(written.shape)
    assert np.array_equal(written, expected)
    fused_events = [
        e for e in tex_pro.timeline.events() if e.extra.get("fused", 0) >= 12
    ]
    assert fused_events


def _distance_sandwich(g, w=96, h=96):
    """Bucketable prologue → Distance → bucketable epilogue: the canonical
    segmented-dispatch shape (VERDICT r4 #2). The drag target is the mix
    feeding Distance, so a size edit reshapes EVERY segment."""
    from kanter_core_tpu import ResizePolicy, Size

    img = g.add_node(Node(NodeType.Image(IMAGE_1)))
    sep = g.add_node(Node(NodeType.SeparateRgba()))
    g.connect(img, sep, SlotId(0), SlotId(0))
    val = g.add_node(Node(NodeType.Value(0.7)))
    mix = g.add_node(Node(NodeType.Mix(MixType.MULTIPLY)))
    g.connect(sep, mix, SlotId(0), SlotId(0))
    g.connect(val, mix, SlotId(0), SlotId(1))
    g.node_mut(mix).resize_policy = ResizePolicy.SpecificSize(Size(w, h))
    dst = g.add_node(Node(NodeType.Distance(12.0)))
    g.connect(mix, dst, SlotId(0), SlotId(0))
    mix2 = g.add_node(Node(NodeType.Mix(MixType.MULTIPLY)))
    g.connect(mix, mix2, SlotId(0), SlotId(0))
    g.connect(dst, mix2, SlotId(0), SlotId(1))
    h2n = g.add_node(Node(NodeType.HeightToNormal()))
    g.connect(mix2, h2n, SlotId(0), SlotId(0))
    out = g.add_node(Node(NodeType.OutputRgba("out")))
    g.connect(h2n, out, SlotId(0), SlotId(0))
    return mix, out


def test_distance_segmented_drag_bit_exact_and_compile_bounded():
    """VERDICT r4 #2 'Done' criteria: a size drag on a Distance-containing
    graph under bucket_sizes=True stays bit-identical to the plain dense
    processor at EVERY size, while compiles stay bounded by
    buckets-crossed (bucketed segments) + one dense program for the
    Distance segment (whose per-size compiles live inside that one
    CompiledGraph's shape cache) — the whole partition no longer
    dense-recompiles per size."""
    from kanter_core_tpu import ResizePolicy, Size, TextureProcessor

    sizes = [(96, 96), (100, 96), (120, 110), (60, 100)]
    # buckets: 96/100/110/120 → 128; 60 → 64 — 2 distinct bucket signatures
    plain = TextureProcessor(10_000_000)
    seg = TextureProcessor(10_000_000, bucket_sizes=True)
    try:
        lg_p = plain.new_live_graph()
        with lg_p.write() as g:
            mix_p, out_p = _distance_sandwich(g)
        lg_s = seg.new_live_graph()
        with lg_s.write() as g:
            mix_s, out_s = _distance_sandwich(g)

        for w, h in sizes:
            for lg, mix in ((lg_p, mix_p), (lg_s, mix_s)):
                with lg.write() as g:
                    g.node_mut(mix).resize_policy = ResizePolicy.SpecificSize(
                        Size(w, h)
                    )
            a = render_u8(lg_p, out_p)
            b = render_u8(lg_s, out_s)
            assert np.array_equal(a, b), f"{w}x{h} diverged (segmented)"

        engine = seg.engine
        # segments: {img,sep,val,mix} and {mix2,h2n,out} bucketable,
        # {dst} dense → exactly ONE dense program (the Distance segment;
        # a whole-partition fallback would add a second fingerprint)
        assert len(engine._fused_programs) == 1, (
            f"expected only the Distance segment dense program, got "
            f"{len(engine._fused_programs)}"
        )
        # bucketed compiles ≤ segments × dispatch shapes × buckets crossed
        # (2 segments; initial all-dirty + steady-state preset-boundary
        # dispatch shapes; 2 buckets: 128² and 64×128) — NOT per size (the
        # pre-r5 dense fallback recompiled the whole pipeline per size)
        traces = sum(ev.traces for ev in engine._bucketed_programs.values())
        assert traces <= 8, f"{traces} bucketed traces for {len(sizes)} sizes"
    finally:
        plain.shutdown_now()
        seg.shutdown_now()


def test_distance_segmented_value_edit_reuses_everything():
    """Successive Value edits (no size change) re-run the segmented route
    with ZERO new traces and zero new dense programs — arguments-only
    re-dispatch. (The FIRST edit legitimately mints re-dispatch-shaped
    evaluators: clean ancestors become preset boundaries, like the
    whole-graph bucketed path; steady-state edits must then be free.)"""
    from kanter_core_tpu import TextureProcessor

    seg = TextureProcessor(10_000_000, bucket_sizes=True)
    try:
        lg = seg.new_live_graph()
        with lg.write() as g:
            _mix, out = _distance_sandwich(g)
            val = next(
                n.node_id for n in g.node_graph.nodes
                if n.node_type.kind.value == "Value"
            )
        a = render_u8(lg, out)
        engine = seg.engine
        with lg.write() as g:
            g.node_mut(val).node_type = NodeType.Value(0.3)
        b = render_u8(lg, out)
        assert not np.array_equal(a, b), "value edit did not change pixels"
        dense_before = len(engine._fused_programs)
        traces_before = sum(
            ev.traces for ev in engine._bucketed_programs.values()
        )
        with lg.write() as g:
            g.node_mut(val).node_type = NodeType.Value(0.55)
        c = render_u8(lg, out)
        assert not np.array_equal(b, c), "second value edit did not change pixels"
        assert len(engine._fused_programs) == dense_before
        traces_after = sum(
            ev.traces for ev in engine._bucketed_programs.values()
        )
        assert traces_after == traces_before, "steady-state value edit re-traced"
    finally:
        seg.shutdown_now()


@pytest.mark.parametrize("seed", range(6))
def test_fuzz_segmented_engine_matches_dense(seed):
    """Randomized segmented-route fuzz: the generator's Distance-containing
    graphs render through TextureProcessor(bucket_sizes=True) — the r5
    segmented dispatch — bit-identically to the plain dense processor
    (extends the three pairwise-fuzz suites to the fifth engine route)."""
    from test_fuzz_equivalence import _build_random_graph

    from kanter_core_tpu import TextureProcessor

    graph, targets = _build_random_graph(seed, allow_graph_nodes=False)
    if not targets:
        pytest.skip("degenerate graph")
    results = {}
    for bucket_sizes in (False, True):
        tp = TextureProcessor(10_000_000, bucket_sizes=bucket_sizes)
        try:
            lg = tp.new_live_graph()
            with lg.write() as g:
                g.set_node_graph(graph.clone())
            results[bucket_sizes] = [
                render_u8(lg, t) for t in targets
            ]
        finally:
            tp.shutdown_now()
    for a, b in zip(results[False], results[True]):
        assert np.array_equal(a, b), f"seed {seed} diverged (segmented)"
