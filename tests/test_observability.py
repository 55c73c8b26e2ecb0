"""Unit tests for the observability/memoization periphery: NodeTimeline
snapshot semantics and RecipeCache byte accounting (cache-wide plane
dedup, oversized-entry guard)."""

import numpy as np

from kanter_core_tpu.profiling import NodeTimeline
from kanter_core_tpu.recipe_cache import RecipeCache
from kanter_core_tpu.slot_image import SlotImage
from kanter_core_tpu.transient_buffer import plane_from_host


def test_timeline_events_are_snapshots():
    """events() hands out copies: a later end() (engine thread) must not
    mutate an already-taken snapshot under a reader's feet."""
    tl = NodeTimeline()
    ev = tl.begin(1, "mix")
    snap = tl.events()
    tl.end(ev, "clean")
    assert snap[0].outcome == "in-flight"
    assert snap[0].committed_at is None
    assert tl.events()[0].outcome == "clean"
    assert tl.counters()["clean"] == 1


def _image(plane):
    return SlotImage([plane])


def test_recipe_cache_dedups_aliased_planes_across_entries():
    """An Output entry aliasing its producer's plane must not double-count
    the bytes — per-entry sums would make a 1 GB budget trigger at a
    fraction of the actually-pinned memory."""
    plane = plane_from_host(np.zeros((64, 64), np.float32))  # 16 KB
    cache = RecipeCache(capacity=10, byte_budget=1 << 30)
    cache.put("producer", [(0, _image(plane))])
    cache.put("output", [(0, _image(plane))])  # aliases the same plane
    assert cache.stats()["bytes"] == plane.bytes()

    # dropping ONE aliasing entry keeps the bytes pinned; dropping both frees
    cache.capacity = 1
    cache.put("third", [(0, _image(plane_from_host(np.zeros((8, 8), np.float32))))])
    stats = cache.stats()
    assert stats["entries"] == 1
    assert stats["bytes"] == 8 * 8 * 4


def test_recipe_cache_oversized_entry_not_inserted():
    """A single entry exceeding the whole byte budget must not drain the
    cache down to itself (it would be evicted by the next put anyway)."""
    small = plane_from_host(np.zeros((8, 8), np.float32))
    big = plane_from_host(np.zeros((128, 128), np.float32))  # 64 KB
    cache = RecipeCache(capacity=10, byte_budget=32 * 1024)
    cache.put("small", [(0, _image(small))])
    cache.put("big", [(0, _image(big))])
    stats = cache.stats()
    assert cache.get("big") is None
    assert cache.get("small") is not None, "oversized put drained the cache"
    assert stats["bytes"] == small.bytes()


def test_deep_chain_nonlinear_every_one_squares_every_step():
    """nonlinear_every=1 means EVERY chain step is a square — the pre-fix
    `i % 1 == 1` guard was never true, emitting an algebraically
    collapsible all-linear chain that benchmarks as fiction."""
    from kanter_core_tpu.graphs import deep_chain_graph
    from kanter_core_tpu.node import MixType, NodeTypeKind

    graph, _, _, _ = deep_chain_graph(depth=6, nonlinear_every=1)
    squares = [
        n for n in graph.nodes
        if n.node_type.kind == NodeTypeKind.MIX
        and n.node_type.payload == MixType.MULTIPLY
    ]
    assert len(squares) == 6

    # the default structure (every=2) is unchanged by the fix
    graph2, _, _, _ = deep_chain_graph(depth=6, nonlinear_every=2)
    squares2 = [
        n for n in graph2.nodes
        if n.node_type.kind == NodeTypeKind.MIX
        and n.node_type.payload == MixType.MULTIPLY
    ]
    assert len(squares2) == 3
