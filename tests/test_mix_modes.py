"""Extension blend modes (Darken/Lighten/Difference/Screen/Overlay):
numpy-oracle bit parity, NaN determinism, the inherited Mix contract
(alpha=1, gray/rgba coercion), serde, and engine/compiler lockstep (also
fuzz-covered via the shared generator in test_fuzz_equivalence)."""

import numpy as np
import pytest

from conftest import HEART_128, render_u8

from kanter_core_tpu import (
    MixType,
    Node,
    NodeGraph,
    NodeType,
    SlotId,
    TextureProcessor,
)
from kanter_core_tpu.compiler import CompiledGraph
from kanter_core_tpu.ids import NodeId
from kanter_core_tpu.ops.mix import _gray_kernel
from kanter_core_tpu.recipe_cache import node_recipe

EXT_MODES = (MixType.DARKEN, MixType.LIGHTEN, MixType.DIFFERENCE,
             MixType.SCREEN, MixType.OVERLAY)


def _oracle(mode: MixType, l: np.ndarray, r: np.ndarray) -> np.ndarray:
    """The blend formulas in numpy f32, op-for-op in the kernel's
    association (numpy rounds every op once, like the XLA CPU backend with
    the nc_mul contraction guard engaged)."""
    l = l.astype(np.float32)
    r = r.astype(np.float32)
    if mode == MixType.DARKEN:
        return np.minimum(l, r)
    if mode == MixType.LIGHTEN:
        return np.maximum(l, r)
    if mode == MixType.DIFFERENCE:
        return np.abs(l - r)
    if mode == MixType.SCREEN:
        return l + (np.float32(1.0) - l) * r
    lo = (l * r) * np.float32(2.0)
    hi = np.float32(1.0) - ((np.float32(1.0) - l) * (np.float32(1.0) - r)) * np.float32(2.0)
    return np.where(l < np.float32(0.5), lo, hi)


@pytest.mark.parametrize("mode", EXT_MODES)
def test_blend_matches_numpy_oracle_bitwise(mode):
    rng = np.random.default_rng(int(mode.value.encode()[0]))
    l = (rng.random((37, 53), np.float32) * 1.4 - 0.2).astype(np.float32)
    r = (rng.random((37, 53), np.float32) * 1.4 - 0.2).astype(np.float32)
    got = np.asarray(_gray_kernel(mode)(l, r))
    want = _oracle(mode, l, r)
    assert got.dtype == np.float32
    assert np.array_equal(got, want), mode


@pytest.mark.parametrize("mode", EXT_MODES)
def test_blend_nan_inf_deterministic(mode):
    """IEEE payloads propagate deterministically: two runs are bit-equal,
    and Overlay's NaN-left select resolves to the high branch (NaN < 0.5 is
    False)."""
    l = np.array([[np.nan, np.inf, -np.inf, 0.25]], np.float32)
    r = np.array([[0.5, 0.5, 0.5, np.nan]], np.float32)
    a = np.asarray(_gray_kernel(mode)(l, r))
    b = np.asarray(_gray_kernel(mode)(l, r))
    assert np.array_equal(a, b, equal_nan=True)
    if mode == MixType.OVERLAY:
        hi = _oracle(mode, np.float32([[1.0]]), r[:, :1])  # any l ≥ 0.5 path
        assert np.isnan(a[0, 0])  # NaN·r → NaN through the hi branch
        del hi


def test_blend_rgba_alpha_forced_and_gray_coercion():
    """The extension modes inherit Mix's RGBA contract: three color
    channels blended, alpha forced to 1.0; a gray right input is coerced to
    the left's type (`mix.rs:58-62` semantics)."""
    g = NodeGraph()
    img = g.add_node(Node(NodeType.Image(str(HEART_128))))
    val = g.add_node(Node(NodeType.Value(0.75)))
    mix = g.add_node(Node(NodeType.Mix(MixType.SCREEN)))
    out = g.add_node(Node(NodeType.OutputRgba("out")))
    g.connect(img, mix, SlotId(0), SlotId(0))
    g.connect(val, mix, SlotId(0), SlotId(1))
    g.connect(mix, out, SlotId(0), SlotId(0))
    prog = CompiledGraph(g, targets=[(out, SlotId(0))])
    planes = prog()[(out, SlotId(0))]
    assert len(planes) == 4
    assert np.all(np.asarray(planes[3]) == 1.0)
    # screen with 0.75 brightens every color plane (inputs are in [0,1])
    for p in planes[:3]:
        arr = np.asarray(p)
        assert np.all(arr >= -1e-6)


def test_blend_serde_round_trip():
    g = NodeGraph()
    for mode in EXT_MODES:
        g.add_node(Node(NodeType.Mix(mode)))
    clone = NodeGraph.from_json(g.to_json())
    assert clone.to_json() == g.to_json()
    kinds = [n.node_type.payload for n in clone.nodes]
    assert set(kinds) == set(EXT_MODES)


def test_blend_recipes_distinct_per_mode():
    recipes = set()
    for mode in list(MixType):
        node = Node(NodeType.Mix(mode))
        node.node_id = NodeId(7)
        recipes.add(node_recipe(node, ["leaf"], None))
    assert len(recipes) == len(list(MixType))


@pytest.mark.parametrize("mode", [MixType.OVERLAY, MixType.DARKEN])
def test_blend_engine_paths_bitmatch_compiler(mode):
    """Fused-engine rendering of a blend equals the standalone compiler
    (the broader four-path contract is enforced by the shared fuzz)."""
    g = NodeGraph()
    img = g.add_node(Node(NodeType.Image(str(HEART_128))))
    val = g.add_node(Node(NodeType.Value(0.4)))
    mix = g.add_node(Node(NodeType.Mix(mode)))
    out = g.add_node(Node(NodeType.OutputRgba("out")))
    g.connect(img, mix, SlotId(0), SlotId(0))
    g.connect(val, mix, SlotId(0), SlotId(1))
    g.connect(mix, out, SlotId(0), SlotId(0))

    prog = CompiledGraph(g.clone(), targets=[(out, SlotId(0))], include_u8=True)
    compiled_px = np.asarray(prog()[(out, SlotId(0))]).reshape(-1)

    tp = TextureProcessor(10_000_000)
    try:
        lg = tp.new_live_graph()
        with lg.write() as live:
            live.set_node_graph(g)
        engine_px = render_u8(lg, out)
    finally:
        tp.shutdown_now()
    assert np.array_equal(engine_px, compiled_px)


def test_set_mix_type_to_extension_mode_dirties_and_updates():
    g = NodeGraph()
    val_a = g.add_node(Node(NodeType.Value(0.25)))
    val_b = g.add_node(Node(NodeType.Value(0.75)))
    mix = g.add_node(Node(NodeType.Mix(MixType.ADD)))
    out = g.add_node(Node(NodeType.OutputGray("out")))
    g.connect(val_a, mix, SlotId(0), SlotId(0))
    g.connect(val_b, mix, SlotId(0), SlotId(1))
    g.connect(mix, out, SlotId(0), SlotId(0))
    tp = TextureProcessor(10_000_000)
    try:
        lg = tp.new_live_graph()
        with lg.write() as live:
            live.set_node_graph(g)
        first = render_u8(lg, out)  # 0.25 + 0.75 = 1.0 → 255
        assert np.all(first == 255)
        with lg.write() as live:
            live.set_mix_type(mix, MixType.DARKEN)
        second = render_u8(lg, out)  # min(0.25, 0.75) → 63 (truncating cast)
        assert np.all(second[::4] == 63)
    finally:
        tp.shutdown_now()
