"""AmbientOcclusion node (extension): multi-scale blurred-height semantics
vs a bitwise numpy oracle, strength-as-argument caching vs radius
refingerprinting, and four-consumer lockstep parity (also fuzz-covered via
the shared generator)."""

import numpy as np
import pytest

from conftest import render_u8

from kanter_core_tpu import (
    Node,
    NodeGraph,
    NodeState,
    NodeType,
    SlotId,
    TextureProcessor,
)
from kanter_core_tpu.compiler import CompiledGraph, graph_fingerprint
from kanter_core_tpu.errors import TexProError
from kanter_core_tpu.ops.ambient_occlusion import (
    AO_SCALE_FACTORS,
    ao_sigmas,
)


def _np_blur_axis0(p: np.ndarray, taps: np.ndarray) -> np.ndarray:
    """f32 numpy twin of ops/blur._blur_axis0 (every op rounds once, tap
    order preserved; numpy never FMA-contracts, matching nc_mul on CPU)."""
    r = (len(taps) - 1) // 2
    acc = np.zeros_like(p)
    degenerate = p.shape[0] == 1
    for t, w in enumerate(taps):
        shifted = p if degenerate else np.roll(p, r - t, axis=0)
        acc = acc + shifted * np.float32(w)
    return acc


def _oracle(h: np.ndarray, strength: float, radius: float) -> np.ndarray:
    """f32 numpy twin of ops/ambient_occlusion.ao_plane."""
    from kanter_core_tpu.ops.blur import gaussian_taps

    h = np.asarray(h, np.float32)
    occ = None
    for sigma in ao_sigmas(radius):
        taps = gaussian_taps(sigma)
        b = _np_blur_axis0(_np_blur_axis0(h, taps).T, taps).T
        o = np.maximum(b - h, np.float32(0.0))
        occ = o if occ is None else occ + o
    st = np.float32(strength) * np.float32(1.0 / 3.0)  # scalar fold first
    return np.clip(np.float32(1.0) - st * occ, 0.0, 1.0)


def _build(strength=2.0, radius=2.0):
    g = NodeGraph()
    noise = g.add_node(Node(NodeType.Noise(97, 83, cells=5, octaves=3, seed=7)))
    ao = g.add_node(Node(NodeType.AmbientOcclusion(strength, radius)))
    g.connect(noise, ao, SlotId(0), SlotId(0))
    out = g.add_node(Node(NodeType.OutputGray("out")))
    g.connect(ao, out, SlotId(0), SlotId(0))
    return g, ao, out


def test_ao_serde_round_trip():
    g, ao, _ = _build(1.5, 3.0)
    clone = NodeGraph.from_json(g.to_json())
    assert clone.to_json() == g.to_json()
    assert clone.node(ao).node_type.payload == (1.5, 3.0)


def test_ao_strength_is_argument_radius_is_structure():
    g1, _, _ = _build(strength=1.0, radius=2.0)
    g2, _, _ = _build(strength=42.0, radius=2.0)
    g3, _, _ = _build(strength=1.0, radius=5.0)
    assert graph_fingerprint(g1) == graph_fingerprint(g2)
    assert graph_fingerprint(g1) != graph_fingerprint(g3)


def test_ao_rejects_bad_radius():
    with pytest.raises(TexProError):
        NodeType.AmbientOcclusion(1.0, 0.0)
    # radius bakes O(radius) Gaussian tap tables — absurd payloads are
    # rejected, not host-hung (r4 payload-hazard class; radius 8 already
    # OOM'd the jnp blur fallback at 4k in bench_ops)
    with pytest.raises(TexProError):
        NodeType.AmbientOcclusion(1.0, 1e9)
    NodeType.AmbientOcclusion(1.0, 64.0)  # the cap itself is fine


@pytest.mark.parametrize("shape", [(33, 41), (1, 17), (19, 1), (2, 2)])
def test_ao_matches_numpy_oracle_bitwise(shape):
    import jax

    from kanter_core_tpu.ops.ambient_occlusion import ao_plane

    rng = np.random.default_rng(sum(shape))
    h = rng.random(shape, np.float32)
    got = np.asarray(
        jax.jit(lambda s, p: ao_plane(p, s, 1.5))(np.float32(2.5), h)
    )
    assert got.tobytes() == _oracle(h, 2.5, 1.5).tobytes()


def test_ao_semantics_pit_darkens_ridge_does_not():
    """A single pit (below flat surroundings) occludes itself; a single
    spike occludes its NEIGHBORS (their blurred mean rises above them) but
    never below the flat baseline more than the pit's own center; the far
    field stays ~1. Wrap reaches across the toroidal edge."""
    import jax

    from kanter_core_tpu.ops.ambient_occlusion import ao_plane

    f = jax.jit(lambda s, p: ao_plane(p, s, 1.0))
    flat = np.full((32, 32), 0.5, np.float32)
    base = np.asarray(f(np.float32(4.0), flat))
    assert (base > 0.999).all()  # tap-sum rounding keeps it within ulps of 1

    pit = flat.copy()
    pit[0, 0] = 0.0  # corner pit: occlusion wraps
    got = np.asarray(f(np.float32(4.0), pit))
    assert got[0, 0] < base[0, 0] - 0.01  # the pit itself darkens most
    assert got[16, 16] > 0.999  # far field untouched
    # wrap neighbors brighten relative to the pit (they sit ABOVE the
    # local blurred mean): strictly lighter than the pit center
    assert got[31, 0] > got[0, 0] and got[0, 31] > got[0, 0]


def test_ao_four_consumer_parity():
    """fused == eager == tiled engine pixels, and bucketed == fused f32."""
    from kanter_core_tpu.bucketed import BucketedGraph

    px = {}
    for mode, kw, auto in (
        ("fused", {}, False),
        ("eager", {}, True),
        ("tiled", {"tile_bytes": 1}, False),
    ):
        tp = TextureProcessor(10_000_000, **kw)
        try:
            g, ao, out = _build()
            lg = tp.new_live_graph()
            with lg.write() as gg:
                gg.set_node_graph(g)
                gg.auto_update = auto
            px[mode] = render_u8(lg, out)
        finally:
            tp.shutdown_now()
    assert np.array_equal(px["fused"], px["eager"])
    assert np.array_equal(px["fused"], px["tiled"])

    g, ao, out = _build()
    ref = CompiledGraph(g, targets=[(out, SlotId(0))])()[(out, SlotId(0))]
    bg = BucketedGraph(g, targets=[(out, SlotId(0))])
    got = bg()[(out, SlotId(0))]
    assert len(ref) == len(got)
    for r, q in zip(ref, got):
        assert np.array_equal(np.asarray(r), q)


@pytest.mark.parametrize("band_rows", [1, 13, 64])
def test_ao_tiled_band_sizes_bit_transparent(band_rows):
    """Band granularity is unobservable: any band row budget reproduces the
    dense fused pixels bitwise (the halo hoists ±ceil(12·radius) rows)."""
    from kanter_core_tpu.tiled import TiledEvaluator

    g, ao, out = _build(strength=3.0, radius=1.0)
    targets = [(out, SlotId(0))]
    prog = CompiledGraph(g, targets=targets)
    dense = prog()[(out, SlotId(0))]
    bindings = {
        key: tuple(np.asarray(p) for p in value) if isinstance(value, tuple) else value
        for key, value in prog._bindings.items()
    }
    ev = TiledEvaluator(g, targets, bindings, band_rows=band_rows)
    banded = ev.run()[(out, SlotId(0))]
    for d, b in zip(dense, banded):
        assert np.array_equal(np.asarray(d), np.asarray(b))


def test_ao_slider_drag_reuses_program_radius_refingerprints():
    """Strength edits ride as arguments (no new fused programs past the
    partition split); a radius edit mints a new program; the setter
    rejects non-AO nodes."""
    tp = TextureProcessor(10_000_000)
    try:
        g, ao, out = _build()
        lg = tp.new_live_graph()
        with lg.write() as gg:
            gg.set_node_graph(g)
        renders = [render_u8(lg, out)]
        for strength in (0.5, 4.0, 9.0):
            with lg.write() as gg:
                gg.set_ambient_occlusion(ao, strength, 2.0)
                assert gg.node_state(ao) == NodeState.DIRTY
            renders.append(render_u8(lg, out))
        for a, b in zip(renders, renders[1:]):
            assert not np.array_equal(a, b), "AO edit did not change pixels"
        programs_after_drags = len(tp.engine._fused_programs)
        assert programs_after_drags == 2  # full graph + edited sub-partition
        with lg.write() as gg:
            gg.set_ambient_occlusion(ao, 9.0, 4.0)  # radius edit
        renders.append(render_u8(lg, out))
        assert not np.array_equal(renders[-1], renders[-2])
        assert len(tp.engine._fused_programs) == programs_after_drags + 1
        with lg.write() as gg:
            with pytest.raises(TexProError):
                gg.set_ambient_occlusion(out, 1.0, 1.0)  # not an AO node
    finally:
        tp.shutdown_now()


def test_ao_rejects_rgba_input():
    from conftest import HEART_128

    g = NodeGraph()
    img = g.add_node(Node(NodeType.Image(str(HEART_128))))
    ao = g.add_node(Node(NodeType.AmbientOcclusion()))
    with pytest.raises(TexProError):
        g.connect(img, ao, SlotId(0), SlotId(0))  # GRAY slot refuses RGBA


def test_ao_scale_ladder_is_octaves():
    assert AO_SCALE_FACTORS == (1.0, 2.0, 4.0)
    assert ao_sigmas(1.5) == (1.5, 3.0, 6.0)
