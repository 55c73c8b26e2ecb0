"""Differentiable graphs: grads through compiled programs and fitting."""

import jax
import jax.numpy as jnp
import numpy as np

from kanter_core_tpu import (
    MixType,
    Node,
    NodeGraph,
    NodeType,
    SlotId,
)
from kanter_core_tpu.autodiff import fit_values, value_grad_fn
from kanter_core_tpu.compiler import CompiledGraph


def _gain_graph():
    """input * gain -> out (gray)."""
    g = NodeGraph()
    inp = g.add_node(Node(NodeType.InputGray("in")))
    gain = g.add_node(Node(NodeType.Value(1.0)))
    mix = g.add_node(Node(NodeType.Mix(MixType.MULTIPLY)))
    out = g.add_node(Node(NodeType.OutputGray("out")))
    g.connect(inp, mix, SlotId(0), SlotId(0))
    g.connect(gain, mix, SlotId(0), SlotId(1))
    g.connect(mix, out, SlotId(0), SlotId(0))
    return g, inp, gain, out


def test_value_grad_matches_finite_difference():
    g, inp, gain, out = _gain_graph()
    prog = CompiledGraph(g, targets=[(out, SlotId(0))])
    rng = np.random.default_rng(0)
    plane = rng.random((32, 32), dtype=np.float32)
    prog.bind_input(inp, [plane])

    def loss(outs):
        return jnp.mean(outs[(out, SlotId(0))][0] ** 2)

    f = value_grad_fn(prog, loss, wrt=[gain])
    v = 0.7
    loss0, grads = f({int(gain): jnp.float32(v)})
    # loss = mean((x*v)^2) = v^2 * mean(x^2); dloss/dv = 2v*mean(x^2)
    expected = 2 * v * float(np.mean(plane.astype(np.float64) ** 2))
    assert abs(float(grads[int(gain)]) - expected) < 1e-4
    assert abs(float(loss0) - v * v * float(np.mean(plane.astype(np.float64) ** 2))) < 1e-5


def test_fit_recovers_gain():
    g, inp, gain, out = _gain_graph()
    prog = CompiledGraph(g, targets=[(out, SlotId(0))])
    rng = np.random.default_rng(1)
    plane = rng.random((64, 64), dtype=np.float32)
    prog.bind_input(inp, [plane])

    true_gain = 0.37
    target = (plane * np.float32(true_gain),)
    values, losses = fit_values(
        prog,
        {(out, SlotId(0)): target},
        wrt=[gain],
        steps=300,
        learning_rate=0.05,
        init={int(gain): 0.9},
    )
    assert losses[-1] < 1e-6, losses[-1]
    assert abs(values[gain] - true_gain) < 1e-2


def test_grad_through_height_to_normal_jnp():
    from kanter_core_tpu.ops.height_to_normal import _h2n_jnp

    rng = np.random.default_rng(2)
    h = rng.random((16, 16), dtype=np.float32)
    grad = jax.grad(lambda x: sum(jnp.sum(p) for p in _h2n_jnp(x)))(h)
    assert np.all(np.isfinite(np.asarray(grad)))


def test_value_grad_fn_rejects_unbound_wrt():
    """A wrt id that is not a top-level Value binding must raise instead of
    silently returning zero gradients (the nested-graph / wrong-node trap)."""
    import pytest

    from kanter_core_tpu import TexProError
    from kanter_core_tpu.autodiff import value_grad_fn

    g = NodeGraph()
    val = g.add_node(Node(NodeType.Value(0.5)))
    out = g.add_node(Node(NodeType.OutputGray("out")))
    g.connect(val, out, SlotId(0), SlotId(0))
    prog = CompiledGraph(g, targets=[(out, SlotId(0))])

    with pytest.raises(TexProError):
        value_grad_fn(prog, lambda outs: 0.0, [out])  # not a Value node id


def test_grad_fn_tracks_binding_edits():
    """The gradient fn reads the program's CURRENT bindings per call (a
    closure snapshot went stale after set_value/bind_input and baked planes
    in as XLA constants)."""
    import jax.numpy as jnp

    g = NodeGraph()
    v1 = g.add_node(Node(NodeType.Value(0.5)))
    v2 = g.add_node(Node(NodeType.Value(0.2)))
    mix = g.add_node(Node(NodeType.Mix(MixType.MULTIPLY)))
    out = g.add_node(Node(NodeType.OutputGray("out")))
    g.connect(v1, mix, SlotId(0), SlotId(0))
    g.connect(v2, mix, SlotId(0), SlotId(1))
    g.connect(mix, out, SlotId(0), SlotId(0))
    prog = CompiledGraph(g, targets=[(out, SlotId(0))])

    from kanter_core_tpu.autodiff import value_grad_fn

    grad_fn = value_grad_fn(
        prog, lambda outs: jnp.sum(outs[(out, SlotId(0))][0]), [v1]
    )
    # d(v1*v2)/d(v1) == v2
    _, g1 = grad_fn({int(v1): jnp.float32(0.5)})
    assert np.isclose(float(g1[int(v1)]), 0.2)
    prog.set_value(v2, 0.8)
    _, g2 = grad_fn({int(v1): jnp.float32(0.5)})
    assert np.isclose(float(g2[int(v1)]), 0.8), "grad fn served stale bindings"


def test_grad_through_warp_gather():
    """Gradients flow THROUGH a Warp node's bilinear gather and the
    unit-interval strength clamp: fitting an upstream Value used as the
    (interior-range) strength map gets a finite-difference-matching
    gradient — the gather's vjp (scatter-add) and the clip's pass-through
    region compose."""
    g = NodeGraph()
    inp = g.add_node(Node(NodeType.InputGray("in")))
    s = g.add_node(Node(NodeType.Value(0.4)))
    wp = g.add_node(Node(NodeType.Warp(33.0, 6.3)))
    out = g.add_node(Node(NodeType.OutputGray("out")))
    g.connect(inp, wp, SlotId(0), SlotId(0))
    g.connect(s, wp, SlotId(0), SlotId(1))
    g.connect(wp, out, SlotId(0), SlotId(0))
    prog = CompiledGraph(g, targets=[(out, SlotId(0))])
    rng = np.random.default_rng(3)
    plane = rng.random((24, 24), dtype=np.float32)
    prog.bind_input(inp, [plane])

    def loss(outs):
        return jnp.mean(outs[(out, SlotId(0))][0] ** 2)

    f = value_grad_fn(prog, loss, wrt=[s])
    v = 0.4
    loss0, grads = f({int(s): jnp.float32(v)})
    grad = float(grads[int(s)])
    eps = 1e-3
    lp, _ = f({int(s): jnp.float32(v + eps)})
    lm, _ = f({int(s): jnp.float32(v - eps)})
    fd = (float(lp) - float(lm)) / (2 * eps)
    assert np.isfinite(grad) and grad != 0.0
    assert abs(grad - fd) < 5e-2 * max(1.0, abs(fd)), (grad, fd)


def test_grad_through_curvature_stencil():
    """Gradients flow THROUGH a Curvature node's wrap-Laplacian: fitting an
    upstream gain Value gets a finite-difference-matching gradient (the
    rolls' vjp is a roll the other way; the clip passes interior values)."""
    g = NodeGraph()
    inp = g.add_node(Node(NodeType.InputGray("in")))
    gain = g.add_node(Node(NodeType.Value(0.6)))
    mix = g.add_node(Node(NodeType.Mix(MixType.MULTIPLY)))
    cv = g.add_node(Node(NodeType.Curvature(0.7)))
    out = g.add_node(Node(NodeType.OutputGray("out")))
    g.connect(inp, mix, SlotId(0), SlotId(0))
    g.connect(gain, mix, SlotId(0), SlotId(1))
    g.connect(mix, cv, SlotId(0), SlotId(0))
    g.connect(cv, out, SlotId(0), SlotId(0))
    prog = CompiledGraph(g, targets=[(out, SlotId(0))])
    rng = np.random.default_rng(5)
    prog.bind_input(inp, [rng.random((24, 24), dtype=np.float32)])

    def loss(outs):
        return jnp.mean((outs[(out, SlotId(0))][0] - 0.4) ** 2)

    f = value_grad_fn(prog, loss, wrt=[gain])
    v = 0.6
    _, grads = f({int(gain): jnp.float32(v)})
    grad = float(grads[int(gain)])
    eps = 1e-3
    lp, _ = f({int(gain): jnp.float32(v + eps)})
    lm, _ = f({int(gain): jnp.float32(v - eps)})
    fd = (float(lp) - float(lm)) / (2 * eps)
    assert np.isfinite(grad) and grad != 0.0
    assert abs(grad - fd) < 5e-2 * max(1.0, abs(fd)), (grad, fd)


def test_grad_through_ambient_occlusion():
    """Gradients flow THROUGH an AmbientOcclusion node's blur/max/clip
    chain: fitting an upstream gain Value gets a finite-difference-matching
    gradient (the blurs' vjp is the mirrored blur; max(0,·) and clip are
    piecewise with active interior regions on a random heightfield)."""
    g = NodeGraph()
    inp = g.add_node(Node(NodeType.InputGray("in")))
    gain = g.add_node(Node(NodeType.Value(0.6)))
    mix = g.add_node(Node(NodeType.Mix(MixType.MULTIPLY)))
    ao = g.add_node(Node(NodeType.AmbientOcclusion(3.0, 1.0)))
    out = g.add_node(Node(NodeType.OutputGray("out")))
    g.connect(inp, mix, SlotId(0), SlotId(0))
    g.connect(gain, mix, SlotId(0), SlotId(1))
    g.connect(mix, ao, SlotId(0), SlotId(0))
    g.connect(ao, out, SlotId(0), SlotId(0))
    prog = CompiledGraph(g, targets=[(out, SlotId(0))])
    rng = np.random.default_rng(9)
    prog.bind_input(inp, [rng.random((24, 24), dtype=np.float32)])

    def loss(outs):
        return jnp.mean((outs[(out, SlotId(0))][0] - 0.4) ** 2)

    f = value_grad_fn(prog, loss, wrt=[gain])
    v = 0.6
    _, grads = f({int(gain): jnp.float32(v)})
    grad = float(grads[int(gain)])
    eps = 1e-3
    lp, _ = f({int(gain): jnp.float32(v + eps)})
    lm, _ = f({int(gain): jnp.float32(v - eps)})
    fd = (float(lp) - float(lm)) / (2 * eps)
    assert np.isfinite(grad) and grad != 0.0
    assert abs(grad - fd) < 5e-2 * max(1.0, abs(fd)), (grad, fd)


def test_grad_through_hsv_hexcone():
    """Gradients flow THROUGH an Hsv node's select-tree transform: fitting
    an upstream gain on the red channel gets a finite-difference-matching
    gradient (selects are piecewise; the fit point sits off the sector
    boundaries)."""
    g = NodeGraph()
    chans = [g.add_node(Node(NodeType.InputGray(n))) for n in ("r", "g", "b")]
    gain = g.add_node(Node(NodeType.Value(0.55)))
    rmix = g.add_node(Node(NodeType.Mix(MixType.MULTIPLY)))
    comb = g.add_node(Node(NodeType.CombineRgba()))
    hs = g.add_node(Node(NodeType.Hsv(77.0, 0.8, 1.1)))
    out = g.add_node(Node(NodeType.OutputRgba("out")))
    g.connect(chans[0], rmix, SlotId(0), SlotId(0))
    g.connect(gain, rmix, SlotId(0), SlotId(1))
    g.connect(rmix, comb, SlotId(0), SlotId(0))
    g.connect(chans[1], comb, SlotId(0), SlotId(1))
    g.connect(chans[2], comb, SlotId(0), SlotId(2))
    g.connect(hs, out, SlotId(0), SlotId(0))
    g.connect(comb, hs, SlotId(0), SlotId(0))
    prog = CompiledGraph(g, targets=[(out, SlotId(0))])
    rng = np.random.default_rng(9)
    for node in chans:
        prog.bind_input(node, [rng.random((16, 16), dtype=np.float32)])

    def loss(outs):
        planes = outs[(out, SlotId(0))]
        return jnp.mean(planes[0] ** 2) + jnp.mean(planes[1] ** 2)

    f = value_grad_fn(prog, loss, wrt=[gain])
    v = 0.55
    _, grads = f({int(gain): jnp.float32(v)})
    grad = float(grads[int(gain)])
    eps = 1e-3
    lp, _ = f({int(gain): jnp.float32(v + eps)})
    lm, _ = f({int(gain): jnp.float32(v - eps)})
    fd = (float(lp) - float(lm)) / (2 * eps)
    assert np.isfinite(grad) and grad != 0.0
    assert abs(grad - fd) < 5e-2 * max(1.0, abs(fd)), (grad, fd)
