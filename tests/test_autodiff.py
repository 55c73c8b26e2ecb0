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
