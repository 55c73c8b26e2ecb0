"""Benchmark: fused-graph throughput + incremental re-eval latency.

Mirrors BASELINE.json config 4/5: a 64-node invert/blend chain over a 4k
RGBA canvas, compiled by `kanter_core_tpu.compiler` into one fused XLA
program, plus the interactive path (re-run after a Value-node edit — a
program-cache hit that only re-executes the compiled executable).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

The north-star target is >=50 Gpixel/s fused-graph throughput on a v5e-8;
per chip that is 6.25 Gpixel/s, which is the baseline this reports against.
Throughput counts each compute node's full canvas once (nodes x H x W / s),
i.e. the rate at which graph-node evaluations retire pixels.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

CANVAS = int(os.environ.get("KANTER_BENCH_CANVAS", "4096"))
CHAIN = int(os.environ.get("KANTER_BENCH_CHAIN", "64"))
REPS = int(os.environ.get("KANTER_BENCH_REPS", "10"))
TARGET_PER_CHIP_GPIX = 50.0 / 8.0  # v5e-8 north star, per chip


def build_chain_graph():
    from kanter_core_tpu import MixType, Node, NodeGraph, NodeType, SlotId

    graph = NodeGraph()
    inputs = [graph.add_node(Node(NodeType.InputGray(f"in{i}"))) for i in range(4)]
    combine = graph.add_node(Node(NodeType.CombineRgba()))
    for i, node in enumerate(inputs):
        graph.connect(node, combine, SlotId(0), SlotId(i))

    white = graph.add_node(Node(NodeType.Value(1.0)))
    prev = combine
    mix_nodes = []
    for i in range(CHAIN):
        if i % 2 == 1:
            # square: Multiply(prev, prev) — nonlinear, so XLA cannot
            # algebraically collapse the chain into one affine op.
            mix = graph.add_node(Node(NodeType.Mix(MixType.MULTIPLY)))
            graph.connect(prev, mix, SlotId(0), SlotId(0))
            graph.connect(prev, mix, SlotId(0), SlotId(1))
        else:
            # blend with the constant; the RGBA chain stays on the left slot,
            # which drives the mix output type (`mix.rs:57-68`).
            mix = graph.add_node(
                Node(NodeType.Mix(MixType.ADD if i % 4 == 0 else MixType.SUBTRACT))
            )
            graph.connect(prev, mix, SlotId(0), SlotId(0))
            graph.connect(white, mix, SlotId(0), SlotId(1))
        mix_nodes.append(mix)
        prev = mix
    out = graph.add_node(Node(NodeType.OutputRgba("out")))
    graph.connect(prev, out, SlotId(0), SlotId(0))
    return graph, inputs, white, out, len(mix_nodes) + 1  # + combine


def main() -> None:
    import jax

    from kanter_core_tpu.compiler import CompiledGraph
    from kanter_core_tpu import SlotId

    backend = jax.default_backend()
    graph, inputs, white, out, compute_nodes = build_chain_graph()

    prog = CompiledGraph(graph, targets=[(out, SlotId(0))])
    rng = np.random.default_rng(0)
    for node in inputs:
        plane = rng.random((CANVAS, CANVAS), dtype=np.float32)
        prog.bind_input(node, [jax.device_put(plane)])

    # warmup / compile
    jax.block_until_ready(prog())
    jax.block_until_ready(prog())

    # Vary the Value binding each rep so every execution is distinct work
    # (identical dispatches can be deduplicated by remote-tunnel backends).
    white_key = f"value_{int(white)}"
    t0 = time.perf_counter()
    results = [prog(**{white_key: np.float32(1.0 + i * 1e-6)}) for i in range(REPS)]
    jax.block_until_ready(results)
    elapsed = (time.perf_counter() - t0) / REPS

    pixels = compute_nodes * CANVAS * CANVAS
    gpix_per_s = pixels / elapsed / 1e9

    # incremental path: edit one Value node (unique value per edit), re-run
    # the cached executable synchronously — the interactive latency.
    lat = []
    for i in range(20):
        prog.set_value(white, 1.0 - (i + 1) * 1e-6)
        t0 = time.perf_counter()
        jax.block_until_ready(prog())
        lat.append((time.perf_counter() - t0) * 1000.0)
    incremental_p50_ms = float(np.percentile(lat, 50))

    print(
        json.dumps(
            {
                "metric": f"fused {CHAIN}-node chain @ {CANVAS}^2 RGBA, {backend} ({jax.device_count()} dev)",
                "value": round(gpix_per_s, 3),
                "unit": "Gpixel/s/chip (node-evals x pixels / s)",
                "vs_baseline": round(gpix_per_s / TARGET_PER_CHIP_GPIX, 3),
                "incremental_p50_ms": round(incremental_p50_ms, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
