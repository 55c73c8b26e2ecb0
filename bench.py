"""Benchmark: fused-graph throughput + incremental re-eval latency.

Mirrors BASELINE.json configs 4/5: a deep invert/blend/square chain over a
4k RGBA canvas compiled into one fused XLA program (config 4), the
interactive path (re-run after a Value edit — a program-cache hit), and a
16-canvas batched variant (config 5) via vmap.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...}

The north-star target is >=50 Gpixel/s fused-graph throughput on a v5e-8;
per chip that is 6.25 Gpixel/s, the baseline reported against. Throughput
counts each compute node's full canvas once (node-evals × pixels / s). Every
rep binds a unique Value so remote backends cannot dedup identical
dispatches.
"""

from __future__ import annotations

import json
import os
import time

import numpy as np

CANVAS = int(os.environ.get("KANTER_BENCH_CANVAS", "4096"))
CHAIN = int(os.environ.get("KANTER_BENCH_CHAIN", "64"))
REPS = int(os.environ.get("KANTER_BENCH_REPS", "10"))
WINDOWS = int(os.environ.get("KANTER_BENCH_WINDOWS", "6"))
BATCH = int(os.environ.get("KANTER_BENCH_BATCH", "16"))
BATCH_CANVAS = int(os.environ.get("KANTER_BENCH_BATCH_CANVAS", "1024"))
TARGET_PER_CHIP_GPIX = 50.0 / 8.0  # v5e-8 north star, per chip


def main() -> None:
    import jax

    from kanter_core_tpu import SlotId
    from kanter_core_tpu.compiler import CompiledGraph
    from kanter_core_tpu.graphs import deep_chain_graph
    from kanter_core_tpu.parallel import BatchedGraph

    backend = jax.default_backend()
    graph, inputs, white, out = deep_chain_graph(depth=CHAIN)
    compute_nodes = CHAIN + 1  # mixes + combine

    prog = CompiledGraph(graph, targets=[(out, SlotId(0))])
    rng = np.random.default_rng(0)
    for node in inputs:
        plane = rng.random((CANVAS, CANVAS), dtype=np.float32)
        prog.bind_input(node, [jax.device_put(plane)])

    jax.block_until_ready(prog())
    jax.block_until_ready(prog())

    # Throughput: WINDOWS windows of REPS async-pipelined reps; report the
    # best window. The remote tunnel stalls intermittently (one-sided noise
    # that only ever slows a window down), so min-time is the faithful
    # estimator of device capability; unique Value bindings defeat dedup.
    white_key = f"value_{int(white)}"
    window_times = []
    for w in range(WINDOWS):
        t0 = time.perf_counter()
        results = [
            prog(**{white_key: np.float32(1.0 + (w * REPS + i) * 1e-6)})
            for i in range(REPS)
        ]
        jax.block_until_ready(results)
        window_times.append((time.perf_counter() - t0) / REPS)
    elapsed = min(window_times)

    pixels = compute_nodes * CANVAS * CANVAS
    gpix_per_s = pixels / elapsed / 1e9

    # interactive: edit one Value (unique each time), re-run synchronously
    lat = []
    for i in range(20):
        prog.set_value(white, 1.0 - (i + 1) * 1e-6)
        t0 = time.perf_counter()
        jax.block_until_ready(prog())
        lat.append((time.perf_counter() - t0) * 1000.0)
    incremental_p50_ms = float(np.percentile(lat, 50))

    # config 5: BATCH canvases evaluated in one vmapped fused program,
    # re-run per Value edit (batched interactive path)
    bgraph, binputs, bwhite, bout = deep_chain_graph(depth=16)
    batch_keys = {f"input_{int(n)}" for n in binputs}
    bg = BatchedGraph(bgraph, batch_keys=batch_keys, targets=[(bout, SlotId(0))])
    overrides = {}
    for node in binputs:
        stacked = rng.random((BATCH, BATCH_CANVAS, BATCH_CANVAS), dtype=np.float32)
        overrides[f"input_{int(node)}"] = (jax.device_put(stacked),)
    bwhite_key = f"value_{int(bwhite)}"
    overrides[bwhite_key] = np.float32(1.0)  # broadcast across the batch
    jax.block_until_ready(bg(**overrides))
    blat = []
    for i in range(16):
        overrides[bwhite_key] = np.float32(1.0 - (i + 1) * 1e-6)
        t0 = time.perf_counter()
        jax.block_until_ready(bg(**overrides))
        blat.append((time.perf_counter() - t0) * 1000.0)
    # tunnel stalls are one-sided; min is the faithful capability estimator
    batched_ms = float(np.min(blat))
    batched_gpix = 17 * BATCH * BATCH_CANVAS * BATCH_CANVAS / (batched_ms / 1e3) / 1e9

    print(
        json.dumps(
            {
                "metric": f"fused {CHAIN}-node chain @ {CANVAS}^2 RGBA, {backend} ({jax.device_count()} dev)",
                "value": round(gpix_per_s, 3),
                "unit": "Gpixel/s/chip (node-evals x pixels / s)",
                "vs_baseline": round(gpix_per_s / TARGET_PER_CHIP_GPIX, 3),
                "incremental_p50_ms": round(incremental_p50_ms, 3),
                "batched16_reeval_min_ms": round(batched_ms, 3),
                "batched16_gpix_per_s": round(batched_gpix, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
