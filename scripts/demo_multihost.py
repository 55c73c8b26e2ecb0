"""Multi-host (multi-controller) validation of the sharded library path.

DESIGN.md §6 / SURVEY §2's parallelism table claim the scale-out design is
GSPMD over a `jax.sharding.Mesh`, which extends to multi-host (DCN) by
construction — but until now that was untested ("Known limits"). This demo
runs the REAL multi-controller path: two OS processes, each owning 4
virtual CPU devices, joined through `jax.distributed.initialize` into one
8-device global mesh. Each process feeds only its addressable shards of a
batched canvas (`jax.make_array_from_process_local_data`), evaluates the
same `BatchedGraph` program (GSPMD partitions it; cross-host collectives
ride the distributed runtime), gathers the result with
`multihost_utils.process_allgather`, and CRC-compares against a
single-process reference evaluation of the identical inputs.

PASS = both workers print the reference CRC. Run:

    python scripts/demo_multihost.py            # orchestrates everything

Exercises: multi-controller init, global-mesh construction from
per-process device sets, per-process shard feeding, cross-process
allgather, and bit-equality of the sharded result with single-process
evaluation (the same contract `dryrun_multichip` proves single-process).
"""

from __future__ import annotations

import os
import subprocess
import sys
import zlib

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)  # workers run as `python scripts/...` from anywhere
BATCH, H, W = 8, 64, 64
NPROC = 2
DEVICES_PER_PROC = 4
# overridable so the suite test (tests/test_multihost.py) can pick a free
# port per run instead of colliding on a fixed one
COORD = os.environ.get("KANTER_MULTIHOST_COORD", "127.0.0.1:19833")


def _build_graph():
    from kanter_core_tpu import MixType, Node, NodeGraph, NodeType, SlotId

    graph = NodeGraph()
    gin = graph.add_node(Node(NodeType.InputGray("in")))
    gain = graph.add_node(Node(NodeType.Value(0.8125)))
    mul = graph.add_node(Node(NodeType.Mix(MixType.MULTIPLY)))
    inv_one = graph.add_node(Node(NodeType.Value(1.0)))
    sub = graph.add_node(Node(NodeType.Mix(MixType.SUBTRACT)))
    blur = graph.add_node(Node(NodeType.Blur(1.0)))
    out = graph.add_node(Node(NodeType.OutputGray("out")))
    graph.connect(gin, mul, SlotId(0), SlotId(0))
    graph.connect(gain, mul, SlotId(0), SlotId(1))
    graph.connect(inv_one, sub, SlotId(0), SlotId(0))
    graph.connect(mul, sub, SlotId(0), SlotId(1))
    graph.connect(sub, blur, SlotId(0), SlotId(0))
    graph.connect(blur, out, SlotId(0), SlotId(0))
    return graph, gin, out


def _input_batch() -> np.ndarray:
    rng = np.random.default_rng(42)
    return rng.random((BATCH, H, W), dtype=np.float32)


def _crc(arr: np.ndarray) -> str:
    return f"{zlib.crc32(np.ascontiguousarray(arr).tobytes()):08x}"


def reference_crc() -> str:
    """Single-process evaluation of the same graph/inputs (run in a
    subprocess so its JAX runtime is independent of the workers')."""
    out = subprocess.run(
        [sys.executable, os.path.abspath(__file__), "--single"],
        check=True, capture_output=True, text=True, cwd=REPO,
    )
    return out.stdout.strip().splitlines()[-1]


def run_single() -> None:
    import jax

    jax.config.update("jax_platforms", "cpu")
    from kanter_core_tpu import SlotId
    from kanter_core_tpu.parallel import BatchedGraph

    graph, gin, out = _build_graph()
    bg = BatchedGraph(graph, batch_keys={f"input_{int(gin)}"}, targets=[(out, SlotId(0))])
    result = bg(**{f"input_{int(gin)}": (_input_batch(),)})
    plane = np.asarray(result[(out, SlotId(0))][0], np.float32)
    print(_crc(plane))


def run_worker(process_id: int) -> None:
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + f" --xla_force_host_platform_device_count={DEVICES_PER_PROC}"
    )
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(
        coordinator_address=COORD, num_processes=NPROC, process_id=process_id
    )
    import jax.numpy as jnp
    from jax.experimental import multihost_utils
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from kanter_core_tpu import SlotId
    from kanter_core_tpu.parallel import BatchedGraph

    assert jax.device_count() == NPROC * DEVICES_PER_PROC
    assert jax.local_device_count() == DEVICES_PER_PROC

    mesh = Mesh(np.asarray(jax.devices()), ("batch",))
    sharding = NamedSharding(mesh, P("batch", None, None))

    # each process owns only ITS batch rows — the global array is assembled
    # from per-process shards, never fully resident on one host
    full = _input_batch()
    local_rows = BATCH // NPROC
    local = full[process_id * local_rows : (process_id + 1) * local_rows]
    global_batch = jax.make_array_from_process_local_data(sharding, local)

    graph, gin, out = _build_graph()
    bg = BatchedGraph(
        graph, batch_keys={f"input_{int(gin)}"}, targets=[(out, SlotId(0))], mesh=mesh
    )
    result = bg(**{f"input_{int(gin)}": (global_batch,)})[(out, SlotId(0))][0]
    gathered = np.asarray(
        multihost_utils.process_allgather(result, tiled=True), np.float32
    )
    assert gathered.shape == (BATCH, H, W)
    print(f"worker {process_id} crc: {_crc(gathered)}", flush=True)
    print(_crc(gathered))
    jax.distributed.shutdown()


def orchestrate() -> int:
    ref = reference_crc()
    print(f"single-process reference crc: {ref}")

    # drain worker output CONCURRENTLY: a sequential communicate(worker 0)
    # while worker 1 blocks on a full stderr pipe (verbose XLA distributed
    # logging can exceed 64 KB) deadlocks both sides of the collective
    # until the timeout — drain each worker from its own thread instead
    import threading

    workers = [
        subprocess.Popen(
            [sys.executable, os.path.abspath(__file__), "--worker", str(i)],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True, cwd=REPO,
        )
        for i in range(NPROC)
    ]
    results: list = [None] * NPROC

    def drain(i, proc):
        results[i] = proc.communicate(timeout=600)

    threads = [
        threading.Thread(target=drain, args=(i, p), daemon=True)
        for i, p in enumerate(workers)
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=620)
    crcs = []
    for i, proc in enumerate(workers):
        if results[i] is None:
            proc.kill()
            print(f"worker {i} TIMED OUT", file=sys.stderr)
            return 1
        out, err = results[i]
        if proc.returncode != 0:
            print(f"worker {i} FAILED:\n{err[-2000:]}", file=sys.stderr)
            return 1
        crcs.append(out.strip().splitlines()[-1])
    print(f"worker crcs: {crcs}")
    if all(c == ref for c in crcs):
        print(f"MULTIHOST OK: {NPROC} processes x {DEVICES_PER_PROC} devices, "
              f"batch {BATCH}x{H}x{W} sharded across hosts, "
              f"crc {ref} == single-process")
        return 0
    print("MULTIHOST MISMATCH", file=sys.stderr)
    return 1


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--single":
        run_single()
    elif len(sys.argv) > 1 and sys.argv[1] == "--worker":
        run_worker(int(sys.argv[2]))
    else:
        raise SystemExit(orchestrate())
