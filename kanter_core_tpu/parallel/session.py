"""BatchedLiveSession: interactive editing over N canvases at once.

The engine's LiveGraph tracks one canvas per plane; production workloads
(BASELINE config 5: "16×4k canvases batched") want the same interactive
editing loop over a whole batch. This session object keeps a `NodeGraph`,
tracks edits by structure fingerprint, and evaluates through a vmapped
fused program (`BatchedGraph`): value/input edits re-run the cached
executable; structural edits recompile once and reuse thereafter (programs
are cached per fingerprint like the engine's).
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from ..compiler import collect_value_bindings, graph_fingerprint
from ..ids import NodeId, SlotId
from ..node_graph import NodeGraph
from .sharded import BatchedGraph


class BatchedLiveSession:
    def __init__(
        self,
        node_graph: NodeGraph,
        batch_input_ids: list[NodeId],
        targets: Optional[list[tuple]] = None,
        mesh=None,
        dtype=None,
    ):
        from ..compiler import resolve_dtype

        self.node_graph = node_graph
        self.batch_input_ids = [NodeId(n) for n in batch_input_ids]
        self.targets = targets
        self.mesh = mesh
        # pipeline storage dtype (DESIGN.md §9); input batches upload at
        # this dtype so the device arrays themselves are half-size in bf16
        self.dtype = resolve_dtype(dtype)
        self._inputs: dict[str, tuple] = {}
        from collections import OrderedDict

        self._programs: "OrderedDict[str, BatchedGraph]" = OrderedDict()
        self.program_cache_cap = 32  # structural edits mint programs; bound them
        self._dirty = True
        self._last_result = None
        self._last_stamp = None  # image-file stamps at the last render

    # --- edits ---
    def set_input(self, input_node_id: NodeId, stacked_planes) -> None:
        """Bind a `[B, H, W]`-stacked gray plane batch to an InputGray node."""
        import jax

        key = f"input_{int(input_node_id)}"
        host = np.asarray(np.asarray(stacked_planes, dtype=np.float32), self.dtype)
        if self.mesh is not None:
            # ONE device_put straight to the sharded layout (a plain
            # device_put first would commit the full batch to device 0 —
            # an extra whole-batch transfer plus an HBM spike — before
            # resharding). Shard the batch axis when the mesh has one, the
            # row axis on a spatial-only mesh (when divisible), else
            # replicate — BatchedGraph accepts all three mesh shapes.
            from jax.sharding import NamedSharding, PartitionSpec as P

            from .sharded import BATCH_AXIS, ROW_AXIS

            names = self.mesh.axis_names
            if (
                BATCH_AXIS in names
                and host.shape[0] % self.mesh.shape[BATCH_AXIS] == 0
            ):
                # (indivisible batches degrade to replicate, same as the
                # rows branch — device_put would raise at edit time)
                spec = P(BATCH_AXIS, None, None)
            elif (
                ROW_AXIS in names
                and host.shape[1] % self.mesh.shape[ROW_AXIS] == 0
            ):
                spec = P(None, ROW_AXIS, None)
            else:
                spec = P(None, None, None)
            value = jax.device_put(host, NamedSharding(self.mesh, spec))
        else:
            value = jax.device_put(host)
        self._inputs[key] = (value,)
        self._dirty = True

    def set_value(self, node_id: NodeId, value: float) -> None:
        from ..errors import ErrorKind, TexProError
        from ..node import NodeType, NodeTypeKind

        node = self.node_graph._node_with_id_mut(NodeId(node_id))
        if node is None or node.node_type.kind != NodeTypeKind.VALUE:
            raise TexProError(ErrorKind.INVALID_NODE_TYPE, "set_value targets a Value node")
        node.node_type = NodeType.Value(value)
        self._dirty = True

    def edit(self, fn) -> None:
        """Arbitrary structural edit: `fn(node_graph)`; recompiles lazily."""
        fn(self.node_graph)
        self._dirty = True

    # --- evaluation ---
    def render(self) -> dict:
        """{(node_id, slot_id): [B, ...] planes} for the targets."""
        # Image-node pixels are decoded into the program's bindings at
        # construction; stamp each file's (size, mtime_ns) into the cache
        # key so rewriting a file in place mints a fresh program instead of
        # serving compile-time pixels forever (the engine path guards this
        # the same way — `recipe_cache._nested_content_stamp`). The stamp
        # is re-taken on EVERY render (a few os.stat calls) so a file-only
        # change invalidates the clean-session short-circuit too — without
        # it, `render(); rewrite file; render()` served stale pixels.
        from ..recipe_cache import _nested_content_stamp

        stamp = repr(_nested_content_stamp(self.node_graph))
        if (
            not self._dirty
            and self._last_result is not None
            and stamp == self._last_stamp
        ):
            return self._last_result
        self._last_stamp = stamp
        fingerprint = graph_fingerprint(self.node_graph) + stamp
        program = self._programs.get(fingerprint)
        if program is None:
            batch_keys = {f"input_{int(n)}" for n in self.batch_input_ids}
            program = BatchedGraph(
                self.node_graph.clone(),
                batch_keys=batch_keys,
                targets=self.targets,
                mesh=self.mesh,
                dtype=self.dtype,
            )
            self._programs[fingerprint] = program
            while len(self._programs) > self.program_cache_cap:
                self._programs.popitem(last=False)
        else:
            self._programs.move_to_end(fingerprint)
        overrides = dict(self._inputs)
        for key, value in collect_value_bindings(self.node_graph).items():
            overrides[key] = value
        self._last_result = program(**overrides)
        self._dirty = False
        return self._last_result
