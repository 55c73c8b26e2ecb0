"""Scheduler: turns dirty graph state into device dispatches.

Port of `/root/reference/src/engine.rs`. Each tick:

1. commit finished node results (state transitions, cache eviction,
   commit-time cancel/ProcessingDirty check — `engine.rs:34-123`);
2. drop orphaned live graphs (`engine.rs:126`);
3. per live graph, gather requested nodes (all non-clean under `auto_update`,
   else Requested/Prioritised), walk to the closest-processable frontier, and
   propagate priorities (`engine.rs:128-183`);
4. admission-control the frontier via `ProcessPackManager` (`:185-198`);
5. dispatch each admitted node (`:200-307`).

Where the reference spawns one OS thread per node running scalar pixel loops,
a dispatch here is a worker thread that launches cached-jitted XLA programs on
the accelerator and returns device-array handles; JAX's async dispatch means
the device pipelines work from many dispatch threads. The 1 ms polling loop is
replaced by a condition variable kicked by workers and graph edits, with a
1 ms timeout as fallback.

Fatal kernel errors mirror the reference's engine panic (`engine.rs:111-119`)
by setting `shutdown` and recording the error on the live graph so blocked
`await_clean_*` callers re-raise it instead of hanging.
"""

from __future__ import annotations

import queue
import threading

from .errors import ErrorKind, TexProError
from .live_graph import LiveGraph, NodeState
from .process_pack import ProcessPack
from . import ops


class _ThreadMessage:
    __slots__ = ("node_id", "result", "live_graph")

    def __init__(self, node_id, result, live_graph):
        self.node_id = node_id
        self.result = result  # list[SlotData] on success, BaseException on failure
        self.live_graph = live_graph


class Engine:
    TICK_SECONDS = 0.001

    def __init__(self, tex_pro):
        self.tex_pro = tex_pro
        self._results: queue.Queue[_ThreadMessage] = queue.Queue()
        self._wake_cv = threading.Condition(threading.Lock())

    def wake(self) -> None:
        with self._wake_cv:
            self._wake_cv.notify_all()

    def run(self) -> None:
        tex_pro = self.tex_pro
        while not tex_pro.shutdown.load():
            self._drain_results()
            tex_pro.drop_unused_live_graphs()

            process_packs: list[ProcessPack] = []
            for live_graph in tex_pro.live_graphs_snapshot():
                with live_graph.write():
                    process_packs.extend(self._collect_packs(live_graph))
                    live_graph.propagate_priorities()

            admitted = tex_pro.update_process_packs(process_packs)
            if admitted is None:
                return  # unexpected admission error → shutdown (engine.rs:188-197)

            for pack in admitted:
                self._dispatch(pack)

            with self._wake_cv:
                self._wake_cv.wait(timeout=self.TICK_SECONDS)

    # --- result commit (`engine.rs:34-123`) ---
    def _drain_results(self) -> None:
        tex_pro = self.tex_pro
        while True:
            try:
                message = self._results.get_nowait()
            except queue.Empty:
                return
            live_graph = message.live_graph
            if not tex_pro.has_live_graph(live_graph):
                continue
            with live_graph.write() as lg:
                node_id = message.node_id
                if isinstance(message.result, BaseException):
                    error = message.result
                    if isinstance(error, TexProError) and error.kind == ErrorKind.CANCELED:
                        try:
                            node = lg.node(node_id)
                        except TexProError:
                            continue
                        lg.force_state(node_id, NodeState.DIRTY)
                        node.cancel.store(False)
                    else:
                        lg.fatal_error = error
                        tex_pro.shutdown.store(True)
                        lg._notify_state_change()
                    continue

                slot_datas = message.result
                for slot_data in slot_datas:
                    tex_pro.buffer_queue.add_slot_data(slot_data)

                lg.remove_nodes_data(node_id)
                lg.slot_datas.extend(slot_datas)

                # Without use_cache, evict parents whose children are all done
                # or in-flight. (This node is still Processing here — order
                # matters, `engine.rs:58-75`.)
                if not lg.use_cache:
                    for parent in lg.node_graph.get_parents(node_id):
                        children = lg.node_graph.get_children(parent)
                        if all(
                            lg.node_state(c) in (NodeState.CLEAN, NodeState.PROCESSING)
                            for c in children
                        ):
                            lg.remove_nodes_data(parent)

                # Commit-time cancellation: work finished for a node that was
                # edited meanwhile is discarded (`engine.rs:77-102`).
                not_clean = False
                try:
                    node = lg.node(node_id)
                except TexProError:
                    not_clean = True  # node removed while processing
                else:
                    if node.cancel.take() or lg.node_state(node_id) == NodeState.PROCESSING_DIRTY:
                        not_clean = True
                    else:
                        lg.set_state(node_id, NodeState.CLEAN)

                if not_clean:
                    lg.remove_nodes_data(node_id)
                    lg.force_state(node_id, NodeState.DIRTY)

    # --- frontier selection (`engine.rs:128-183`) ---
    def _collect_packs(self, live_graph: LiveGraph) -> list[ProcessPack]:
        if live_graph.auto_update:
            requested = [
                nid
                for nid, state in sorted(live_graph.node_states().items())
                if state
                not in (NodeState.PROCESSING, NodeState.PROCESSING_DIRTY, NodeState.CLEAN)
            ]
        else:
            requested = [
                nid
                for nid, state in sorted(live_graph.node_states().items())
                if state in (NodeState.REQUESTED, NodeState.PRIORITISED)
            ]

        closest: list = []
        for node_id in requested:
            closest.extend(live_graph.get_closest_processable(node_id))
        closest = sorted(set(closest))

        packs = []
        for node_id in closest:
            try:
                node = live_graph.node(node_id)
            except TexProError:
                continue  # node deleted meanwhile
            packs.append(ProcessPack(node_id, node.priority, live_graph))
        return packs

    # --- dispatch (`engine.rs:200-307`) ---
    def _dispatch(self, pack: ProcessPack) -> None:
        tex_pro = self.tex_pro
        live_graph = pack.live_graph
        node_id = pack.node_id

        with live_graph.write() as lg:
            # Mark Processing before snapshotting edges so no new edge sneaks
            # in unnoticed (`engine.rs:205-211`).
            try:
                lg.node_state(node_id)
            except TexProError:
                return
            lg._set_state_raw(node_id, NodeState.PROCESSING)

            edges = [e for e in lg.edges() if e.input_id == node_id]

            try:
                node = lg.node_graph.node(node_id)
            except TexProError:
                return

            embedded_slot_datas = lg.embedded_slot_datas()
            input_slot_datas = lg.input_slot_datas()

            input_data = []
            for edge in edges:
                try:
                    input_data.append(lg.slot_data(edge.output_id, edge.output_slot))
                except TexProError:
                    # A parent's data is missing: re-dirty both and skip.
                    # (The reference's plain set_state leaves this node
                    # ProcessingDirty and stuck; force_state avoids the hang.)
                    lg.set_state(edge.output_id, NodeState.DIRTY)
                    lg.force_state(node_id, NodeState.DIRTY)
                    return

            assert len(edges) == len(input_data), f"NodeType: {node.node_type!r}"

        worker = threading.Thread(
            target=self._worker,
            args=(node, input_data, embedded_slot_datas, input_slot_datas, edges, live_graph),
            daemon=True,
            name=f"kanter-node-{int(node_id)}",
        )
        worker.start()

    def _worker(self, node, input_data, embedded_slot_datas, input_slot_datas, edges, live_graph):
        try:
            result = ops.process_node(
                node, input_data, embedded_slot_datas, input_slot_datas, edges, self.tex_pro
            )
        except BaseException as e:  # noqa: BLE001 — commit decides fatality
            result = e
        self._results.put(_ThreadMessage(node.node_id, result, live_graph))
        self.wake()
