"""Graph op: nested subgraph execution.

Mirrors `/root/reference/src/node/graph.rs`: the node's embedded `NodeGraph`
is instantiated as a fresh `LiveGraph` on the *same* `TextureProcessor`; outer
inputs are mapped to inner Input nodes by the `SlotId(n) ≡ inner NodeId(n)`
convention (`graph.rs:25-31`, `node_graph.rs:271-313`); the worker blocks
until every inner Output node is clean and re-keys its data as
`(outer node id, SlotId(inner output node id))` (`graph.rs:37-48`).

The nested LiveGraph is removed from the processor when done (the reference
relies on Arc refcount GC, `live_graph.rs:637-645`).
"""

from __future__ import annotations

from ..ids import NodeId, SlotId
from ..slot_data import SlotData


def process(slot_datas, node, node_graph, tex_pro):
    from ..live_graph import LiveGraph

    live_graph = LiveGraph(tex_pro.buffer_queue)
    live_graph.history_capacity = 0  # throwaway per-eval graph: no undo
    live_graph.set_node_graph(node_graph.clone())

    for slot_data in slot_datas:
        live_graph.add_input_slot_data(
            SlotData(NodeId(int(slot_data.slot_id)), SlotId(0), slot_data.image)
        )

    tex_pro.push_live_graph(live_graph)
    try:
        output = []
        output_node_ids = live_graph.output_ids()
        for output_node_id in output_node_ids:
            with LiveGraph.await_clean_read(live_graph, output_node_id) as lg:
                for slot_data in lg.node_slot_datas(output_node_id):
                    output.append(
                        SlotData(node.node_id, SlotId(int(output_node_id)), slot_data.image)
                    )
        return output
    finally:
        tex_pro.remove_live_graph(live_graph)
