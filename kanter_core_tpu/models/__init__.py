"""Model zoo — for a texture engine, "models" are graph templates.

Re-exports the canonical pipelines from `kanter_core_tpu.graphs` (the
reference ships exactly one: the invert subgraph in `data/invert_graph.json`).
"""

from ..graphs import (
    blend_graph,
    blur_graph,
    channel_shuffle_graph,
    deep_chain_graph,
    invert_graph,
    normal_map_graph,
    resize_pyramid_graph,
)

__all__ = [
    "blend_graph",
    "blur_graph",
    "channel_shuffle_graph",
    "deep_chain_graph",
    "invert_graph",
    "normal_map_graph",
    "resize_pyramid_graph",
]
