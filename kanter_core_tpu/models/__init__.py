"""Model zoo — for a texture engine, "models" are graph templates.

Re-exports the canonical pipelines from `kanter_core_tpu.graphs` (the
reference ships exactly one: the invert subgraph in `data/invert_graph.json`)
and adds the material generators in `models.materials` — multi-output
height→PBR pipelines (normal/AO/roughness/albedo) built from the node
vocabulary.
"""

from .materials import (
    ambient_occlusion_graph,
    emboss_graph,
    pbr_material_graph,
)

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
    "ambient_occlusion_graph",
    "emboss_graph",
    "pbr_material_graph",
    "blend_graph",
    "blur_graph",
    "channel_shuffle_graph",
    "deep_chain_graph",
    "invert_graph",
    "normal_map_graph",
    "resize_pyramid_graph",
]
