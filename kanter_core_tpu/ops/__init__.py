"""Op registry + per-node dispatch.

Mirrors `/root/reference/src/node/node_type.rs:98-138,213-267`: `process_node`
sorts the input edges by input slot, resizes mismatched inputs per the node's
resize policy/filter, re-keys the inputs to the consuming node, dispatches on
the node type, and validates the output count against the node's output slot
signature.

Every kernel here is a traceable JAX function dispatched through cached
`jax.jit`; the fused whole-graph path (`kanter_core_tpu.compiler`) reuses the
same kernels.
"""

from __future__ import annotations

from ..errors import ErrorKind, TexProError
from ..node import NodeTypeKind
from ..slot_data import SlotData
from . import (
    ambient_occlusion,
    blur,
    curvature,
    distance,
    embed,
    gradient,
    graph_op,
    height_to_normal,
    hsv,
    inout,
    levels,
    mix,
    noise,
    pattern,
    ramp,
    separate_combine,
    transform,
    voronoi,
    warp,
)
from .resize import resize_buffers


def assign_slot_ids(slot_datas, edges):
    """Re-key producer-keyed slot data to the consuming (node, input slot)
    (`node_type.rs:250-267`)."""
    output = []
    for edge in edges:
        for slot_data in slot_datas:
            if edge.output_slot == slot_data.slot_id and edge.output_id == slot_data.node_id:
                output.append(SlotData(edge.input_id, edge.input_slot, slot_data.image))
                break
        else:
            raise TexProError(ErrorKind.NO_SLOT_DATA)
    return output


def process_node_internal(node, slot_datas, embedded_slot_datas, input_slot_datas, tex_pro):
    shutdown = tex_pro.shutdown
    kind = node.node_type.kind
    K = NodeTypeKind

    if kind == K.INPUT_RGBA:
        output = inout.process_input_rgba(node, input_slot_datas)
    elif kind == K.INPUT_GRAY:
        output = inout.process_input_gray(node, input_slot_datas)
    elif kind in (K.OUTPUT_RGBA, K.OUTPUT_GRAY):
        output = inout.process_output(slot_datas, node)
    elif kind == K.GRAPH:
        output = graph_op.process(slot_datas, node, node.node_type.payload, tex_pro)
    elif kind == K.IMAGE:
        output = inout.process_image(node, node.node_type.payload)
    elif kind == K.EMBED:
        output = embed.process(node, embedded_slot_datas, node.node_type.payload)
    elif kind == K.WRITE:
        output = inout.process_write(slot_datas, node.node_type.payload)
    elif kind == K.VALUE:
        output = inout.process_value(node, node.node_type.payload)
    elif kind == K.MIX:
        output = mix.process(slot_datas, node, node.node_type.payload)
    elif kind == K.HEIGHT_TO_NORMAL:
        output = height_to_normal.process(shutdown, slot_datas, node)
    elif kind == K.CURVATURE:
        output = curvature.process(slot_datas, node)
    elif kind == K.AMBIENT_OCCLUSION:
        output = ambient_occlusion.process(slot_datas, node, mesh=tex_pro.mesh)
    elif kind == K.DISTANCE:
        output = distance.process(slot_datas, node, mesh=tex_pro.mesh)
    elif kind == K.HSV:
        output = hsv.process(slot_datas, node)
    elif kind == K.BLUR:
        output = blur.process(slot_datas, node, node.node_type.payload, mesh=tex_pro.mesh)
    elif kind == K.LEVELS:
        output = levels.process(slot_datas, node)
    elif kind == K.NOISE:
        output = noise.process(node)
    elif kind == K.PATTERN:
        output = pattern.process(node)
    elif kind == K.VORONOI:
        output = voronoi.process(node)
    elif kind == K.RAMP:
        output = ramp.process(node)
    elif kind == K.GRADIENT_MAP:
        output = gradient.process(slot_datas, node)
    elif kind == K.TRANSFORM:
        output = transform.process(slot_datas, node)
    elif kind == K.WARP:
        output = warp.process(slot_datas, node, mesh=tex_pro.mesh)
    elif kind == K.SEPARATE_RGBA:
        output = separate_combine.process_separate(slot_datas, node)
    elif kind == K.COMBINE_RGBA:
        output = separate_combine.process_combine(slot_datas, node)
    else:
        raise TexProError(ErrorKind.INVALID_NODE_TYPE)

    if kind not in (K.OUTPUT_GRAY, K.OUTPUT_RGBA) and len(output) != len(node.output_slots()):
        raise TexProError(
            ErrorKind.INVALID_BUFFER_COUNT,
            f"{len(output)} output buffers for {len(node.output_slots())} output slots "
            f"on {node.node_type!r}",
        )
    return output


def _shard_inputs(slot_datas, mesh):
    """Row-shard a per-node dispatch's input planes over the mesh's first
    axis so GSPMD partitions the eager kernels — the auto_update path's
    mesh story, mirroring `engine._shard_overrides` for fused programs
    (SURVEY §2 #2: device streams replace threads).

    Steady state is free: a node's outputs commit sharded, so its
    consumers' `device_put` with the same sharding is an identity and the
    original PlaneBuffers (with their aliasing) flow through untouched;
    only unsharded leaves (fresh image decodes) pay one placement."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    from ..slot_image import SlotImage
    from ..transient_buffer import plane_from_device

    axis = mesh.axis_names[0]
    n = mesh.devices.shape[0]
    sharding = NamedSharding(mesh, P(axis, None))

    out = []
    for slot_data in slot_datas:
        planes = []
        changed = False
        for plane in slot_data.image.planes:
            data = plane.data()
            # non-divisible row counts stay unsharded (device_put needs
            # divisible chunks — engine._shard_overrides has the full note)
            if (
                getattr(data, "ndim", 0) == 2
                and data.shape[0] >= n
                and data.shape[0] % n == 0
            ):
                placed = jax.device_put(data, sharding)
                if placed is not data:
                    plane = plane_from_device(placed)
                    changed = True
            planes.append(plane)
        out.append(
            SlotData(slot_data.node_id, slot_data.slot_id, SlotImage(planes))
            if changed
            else slot_data
        )
    return out


@__import__("functools").lru_cache(maxsize=8)
def _cast_kernel(dtype_name: str):
    import jax
    import jax.numpy as jnp

    dtype = getattr(jnp, dtype_name)
    return jax.jit(lambda x: x.astype(dtype))


def _to_precision(slot_datas, dtype):
    """Normalize slot-data planes to `dtype` — the per-node twin of the
    fused compiler's upcast/downcast boundaries (DESIGN.md §9: bf16 at
    rest, f32 in flight). Aliased planes stay aliased (cast memo keyed by
    PlaneBuffer id)."""
    from ..slot_data import SlotData
    from ..slot_image import SlotImage
    from ..transient_buffer import plane_from_device

    casts: dict = {}
    out = []
    for slot_data in slot_datas:
        planes = []
        changed = False
        for plane in slot_data.image.planes:
            if plane.dtype == dtype:
                planes.append(plane)
                continue
            key = id(plane)
            if key not in casts:
                casts[key] = plane_from_device(_cast_kernel(dtype.name)(plane.data()))
            planes.append(casts[key])
            changed = True
        out.append(
            SlotData(slot_data.node_id, slot_data.slot_id, SlotImage(planes))
            if changed
            else slot_data
        )
    return out


def process_node(node, slot_datas, embedded_slot_datas, input_slot_datas, edges, tex_pro):
    assert len(edges) == len(slot_datas), f"NodeType: {node.node_type!r}"

    edges = sorted(edges, key=lambda e: e.input_slot)
    if tex_pro.mesh is not None:
        slot_datas = _shard_inputs(slot_datas, tex_pro.mesh)
    slot_datas = resize_buffers(slot_datas, edges, node.resize_policy, node.resize_filter)
    slot_datas = assign_slot_ids(slot_datas, edges)

    output = process_node_internal(
        node, slot_datas, embedded_slot_datas, input_slot_datas, tex_pro
    )
    precision = getattr(tex_pro, "precision", None)
    if precision is not None and precision.name != "float32":
        # bf16 at rest, f32 in flight (DESIGN.md §9): every compute kernel
        # upcasts half-precision operands internally (fresh per consumer,
        # so the converts fuse), aliasing ops pass stored planes through,
        # and outputs COMMIT at the pipeline dtype here. Aliased planes
        # (Output re-keying, SeparateRgba) are already at the pipeline
        # dtype, so the downcast is an identity for them and the aliasing
        # survives.
        output = _to_precision(output, precision)
    return output
