"""Value / Image / Write / Input / Output ops.

Mirror `/root/reference/src/node/{value,image,write,input_rgba,input_gray,
output}.rs`.
"""

from __future__ import annotations

import numpy as np

from ..ids import SlotId
from ..slot_data import SlotData
from ..slot_image import SlotImage
from ..transient_buffer import pixel_buffer, plane_from_host
from .image_io import magenta_placeholder, read_slot_image, save_rgba_png


def process_value(node, value: float):
    """1×1 Gray constant (`value.rs:14-26`); consumers upscale it via their
    resize policy, which XLA sees as a broadcast."""
    plane = plane_from_host(np.full((1, 1), np.float32(value), dtype=np.float32))
    return [SlotData(node.node_id, SlotId(0), SlotImage([plane]))]


def process_image(node, path):
    """Host-side decode → device upload; any load error degrades to a 1×1
    magenta placeholder instead of failing the graph (`image.rs:11-19`)."""
    try:
        slot_image = read_slot_image(path)
    except Exception:  # noqa: BLE001
        slot_image = magenta_placeholder()
    return [SlotData(node.node_id, SlotId(0), slot_image)]


def process_write(slot_datas, path):
    """Device→host download + PNG encode (`write.rs:5-21`); no outputs.

    A save failure (unwritable/nonexistent path — a USER-PAYLOAD hazard,
    the same class as a bad Image path, which degrades to magenta) raises
    a diagnosable IO TexProError instead of an OSError the engine would
    treat as an internal fault: the engine then fails only THIS graph and
    the processor stays alive (`engine._graph_fatal`; r5, pinned by
    `test_payload_fuzz.py::test_write_failure_is_graph_fatal_only`)."""
    if slot_datas:
        slot_data = slot_datas[0]
        try:
            save_rgba_png(path, slot_data.image.to_u8(), slot_data.size())
        except OSError as e:
            from ..errors import ErrorKind, TexProError

            raise TexProError(
                ErrorKind.IO, f"Write node could not save {path!r}: {e}"
            ) from e
    return []


def process_input_rgba(node, input_slot_datas):
    """Passthrough of the first provided input slot data (`input_rgba.rs:7-13`
    — the reference indexes `[0]` unconditionally)."""
    source = input_slot_datas[0]
    return [SlotData(node.node_id, SlotId(0), source.image)]


def process_input_gray(node, input_slot_datas):
    """Passthrough of the input slot data registered under this node's id
    (`input_gray.rs:7-16`); empty when missing."""
    for slot_data in input_slot_datas:
        if slot_data.node_id == node.node_id:
            return [SlotData(node.node_id, SlotId(0), slot_data.image)]
    return []


def process_output(slot_datas, node):
    """Re-keys its input, or emits a 1×1 black/transparent-black default when
    unconnected (`output.rs:12-33`)."""
    from ..node import NodeTypeKind

    if slot_datas:
        slot_data = slot_datas[0]
        return [SlotData(node.node_id, SlotId(0), slot_data.image)]

    if node.node_type.kind == NodeTypeKind.OUTPUT_RGBA:
        image = SlotImage(
            [pixel_buffer(0.0), pixel_buffer(0.0), pixel_buffer(0.0), pixel_buffer(1.0)]
        )
    elif node.node_type.kind == NodeTypeKind.OUTPUT_GRAY:
        image = SlotImage([pixel_buffer(0.0)])
    else:
        raise AssertionError("output op on a non-output node")
    return [SlotData(node.node_id, SlotId(0), image)]
