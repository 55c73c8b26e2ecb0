"""Shared op helpers (`/root/reference/src/node/process_shared.rs`)."""

from __future__ import annotations

from typing import Optional

from ..ids import SlotId


def slot_data_with_name(slot_datas, node, name: str) -> Optional["SlotData"]:
    slot_id = node.input_slot_with_name(name).slot_id
    return slot_data_with_slot_id(slot_datas, slot_id)


def slot_data_with_slot_id(slot_datas, slot_id: SlotId):
    for slot_data in slot_datas:
        if slot_data.slot_id == slot_id:
            return slot_data
    return None
