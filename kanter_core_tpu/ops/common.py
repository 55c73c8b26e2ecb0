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


def f32_to_u8(x):
    """THE canonical traceable u8 export conversion — reference semantics
    (`slot_image.rs:142-144`): clamp to [0,1], ×255, NaN→255 (Rust f32::min),
    truncating cast. Every u8 export path (slot_image converters, fused
    compiler) must use this one definition; the C++ variants are
    parity-tested against it.
    """
    import jax.numpy as jnp

    c = jnp.clip(x, 0.0, 1.0)
    v = c * jnp.float32(255.0)
    v = jnp.where(jnp.isnan(v), jnp.float32(255.0), jnp.minimum(v, jnp.float32(255.0)))
    return v.astype(jnp.uint8)
