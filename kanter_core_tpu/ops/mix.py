"""Mix op: Add/Subtract/Multiply/Divide/Pow over two images.

Mirrors `/root/reference/src/node/mix.rs`. The per-pixel loops of the
reference become one fused XLA kernel per (mix type, gray/rgba) — IEEE f32
semantics are preserved exactly (divide-by-zero produces ±inf/NaN, which the
goldens encode; `mix.rs:179`).

Missing-input defaults (`mix.rs:56-84`):
- only `left`: right = 0.0-image of left's type (left's size);
- only `right`: left = 0.0-image of right's type; right keeps its own type;
- neither: single 1×1 gray 0.0 output.
The RGBA variant computes the three color channels and forces alpha to 1.0
(`mix.rs:194-213`).
"""

from __future__ import annotations

import functools

from ..ids import SlotId
from ..node import MixType
from ..slot_data import SlotData
from ..slot_image import SlotImage
from ..transient_buffer import plane_from_device
from .common import slot_data_with_name


def _binary(mix_type: MixType):
    import jax.numpy as jnp

    # Plain XLA f32 ops are bit-identical to the reference's Rust f32 math on
    # the CPU backend (div is hardware IEEE; pow matches glibc powf exactly —
    # see kanter_core_tpu.precision). TPU divide is a reciprocal-multiply
    # (~1 ulp off on ~30% of inputs), so DIVIDE gets one Dekker-corrected
    # refinement step — verified bit-exact against glibc over the full
    # 256×256 u8-decoded grid on a real v5e chip AND identical to plain
    # hardware division on CPU. `pow` remains ~1 ulp off on TPU.
    if mix_type == MixType.ADD:
        return lambda l, r: l + r
    if mix_type == MixType.SUBTRACT:
        return lambda l, r: l - r
    if mix_type == MixType.MULTIPLY:
        return lambda l, r: l * r
    if mix_type == MixType.DIVIDE:
        return _corrected_div
    if mix_type == MixType.POW:
        return lambda l, r: jnp.power(l, r)
    raise ValueError(mix_type)


def _corrected_div(a, b):
    """Correctly-rounded f32 division on backends whose `div` is approximate.

    q0 = a/b, then one refinement with the EXACT residual r = a − q0·b
    computed via Veltkamp splitting (no FMA needed): q0·b is represented as
    prod + err exactly, so r carries the true rounding error and q0 + r/b
    rounds to the correctly-rounded quotient. Non-finite q0 (x/0, 0/0) is
    passed through untouched to keep the reference's IEEE inf/NaN encoding.
    Fuses into the surrounding elementwise chain; bandwidth-bound cost is
    unchanged.
    """
    import jax.numpy as jnp

    q0 = a / b
    c = jnp.float32(4097.0)  # 2^12 + 1: Veltkamp split constant for f32

    def split(x):
        t = c * x
        hi = t - (t - x)
        return hi, x - hi

    qh, ql = split(q0)
    bh, bl = split(b)
    prod = q0 * b
    err = ((qh * bh - prod) + qh * bl + ql * bh) + ql * bl
    r = (a - prod) - err
    q = q0 + r / b
    return jnp.where(jnp.isfinite(q0), q, q0)


@functools.cache
def _gray_kernel(mix_type: MixType):
    import jax

    return jax.jit(_binary(mix_type))


@functools.cache
def _rgba_kernel(mix_type: MixType):
    import jax
    import jax.numpy as jnp

    op = _binary(mix_type)

    @jax.jit
    def kernel(l0, l1, l2, r0, r1, r2):
        alpha = jnp.ones_like(l0)
        return op(l0, r0), op(l1, r1), op(l2, r2), alpha

    return kernel


def mix_images(image_left: SlotImage, image_right: SlotImage, mix_type: MixType) -> SlotImage | None:
    """Apply the mix kernel to two same-type images; None on type mismatch."""
    if not image_left.is_rgba() and not image_right.is_rgba():
        out = _gray_kernel(mix_type)(image_left.planes[0].data(), image_right.planes[0].data())
        return SlotImage([plane_from_device(out)])
    if image_left.is_rgba() and image_right.is_rgba():
        l = [p.data() for p in image_left.planes[:3]]
        r = [p.data() for p in image_right.planes[:3]]
        outs = _rgba_kernel(mix_type)(*l, *r)
        return SlotImage([plane_from_device(o) for o in outs])
    return None  # `mix.rs:126` — mismatched types yield no outputs


def process(slot_datas, node, mix_type: MixType):
    from ..geometry import Size

    left_data = slot_data_with_name(slot_datas, node, "left")
    right_data = slot_data_with_name(slot_datas, node, "right")

    if left_data is not None:
        is_rgba = left_data.image.is_rgba()
        if right_data is not None:
            image_right = right_data.image.as_type(is_rgba)
        else:
            image_right = SlotImage.from_value(left_data.size(), 0.0, is_rgba)
        image_left = left_data.image
    elif right_data is not None:
        image_left = SlotImage.from_value(right_data.size(), 0.0, right_data.image.is_rgba())
        image_right = right_data.image
    else:
        return [SlotData(node.node_id, SlotId(0), SlotImage.from_value(Size(1, 1), 0.0, False))]

    result = mix_images(image_left, image_right, mix_type)
    if result is None:
        return []
    return [SlotData(node.node_id, SlotId(0), result)]
