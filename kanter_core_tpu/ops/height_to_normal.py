"""HeightToNormal: gray heightmap → RGB(A) tangent-space normal map.

Mirrors `/root/reference/src/node/height_to_normal.rs`: toroidal-wrap finite
differences sampling up (y-1) and left (x-1) with wraparound
(`height_to_normal.rs:55-56`), tangent/bitangent normalization and cross
product via nalgebra (`:58-60`), remapped as `n * 0.5 + 0.5` (`:63`), alpha
forced to 1 (`from_buffers_rgb`).

The reference's per-pixel scalar loop (its only cancellation-aware kernel)
becomes a fused stencil; cancellation here happens at dispatch granularity
instead of per pixel. Operation order matches nalgebra's
`norm = sqrt((x² + y²) + z²)` and componentwise divide. On CPU plain
sqrt/div are correctly rounded already; TPU hardware is ~1 ulp off on both,
so the normalizations go through `ops/exact_math.corrected_{sqrt,div}` —
making the f32 planes (not just the u8 export) bit-identical across
backends.

Two implementations, identical bit-for-bit on TPU (verified at 2048²):
- `_h2n_jnp`: `jnp.roll`-based, used on CPU and for unaligned shapes;
- the Pallas one-pass kernel (`pallas_kernels.height_to_normal_pallas`),
  used on TPU for lane/sublane-aligned shapes — ~29× faster than the jnp
  lowering because the rolled copies are never materialized in HBM.
"""

from __future__ import annotations

import functools

from ..ids import SlotId
from ..slot_data import SlotData
from ..slot_image import SlotImage
from ..transient_buffer import plane_from_device
from .common import slot_data_with_name


def _h2n_jnp(h):
    """jnp reference implementation (bit-exact vs the Rust scalar loop)."""
    import jax.numpy as jnp

    up = jnp.roll(h, 1, axis=0)  # sample at (x, y-1) wrapped
    return _h2n_core(h, up, *h.shape)


def _h2n_core(h, up, height: int, width: int):
    """The per-pixel normal math given pre-gathered `up` rows.

    `h`/`up` may be a row band of a larger plane (tiled evaluation gathers
    the wrapped y-1 rows host-side); `height`/`width` are the GLOBAL canvas
    dims (they set the texel step, `height_to_normal.rs:49-52`). Arithmetic
    is identical to evaluating the full plane — bands are bit-transparent.
    """
    import jax
    import jax.numpy as jnp

    from .exact_math import nc_mul

    if jax.default_backend() == "cpu":
        _div = lambda a, b: a / b  # noqa: E731 — already correctly rounded
        _sqrt = jnp.sqrt
    else:
        from .exact_math import corrected_div as _div, corrected_sqrt as _sqrt

    pdx = jnp.float32(1.0) / jnp.float32(width)
    pdy = jnp.float32(1.0) / jnp.float32(height)

    left = jnp.roll(h, 1, axis=1)  # sample at (x-1, y) wrapped

    # tangent = normalize([pdx, 0, h - left])
    tz = h - left
    tnorm = _sqrt((pdx * pdx + jnp.float32(0.0)) + nc_mul(tz, tz))
    tx, ty, tzn = _div(pdx, tnorm), _div(jnp.float32(0.0), tnorm), _div(tz, tnorm)

    # bitangent = normalize([0, pdy, up - h])
    bz = up - h
    bnorm = _sqrt((jnp.float32(0.0) + pdy * pdy) + nc_mul(bz, bz))
    bx, by, bzn = _div(jnp.float32(0.0), bnorm), _div(pdy, bnorm), _div(bz, bnorm)

    # normal = normalize(cross(tangent, bitangent))
    cx = nc_mul(ty, bzn) - nc_mul(tzn, by)
    cy = nc_mul(tzn, bx) - nc_mul(tx, bzn)
    cz = nc_mul(tx, by) - nc_mul(ty, bx)
    cnorm = _sqrt((nc_mul(cx, cx) + nc_mul(cy, cy)) + nc_mul(cz, cz))
    nx, ny, nz = _div(cx, cnorm), _div(cy, cnorm), _div(cz, cnorm)

    half = jnp.float32(0.5)
    alpha = jnp.ones_like(h)
    return (
        nc_mul(nx, half) + half,
        nc_mul(ny, half) + half,
        nc_mul(nz, half) + half,
        alpha,
    )


@functools.cache
def _h2n_pallas_vjp():
    """The Pallas kernel wrapped for transform composition:

    - custom_vmap: Mosaic rejects vmap's batched block specs on the
      ANY-memory-space input (manual DMA), so a batched call (BatchedGraph /
      BatchedLiveSession on TPU) lowers to `lax.map` over the rank-2 kernel —
      the stencil already saturates the chip per canvas, so mapping over the
      batch costs ~nothing and stays bit-identical to per-canvas calls.
    - custom_vjp (outermost, so vmap reaches it first and batches its fwd):
      forward runs the one-pass Mosaic stencil, backward re-traces the
      bit-identical jnp formulation (kanter_core_tpu.autodiff needs this).
    """
    import jax
    from jax.custom_batching import custom_vmap

    from .pallas_kernels import height_to_normal_pallas

    @custom_vmap
    def pallas_fn(h):
        return height_to_normal_pallas(h)

    @pallas_fn.def_vmap
    def _batch_rule(axis_size, in_batched, h):  # noqa: ANN001
        outs = jax.lax.map(height_to_normal_pallas, h)
        return outs, tuple(True for _ in outs)

    @jax.custom_vjp
    def h2n(h):
        return pallas_fn(h)

    def fwd(h):
        return pallas_fn(h), h

    def bwd(h, cotangents):
        _, vjp = jax.vjp(_h2n_jnp, h)
        return vjp(cotangents)

    h2n.defvjp(fwd, bwd)
    return h2n


def h2n_traceable(h):
    """Backend-dispatching traceable kernel (see module docstring)."""
    import jax

    height, width = h.shape
    if (
        jax.default_backend() == "tpu"
        and width % 128 == 0
        and height % 8 == 0
        and height >= 64
    ):
        return _h2n_pallas_vjp()(h)
    return _h2n_jnp(h)


@functools.cache
def _kernel():
    import jax

    return jax.jit(h2n_traceable)


def process(shutdown, slot_datas, node):
    slot_data = slot_data_with_name(slot_datas, node, "input")
    if slot_data is None:
        return []
    if slot_data.image.is_rgba():
        return []  # `height_to_normal.rs:39-43`

    outs = _kernel()(slot_data.image.planes[0].data())
    image = SlotImage([plane_from_device(o) for o in outs])
    return [SlotData(node.node_id, SlotId(0), image)]
