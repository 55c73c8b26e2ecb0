"""Blur node: separable Gaussian with toroidal wrap (extension).

No reference counterpart — the reference's 13 node types have no blur, yet
it is the most-requested texture op; this is a TPU-native addition. Design
follows the engine's conventions:

- toroidal wrap addressing like HeightToNormal (`height_to_normal.rs:55-56`
  uses the same Sampling trait), so tileable textures stay tileable;
- separable vertical-then-horizontal passes like the resampler;
- tap products through `exact_math.nc_mul` and sequential tap-order sums, so
  output planes are f32-bit deterministic across CPU/TPU (same discipline as
  `ops/resize.py`);
- weights computed host-side in f32 (radius = ceil(3σ), normalized), baked
  into the trace as constants — sigma is part of the program fingerprint.

Gray in → gray out; RGBA in → all four planes blurred.

Lowering: on TPU (lane-aligned widths) the traceable kernel dispatches to
the double-buffered Pallas kernel in `ops/pallas_blur.py` — measured on
the real chip (amortized distinct-checksum protocol) XLA will not fuse the
many-tap shifted-read sum and materializes copies: XLA 2.99 ms vs Pallas
0.33 ms at σ=1 @ 4096² (824 GB/s, at the measured roofline) and
15.3 ms vs 1.40 ms at σ=5 — 9-11× — while staying bit-identical
(chip-verified; `scripts/tpu_parity.py` blur determinism row). Elsewhere
(CPU, unaligned widths) the jnp rolled-read form below runs as is.
"""

from __future__ import annotations

import functools
import math

import numpy as np

from ..ids import SlotId
from ..slot_data import SlotData
from ..slot_image import SlotImage
from ..transient_buffer import plane_from_device
from .common import slot_data_with_name
from .exact_math import nc_mul

f32 = np.float32


@functools.lru_cache(maxsize=256)
def gaussian_taps(sigma: float) -> np.ndarray:
    """Normalized f32 Gaussian taps over [-radius, radius], radius=ceil(3σ)."""
    sigma = max(float(sigma), 1e-3)
    radius = max(1, int(math.ceil(3.0 * sigma)))
    xs = np.arange(-radius, radius + 1, dtype=np.float64)
    w = np.exp(-(xs * xs) / (2.0 * sigma * sigma)).astype(np.float32)
    return (w / w.sum(dtype=np.float32)).astype(np.float32)


def _blur_axis0(plane, taps: np.ndarray):
    """Weighted sum of wrap-rolled rows, tap order preserved."""
    import jax.numpy as jnp

    radius = (len(taps) - 1) // 2
    acc = jnp.zeros_like(plane)
    # roll on a length-1 axis is the identity — short-circuit it (same
    # bits, and the degenerate roll chains otherwise hang XLA:CPU's
    # compile when composed: blur(1×1)→resample→blur measured >100 s)
    degenerate = plane.shape[0] == 1
    for t, w in enumerate(taps):
        shifted = plane if degenerate else jnp.roll(plane, radius - t, axis=0)
        acc = acc + nc_mul(shifted, jnp.float32(w))
    return acc


#: test hook: force the Pallas lowerings (interpret mode) off-TPU so the
#: CPU suite exercises the kernel paths the chip runs
FORCE_PALLAS_INTERPRET = False


def blur_plane(plane, sigma: float, pallas_ok: bool = True, mesh=None,
               mesh_axis=None):
    """Traceable separable wrap blur of one `[H, W]` plane (see module
    docstring for the TPU Pallas dispatch; all lowerings are bit-equal).

    `mesh` (a `jax.sharding.Mesh`) selects the shard_map'd kernel: the plane
    is row-sharded over the mesh's first axis, each shard runs the Mosaic
    kernel on its block after a ring `ppermute` halo exchange
    (`pallas_blur._blur_pallas_sharded`). GSPMD cannot partition a plain
    Mosaic custom call, so mesh programs previously had to trace the jnp
    form (`pallas_ok=False`) and lost the kernel's 7-10× win.

    `pallas_ok=False` still forces the jnp lowering — the gate for contexts
    neither kernel supports (vmapped mesh programs, unviable geometries).
    """
    import jax
    import jax.numpy as jnp

    if plane.dtype != jnp.float32:
        # bf16 pipeline (DESIGN.md §9: bf16 at rest, f32 in flight): the
        # compiler upcasts compute inputs before this point; a direct
        # caller's half-precision plane upcasts here so the Mosaic f32
        # kernels stay viable and the f32 bits match the default pipeline
        plane = plane.astype(jnp.float32)

    taps = gaussian_taps(round(float(sigma), 6))
    on_tpu = jax.default_backend() == "tpu" or FORCE_PALLAS_INTERPRET
    taps_tuple = tuple(float(w) for w in taps)
    if pallas_ok and on_tpu and mesh is not None:
        from .pallas_blur import _blur_pallas_sharded, fits_sharded

        axis = mesh_axis or mesh.axis_names[0]
        n = int(mesh.shape[axis])
        if fits_sharded(plane.shape[0], plane.shape[1], len(taps), n):
            interpret = jax.default_backend() != "tpu"
            return _blur_pallas_sharded(taps_tuple, mesh, interpret, axis)(plane)
    if pallas_ok and mesh is None and on_tpu and plane.shape[1] % 128 == 0:
        from .pallas_blur import _blur_pallas_wrapped, fits_kernel

        if fits_kernel(plane.shape[1], len(taps)):
            return _blur_pallas_wrapped(taps_tuple)(plane)
    from jax import lax

    # barrier the operand: without it XLA:CPU duplicates the producer
    # expression into every rolled tap and its simplifier blows up on
    # composed chains (blur→resample→blur from a 1×1 Value measured >100 s
    # of compile; with the barrier 1.7 s). Runtime bits are unchanged — the
    # blur reads a materialized input either way.
    vert = _blur_axis0(lax.optimization_barrier(plane), taps)
    return _blur_axis0(vert.T, taps).T


@functools.lru_cache(maxsize=64)  # sigma edits mint new programs; bound them
def _kernel(sigma: float, planes: int, mesh=None):
    import jax

    def f(*ps):
        return tuple(blur_plane(p, sigma, mesh=mesh) for p in ps)

    return jax.jit(f)


def process(slot_datas, node, sigma: float, mesh=None):
    slot_data = slot_data_with_name(slot_datas, node, "input")
    if slot_data is None:
        return []
    planes = [p.data() for p in slot_data.image.planes]
    outs = _kernel(round(float(sigma), 6), len(planes), mesh)(*planes)
    image = SlotImage([plane_from_device(o) for o in outs])
    return [SlotData(node.node_id, SlotId(0), image)]
