"""Pallas TPU kernels for hot ops.

The elementwise node kernels (mix etc.) are left to XLA — it already fuses
chains of them into single HBM-bound passes (see `compiler.py`). Pallas is
used where manual data movement beats XLA's lowering:

- `height_to_normal_pallas`: the wrap-stencil normal-map kernel in one pass.
  The jnp reference implementation materializes two `jnp.roll` copies of the
  heightmap; here each grid step DMAs one row-tile plus a single halo row
  from a wrap-padded input and computes all three output planes in VMEM,
  so HBM traffic is read-once/write-three instead of read-three.

(A planar f32→u8 pack kernel used to live here too; measured on chip it lost
to the elementwise u32 pack now in `slot_image._jitted_converters` — the
planar→interleaved transpose cost more than the fused XLA pack — so it was
removed rather than kept as a dead fast path.)

Numerics note: on TPU, Pallas and XLA lower to the same VPU ops (mul/sub/
div/sqrt are IEEE), so results match the jnp kernels bit-for-bit; the golden
tests assert this in interpret mode on CPU.
"""

from __future__ import annotations

import functools


def _ceil_div(a: int, b: int) -> int:
    return -(-a // b)


@functools.lru_cache(maxsize=128)  # shape-keyed; bound for long sessions
def _h2n_kernel(height: int, width: int, tile_rows: int, interpret: bool):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    grid = (_ceil_div(height, tile_rows),)

    def kernel(hpad_hbm, r_ref, g_ref, b_ref):
        i = pl.program_id(0)

        def body(scratch, sem):
            # rows [i*T, i*T + T + 8) of the 8-row wrap-padded input: DMA
            # slices must be 8-row aligned (Mosaic sublane tiling), so the
            # halo is 8 rows; padded row k corresponds to source row k-8
            # wrapped, and only the last halo row is actually used.
            dma = pltpu.make_async_copy(
                hpad_hbm.at[pl.ds(i * tile_rows, tile_rows + 8), :],
                scratch,
                sem,
            )
            dma.start()
            dma.wait()

            h = scratch[8:, :]  # current rows
            up = scratch[7:-1, :]  # row above (wrapped)
            left = pltpu.roll(h, 1, 1)  # column x-1 with wrap

            pdx = jnp.float32(1.0) / jnp.float32(width)
            pdy = jnp.float32(1.0) / jnp.float32(height)
            zero = jnp.float32(0.0)
            half = jnp.float32(0.5)

            # exact-math sqrt/div + non-contracted muls: TPU hardware
            # sqrt/div are ~1 ulp off (plain mul+add is NOT contracted on
            # TPU, but nc_mul keeps the recipe backend-uniform); these keep
            # the f32 planes bit-identical to the reference pipeline
            # (plain ops inside Pallas lower fine — see ops/exact_math.py)
            from .exact_math import (
                corrected_div as _div,
                corrected_sqrt as _sqrt,
                nc_mul,
            )

            tz = h - left
            tnorm = _sqrt((pdx * pdx + zero) + nc_mul(tz, tz))
            tx, ty, tzn = _div(pdx, tnorm), _div(zero, tnorm), _div(tz, tnorm)

            bz = up - h
            bnorm = _sqrt((zero + pdy * pdy) + nc_mul(bz, bz))
            bx, by, bzn = _div(zero, bnorm), _div(pdy, bnorm), _div(bz, bnorm)

            cx = nc_mul(ty, bzn) - nc_mul(tzn, by)
            cy = nc_mul(tzn, bx) - nc_mul(tx, bzn)
            cz = nc_mul(tx, by) - nc_mul(ty, bx)
            cnorm = _sqrt((nc_mul(cx, cx) + nc_mul(cy, cy)) + nc_mul(cz, cz))

            r_ref[:, :] = nc_mul(_div(cx, cnorm), half) + half
            g_ref[:, :] = nc_mul(_div(cy, cnorm), half) + half
            b_ref[:, :] = nc_mul(_div(cz, cnorm), half) + half

        pl.run_scoped(
            body,
            scratch=pltpu.VMEM((tile_rows + 8, width), jnp.float32),
            sem=pltpu.SemaphoreType.DMA(()),
        )

    out_spec = pl.BlockSpec(
        (tile_rows, width), lambda i: (i, 0), memory_space=pltpu.VMEM
    )

    call = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=(out_spec, out_spec, out_spec),
        out_shape=tuple(
            jax.ShapeDtypeStruct((grid[0] * tile_rows, width), jnp.float32)
            for _ in range(3)
        ),
        interpret=interpret,
    )

    @jax.jit
    def h2n(h):
        # wrap-pad 8 rows at the top (aligned halo); row 7 = source last row
        hpad = jnp.concatenate([h[-8:, :] if height >= 8 else jnp.tile(h, (8, 1))[-8:, :], h], axis=0)
        # pad rows up to the tile multiple (values don't matter; sliced off)
        padded_rows = grid[0] * tile_rows + 8
        if padded_rows > hpad.shape[0]:
            hpad = jnp.pad(hpad, ((0, padded_rows - hpad.shape[0]), (0, 0)))
        r, g, b = call(hpad)
        alpha = jnp.ones((height, width), jnp.float32)
        return r[:height], g[:height], b[:height], alpha

    return h2n


def height_to_normal_pallas(h, tile_rows: int = 64, interpret: bool | None = None):
    """Pallas one-pass wrap-stencil HeightToNormal. `h` is an `[H, W]` f32
    plane; returns (r, g, b, alpha) planes."""
    import jax

    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    height, width = h.shape
    tile_rows = min(tile_rows, height)
    return _h2n_kernel(height, width, tile_rows, interpret)(h)


