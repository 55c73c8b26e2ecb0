"""Voronoi cell-resolution formulation experiment (VERDICT r4 #9).

Hypothesis: the three per-candidate lowbias32 hash planes (and the jitter
offsets derived from them) depend only on the WRAPPED CELL INDEX — ~39 of
the kernel's ~53 plane ops per candidate recompute values that take only
cells_y x cells_x distinct values. For the power-of-two-divisible case
(cells and canvas both powers of two, so `floor((c+0.5)*fx) == c//k`
EXACTLY in f32 — verified below), those tables can be computed once at
cell resolution and expanded to pixel resolution by a pure
broadcast+reshape (slice-free, gather-free — the take-based variant lost
at 22.1 ms precisely because of lane gathers). If XLA:TPU fuses the
broadcast into the elementwise consumer without a relayout copy, the
per-candidate cost drops to ~10 plane ops + 3 broadcast reads.

Protocol: bit-compare all three output planes against the production
kernel ON CHIP (CLAUDE.md formulation-context rule: same logical mul/add
can round differently under a different fusion structure — bits must be
re-proven per formulation), then ScanBench both at 4096^2 / 16x16 cells.
Result recorded in VALIDATION.md either way.

Run: python scripts/exp_voronoi_cellres.py  (uses the real chip)
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

CANVAS = int(os.environ.get("EXP_CANVAS", "4096"))
CELLS = int(os.environ.get("EXP_CELLS", "16"))


def voronoi_planes_cellres(rows, cols, fx, fy, px_i, py_i, jitter, seed,
                           ky, kx):
    """The cell-resolution twin: identical candidate order, select chain,
    and final math; only the hash/offset/id planes are computed at
    (cells_y, cells_x) and broadcast-expanded. `ky`/`kx` are the static
    pixels-per-cell factors (divisible geometry only)."""
    import jax
    import jax.numpy as jnp

    from kanter_core_tpu.ops.exact_math import nc_mul
    from kanter_core_tpu.ops.noise import _hash01
    from kanter_core_tpu.ops.voronoi import _OFFSETS, _SALT_ID, _SALT_JY

    f32 = jnp.float32
    u32 = jnp.uint32
    if jax.default_backend() == "cpu":
        _sqrt = jnp.sqrt
    else:
        from kanter_core_tpu.ops.exact_math import corrected_sqrt as _sqrt

    nr, nc = rows.shape[0], cols.shape[0]
    py, px = nr // ky, nc // kx
    cy = rows.astype(f32) + f32(0.5)
    cx = cols.astype(f32) + f32(0.5)
    u = nc_mul(cx, fx)
    v = nc_mul(cy, fy)
    xi = jnp.floor(u).astype(jnp.int32)
    yi = jnp.floor(v).astype(jnp.int32)
    jitter = jnp.asarray(jitter, f32)
    seed = jnp.asarray(seed, u32)

    cxi = jnp.arange(px, dtype=jnp.int32)  # cell indices
    cyi = jnp.arange(py, dtype=jnp.int32)

    def expand(cell_plane):
        # E[r, c] = cell_plane[r // ky, c // kx] — broadcast + reshape,
        # no gather, no slice
        return jnp.broadcast_to(
            cell_plane[:, None, :, None], (py, ky, px, kx)
        ).reshape(nr, nc)

    def candidate(dx, dy):
        gx = xi + jnp.int32(dx)  # [nc] unwrapped (for the planar delta)
        gy = yi + jnp.int32(dy)
        # cell-resolution wrapped hash keys
        wxc = jnp.mod(cxi + jnp.int32(dx), px_i).astype(u32)[None, :]
        wyc = jnp.mod(cyi + jnp.int32(dy), py_i).astype(u32)[:, None]
        jx_c = _hash01(jnp, wxc, wyc, seed)              # [py, px]
        jy_c = _hash01(jnp, wxc, wyc, seed ^ u32(_SALT_JY))
        cid_c = _hash01(jnp, wxc, wyc, seed ^ u32(_SALT_ID))
        ox_c = nc_mul(jx_c - f32(0.5), jitter)           # cell-res offsets
        oy_c = nc_mul(jy_c - f32(0.5), jitter)
        ddx = (gx.astype(f32) + f32(0.5) - u)[None, :] + expand(ox_c)
        ddy = (gy.astype(f32) + f32(0.5) - v)[:, None] + expand(oy_c)
        d2 = nc_mul(ddx, ddx) + nc_mul(ddy, ddy)
        return d2, expand(cid_c)

    best1, best_id = candidate(*_OFFSETS[0])
    best2 = jnp.full((nr, nc), jnp.inf, f32)
    for off in _OFFSETS[1:]:
        d2, cid = candidate(*off)
        closer = d2 < best1
        best2 = jnp.where(closer, best1, jnp.minimum(best2, d2))
        best_id = jnp.where(closer, cid, best_id)
        best1 = jnp.where(closer, d2, best1)
    f1 = _sqrt(best1)
    f2 = _sqrt(best2)
    one, zero = f32(1.0), f32(0.0)
    return jnp.clip(f1, zero, one), jnp.clip(f2 - f1, zero, one), best_id


def main() -> None:
    import jax

    from benchlib import ScanBench
    from kanter_core_tpu.ops.voronoi import voronoi_bindings, voronoi_planes

    vb = voronoi_bindings((CANVAS, CANVAS, CELLS, CELLS, 1.0, 99))
    k = CANVAS // CELLS
    assert CANVAS % CELLS == 0

    # the fast path's premise: floor((c+0.5)*fx) == c//k EXACTLY (true for
    # power-of-two cells/canvas: fx is a power of two, products are exact)
    cols = np.arange(CANVAS, dtype=np.int32)
    host_xi = np.floor((cols.astype(np.float32) + np.float32(0.5))
                       * vb["fx"]).astype(np.int32)
    assert np.array_equal(host_xi, cols // k), "floor/fx mapping diverges"

    prod = jax.jit(voronoi_planes)
    cell = jax.jit(
        lambda r, c, fx, fy, px, py, j, s: voronoi_planes_cellres(
            r, c, fx, fy, px, py, j, s, k, k
        )
    )
    args = (vb["rows"], vb["cols"], vb["fx"], vb["fy"], vb["px"], vb["py"],
            vb["jitter"], vb["seed"])
    a = prod(*args)
    b = cell(*args)
    bits_equal = all(
        np.array_equal(
            np.asarray(x).view(np.uint32), np.asarray(y).view(np.uint32)
        )
        for x, y in zip(a, b)
    )
    diff_counts = [
        int((np.asarray(x).view(np.uint32)
             != np.asarray(y).view(np.uint32)).sum())
        for x, y in zip(a, b)
    ]
    del a, b

    def prod_body(c, ps):
        rows, cols = ps
        return prod(rows, cols, vb["fx"], vb["fy"], vb["px"], vb["py"],
                    c % 1.0, vb["seed"])

    def cell_body(c, ps):
        rows, cols = ps
        return cell(rows, cols, vb["fx"], vb["fy"], vb["px"], vb["py"],
                    c % 1.0, vb["seed"])

    consts = (vb["rows"], vb["cols"])
    prod_s, ok_p = ScanBench(prod_body, consts, n1=8, n2=32, base=0.25).run(3)
    cell_s, ok_c = ScanBench(cell_body, consts, n1=8, n2=32, base=0.25).run(3)
    print(json.dumps({
        "exp": "voronoi_cellres",
        "canvas": CANVAS,
        "cells": CELLS,
        "backend": jax.default_backend(),
        "bits_equal": bits_equal,
        "diff_counts": diff_counts,
        "prod_ms": round(prod_s * 1e3, 3),
        "cellres_ms": round(cell_s * 1e3, 3),
        "speedup": round(prod_s / cell_s, 2),
        "checksums_distinct": ok_p and ok_c,
    }))


if __name__ == "__main__":
    main()
    # belt-and-braces against the tunnel teardown abort (CLAUDE.md)
    sys.stdout.flush()
    os._exit(0)
