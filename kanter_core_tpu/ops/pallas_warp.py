"""Pallas TPU kernel for the directional Warp gather (`ops/warp.py`).

Why this op gets a hand-written kernel (same playbook as `pallas_blur.py`):
the warp is four per-pixel 2-D gathers + a bilinear lerp, and EVERY dynamic
gather formulation XLA:TPU offers runs at element-gather speed — measured
at 4096²: the jnp `warp_planes` lowering 580 ms (~0.3 GB/s effective),
`take_along_axis` either axis 30–43 ms/plane at 2048². Select-over-shifted
-reads reformulations stay HBM-amplified because XLA's fusion cost model
splits chains past ~9 operands (measured: a 9-slice select chain streams at
0.33 ms ≈ roofline, a 25-slice chain 2.8 ms, 81 slices 22 ms, and the full
4-tap windowed warp 11 ms at B=2 / 58 ms at B=4). The op's true traffic is
three plane reads + one write (~0.25 ms at the ~800 GB/s roofline).

The kernel exploits the node's structure: the displacement is `d·(kx, ky)`
for a per-pixel SCALAR `d ∈ [−½, ½]` (the unit-interval strength contract),
so the integer tap offset `(⌊ky·d⌋, ⌊kx·d⌋)` lives on the 1-D STAIRCASE of
the digital line with direction `(kx, ky)` — O(|kx|+|ky|) distinct pairs,
not O(halo²). `warp_pairs` enumerates the staircase on the host in f64
(breakpoints of both floors over d), dilates it by the 3×3 neighborhood
(an f32 `y + k·d` rounding can slip each floor by at most ±1 — the sum's
absolute error is < ulp(16384) ≪ 1, so a slip crosses at most one integer
boundary), clips to the halo's Chebyshev ball, and pads to a BUCKET-sized
table so intensity/angle drags re-run one cached executable with the table
riding as a runtime argument. Per row chunk the kernel:

1. DMAs the wrap-padded input rows ± the aligned halo plus the strength
   chunk into VMEM (double-buffered, compute overlaps both DMA directions);
2. replays the jnp formulation's coordinate ops EXACTLY (clip → NaN→½ →
   Sterbenz `d` → `nc_mul` products → floor → clip; `nc_mul` is a plain mul
   on TPU and the Dekker anti-FMA dance in interpret mode, which is what
   makes interpret bit-match the CPU gather path);
3. loops over the pair table (runtime trip count from SMEM): one 8-aligned
   dynamic sublane load + a ≤7-row sublane rotate selects the tap rows, two
   lane rotates (`pltpu.roll`, toroidal at the true width) the tap columns,
   and one packed-code compare overwrite-selects the four tap planes —
   exactly one pair fires per pixel, so table order and padding duplicates
   cannot change a bit;
4. runs the shared fixed-association lerp and DMAs the chunk out.

Bit-exactness: the gathered texels are identical by construction (selects
pass bits through) and the coordinate/lerp arithmetic is the same op
sequence, so outputs are bit-identical to the jnp lowering — asserted in
interpret mode by `tests/test_pallas_warp.py` and on chip by the
`scripts/tpu_parity.py` battery (the windowed-select reformulation was
also measured bit-equal to the gather on chip: 0/16.7M diffs at 4096²).

Composition mirrors `pallas_blur`: `custom_vmap` (batched calls `lax.map`
the rank-2 kernel) and `custom_vjp` (backward re-traces the jnp gather
formulation, which XLA differentiates on its own).
"""

from __future__ import annotations

import functools
import math


def _ceil_div(a: int, b: int) -> int:
    return -(-a // b)


#: packed tap-offset code base: `code = dy·_CODE + dx` is injective while
#: |dx| < _CODE/2 — far above any viable halo
_CODE = 1024


def pairs_cap(halo: int) -> int:
    """Static pair-table size for a halo bucket: the dilated staircase of
    any in-class `(kx, ky)` fits (`|kx|+|ky| ≤ √2·intensity ≤ 2√2(B−1)`
    staircase points, ×3 for the thickened path, +slack)."""
    b = halo - 1
    return 9 * max(b - 1, 1) + 16


def warp_pairs(k, halo: int):
    """Host-side dilated staircase of floor-offset pairs `(dy, dx)` for the
    f32 displacement vector `k = (kx, ky)` (from `warp_bindings`), as
    `(pairs_i32[cap, 2], npairs)` padded with the last pair — or None when
    the table exceeds the bucket's cap (callers fall back to the gather).

    Enumerated in f64 over the exact clamp range `d ∈ [−½, ½]`: every
    breakpoint of `⌊kx·d⌋` / `⌊ky·d⌋`, the midpoints between them, and the
    endpoints sample the staircase; the 3×3 dilation covers the ≤±1 f32
    floor slip per axis (module docstring), clipped to the halo's
    Chebyshev ball `[−B, B]` which bounds the kernel-side offsets."""
    import numpy as np

    kx, ky = float(k[0]), float(k[1])
    if not (math.isfinite(kx) and math.isfinite(ky)):
        return None
    if halo > 4096:
        # No serveable canvas can use such a bucket (fits_kernel needs
        # height ≥ the aligned halo; VMEM and the 9·halo pair table both
        # die long before 4096) — and the staircase enumeration below is
        # O(|kx|+|ky|) HOST work, so a huge-but-finite intensity (e.g.
        # 1e9) would otherwise hang the engine at binding collection
        # (r4 regression find: test_warp.py::test_huge_intensity_bindings
        # _skip_pair_table). Callers fall back to the gather.
        return None
    ds = {-0.5, 0.5}
    for s in (kx, ky):
        a = abs(s) / 2.0
        if a > 0.0:
            for m in range(math.floor(-a) - 1, math.ceil(a) + 2):
                d = m / s
                if -0.5 <= d <= 0.5:
                    ds.add(d)
    bps = sorted(ds)
    samples = list(bps) + [(bps[i] + bps[i + 1]) / 2.0 for i in range(len(bps) - 1)]
    base = {(math.floor(ky * d), math.floor(kx * d)) for d in samples}
    b = halo - 1
    out = set()
    for (py, px) in base:
        for ay in (-1, 0, 1):
            for ax in (-1, 0, 1):
                q = (min(max(py + ay, -b), b), min(max(px + ax, -b), b))
                out.add(q)
    pairs = sorted(out)
    cap = pairs_cap(halo)
    if len(pairs) > cap:
        return None
    pad = pairs + [pairs[-1]] * (cap - len(pairs))
    return np.asarray(pad, dtype=np.int32), np.int32(len(pairs))


def chunk_rows(width: int, rp: int) -> int:
    """Rows per chunk: ~19 live (T, W) f32 buffers (2×in incl. halo, 2×str,
    2×out, 4 tap scratch, coords, loop temps) must fit VMEM with headroom
    (CLAUDE.md: the 16 MB budget is real), floored to the 8-row multiple."""
    t = (9_500_000 // (4 * width) - 4 * rp - 16) // 19
    return max(8, min(256, (t // 8) * 8))


def fits_kernel(height: int, width: int, halo) -> bool:
    """Viability: a bounded halo, lane-aligned width (the blur kernel's
    gate), the wrap pad expressible (height ≥ the aligned halo so one
    slice supplies it), and an 8-row chunk under the VMEM budget."""
    if halo is None or width % 128 != 0:
        return False
    rp = _ceil_div(halo, 8) * 8
    if height < rp:
        return False
    return (19 * 8 + 4 * rp + 16) * width * 4 <= 9_500_000


@functools.lru_cache(maxsize=64)
def _warp_padded_call(height: int, width: int, rp: int, cap: int,
                      t_rows: int, interpret: bool):
    """The raw kernel: `(meta_smem, pairs_smem, k_smem, hpad, strength) →
    out`. `hpad` row `rp + j` is logical input row `j` with toroidal wrap
    rows in `[rp − halo, rp)` and `[rp + height, rp + height + halo]`;
    `strength` is output-aligned and padded to the chunk grid (tail rows
    feed only discarded outputs — the clamp keeps even garbage strength
    bounded, so tap offsets stay in-table everywhere). `meta` is
    `[npairs, row_origin]` (origin: the block's first GLOBAL row — the
    sharded/banded callers pass their offset so `v` sees global rows)."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from .exact_math import nc_mul

    n_chunks = _ceil_div(height, t_rows)
    c = t_rows
    f32 = jnp.float32
    i32 = jnp.int32

    def kernel(meta_ref, pairs_ref, k_ref, hpad_hbm, str_hbm, out_hbm):
        def body(ibuf, sbuf, obuf, t00, t10, t01, t11, isem, ssem, osem):
            def in_dma(slot, idx):
                return pltpu.make_async_copy(
                    hpad_hbm.at[pl.ds(idx * c, c + 2 * rp), :],
                    ibuf.at[slot], isem.at[slot],
                )

            def str_dma(slot, idx):
                return pltpu.make_async_copy(
                    str_hbm.at[pl.ds(idx * c, c), :],
                    sbuf.at[slot], ssem.at[slot],
                )

            def out_dma(slot, idx):
                return pltpu.make_async_copy(
                    obuf.at[slot], out_hbm.at[pl.ds(idx * c, c), :],
                    osem.at[slot],
                )

            in_dma(0, 0).start()
            str_dma(0, 0).start()

            def loop_body(i, _):
                slot = jax.lax.rem(i, 2)
                nxt = jax.lax.rem(i + 1, 2)

                @pl.when(i + 1 < n_chunks)
                def _():
                    in_dma(nxt, i + 1).start()
                    str_dma(nxt, i + 1).start()

                in_dma(slot, i).wait()
                str_dma(slot, i).wait()

                @pl.when(i >= 2)
                def _():
                    out_dma(slot, i - 2).wait()

                # ---- coordinates: the jnp formulation's ops, verbatim ----
                m = sbuf[slot]
                ms = jnp.clip(m, f32(0.0), f32(1.0))
                ms = jnp.where(m != m, f32(0.5), ms)
                d = ms - f32(0.5)
                xi = jax.lax.broadcasted_iota(i32, (c, width), 1)
                yi = (meta_ref[1] + i * c
                      + jax.lax.broadcasted_iota(i32, (c, width), 0))
                u = xi.astype(f32) + nc_mul(k_ref[0], d)
                v = yi.astype(f32) + nc_mul(k_ref[1], d)
                uf = jnp.clip(jnp.floor(u), -1e9, 1e9)
                vf = jnp.clip(jnp.floor(v), -1e9, 1e9)
                fu = u - uf
                fv = v - vf
                code = ((vf.astype(i32) - yi) * i32(_CODE)
                        + (uf.astype(i32) - xi))

                t00[...] = jnp.zeros((c, width), f32)
                t10[...] = jnp.zeros((c, width), f32)
                t01[...] = jnp.zeros((c, width), f32)
                t11[...] = jnp.zeros((c, width), f32)

                def pair_body(j, _):
                    pk = pairs_ref[j, 0]
                    pj = pairs_ref[j, 1]
                    # tap rows [rp+pk, rp+pk+c+1) via an 8-aligned dynamic
                    # load (spelled 8·q so Mosaic's divisibility prover
                    # accepts it) + a <8-row sublane rotate
                    q8 = jax.lax.div(rp + pk, i32(8))
                    r = jax.lax.rem(rp + pk, i32(8))
                    win = ibuf[slot, pl.ds(8 * q8, c + 8), :]
                    win = pltpu.roll(win, jnp.mod(-r, i32(c + 8)), 0)
                    # ONE dynamic lane roll of the whole (c+8) window — a0
                    # (tap row) and a1 (row below) are row-offset SLICES of
                    # the same rolled data, and the +1-column taps one more
                    # STATIC roll of it (dynamic lane rolls dominate the
                    # pair loop: rolling a0/a1 separately measured ~1.4×
                    # slower at 4096²; the selected texels are identical.
                    # Hoisting the rolls to once-per-distinct-dx via VMEM
                    # scratch measured ~1.5× SLOWER STILL — scratch stores
                    # + a second per-pair sublane load beat the saved
                    # rolls, and the extra buffers shrink the chunk)
                    cshift = jnp.mod(-pj, i32(width))
                    wr = pltpu.roll(win, cshift, 1)
                    wrm = pltpu.roll(wr, width - 1, 1)
                    a0 = wr[0:c, :]
                    a1 = wr[1:c + 1, :]
                    b0 = wrm[0:c, :]
                    b1 = wrm[1:c + 1, :]
                    mask = code == pk * i32(_CODE) + pj
                    t00[...] = jnp.where(mask, a0, t00[...])
                    t10[...] = jnp.where(mask, b0, t10[...])
                    t01[...] = jnp.where(mask, a1, t01[...])
                    t11[...] = jnp.where(mask, b1, t11[...])
                    return 0

                jax.lax.fori_loop(0, meta_ref[0], pair_body, 0)

                # ---- shared fixed-association lerp (transform.py) ----
                nx0 = t00[...] + nc_mul(fu, t10[...] - t00[...])
                nx1 = t01[...] + nc_mul(fu, t11[...] - t01[...])
                obuf[slot] = nx0 + nc_mul(fv, nx1 - nx0)
                out_dma(slot, i).start()

            jax.lax.fori_loop(0, n_chunks, loop_body, None)
            if n_chunks >= 2:
                out_dma((n_chunks - 2) % 2, n_chunks - 2).wait()
            out_dma((n_chunks - 1) % 2, n_chunks - 1).wait()

        pl.run_scoped(
            body,
            ibuf=pltpu.VMEM((2, c + 2 * rp, width), jnp.float32),
            sbuf=pltpu.VMEM((2, c, width), jnp.float32),
            obuf=pltpu.VMEM((2, c, width), jnp.float32),
            t00=pltpu.VMEM((c, width), jnp.float32),
            t10=pltpu.VMEM((c, width), jnp.float32),
            t01=pltpu.VMEM((c, width), jnp.float32),
            t11=pltpu.VMEM((c, width), jnp.float32),
            isem=pltpu.SemaphoreType.DMA((2,)),
            ssem=pltpu.SemaphoreType.DMA((2,)),
            osem=pltpu.SemaphoreType.DMA((2,)),
        )

    return pl.pallas_call(
        kernel,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct((n_chunks * t_rows, width), jnp.float32),
        interpret=interpret,
    )


def _warp_block(block, strength, k, pairs, npairs, top, bot, row_origin,
                interpret: bool | None = None):
    """Kernel over one row block with explicit ±`rp` strips (`top` = the
    `rp` rows preceding the block, `bot` = the `rp` rows following it; the
    +1 bilinear tap reaches at most `halo ≤ rp` rows past the block, and
    rows past that feed only discarded outputs). The dense caller passes
    toroidal wrap slices; the sharded caller its ppermute'd neighbors."""
    import jax
    import jax.numpy as jnp

    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    block_h, width = block.shape
    rp = top.shape[0]
    cap = pairs.shape[0]
    c = chunk_rows(width, rp)
    c = min(c, _ceil_div(block_h, 8) * 8)
    n_chunks = _ceil_div(block_h, c)
    padded_rows = n_chunks * c + 2 * rp
    # rows past block_h + halo feed only discarded outputs; zeros keep the
    # buffer well-defined (and the clamp keeps their tap offsets in-table)
    zpad_rows = padded_rows - rp - block_h - bot.shape[0]
    parts = [top, block, bot]
    if zpad_rows > 0:
        parts.append(jnp.zeros((zpad_rows, width), jnp.float32))
        hpad = jnp.concatenate(parts, axis=0)
    else:
        hpad = jnp.concatenate(parts, axis=0)[:padded_rows]
    s_extra = n_chunks * c - block_h
    if s_extra > 0:
        strength = jnp.concatenate(
            [strength, jnp.zeros((s_extra, width), jnp.float32)], axis=0
        )
    meta = jnp.stack([jnp.asarray(npairs, jnp.int32),
                      jnp.asarray(row_origin, jnp.int32)])
    call = _warp_padded_call(block_h, width, rp, cap, c, interpret)
    return call(meta, pairs, k, hpad, strength)[:block_h]


def warp_pallas(plane, strength, k, pairs, npairs, halo: int,
                interpret: bool | None = None):
    """Double-buffered one-pass directional warp of one `[H, W]` plane with
    toroidal wrap (the jnp `warp_planes` dense twin, bit-identical)."""
    import jax

    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    height, width = plane.shape
    rp = _ceil_div(halo, 8) * 8
    top = plane[height - rp:, :]  # fits_kernel pinned height >= rp
    bot = plane[:rp, :]
    return _warp_block(plane, strength, k, pairs, npairs, top, bot, 0,
                       interpret=interpret)


def fits_sharded(height: int, width: int, halo, n_shards: int) -> bool:
    """Viability of the shard_map'd kernel: a bounded halo, rows dividing
    the mesh axis, each shard's block covering the ±`rp` exchanged strip in
    ONE ring hop, and the per-shard kernel itself viable on its block."""
    if halo is None:
        return False
    rp = _ceil_div(halo, 8) * 8
    return (
        height % n_shards == 0
        and height // n_shards >= rp
        and fits_kernel(height // n_shards, width, halo)
    )


@functools.lru_cache(maxsize=32)  # param edits mint new programs; bound them
def _warp_pallas_sharded(halo: int, cap: int, mesh, interpret: bool, axis=None):
    """shard_map'd staircase kernel: each device runs the Mosaic kernel on
    its row block after a ring `ppermute` exchange of the ±`rp` boundary
    strips (ring neighbors ARE the toroidal continuation — the wrap
    sampling of `height_to_normal.rs:55-56` at mesh scale, exactly as
    `pallas_blur._blur_pallas_sharded`). GSPMD cannot partition a Mosaic
    custom call, so without this every `TextureProcessor(mesh=…)` Warp
    fell back to the element-gather lowering (580 ms vs a few ms at 4096²);
    with it the kernel stays per-shard and only `2·rp·W` f32 rows ride the
    ICI per device. `row_origin` hands each shard its global first row so
    the in-kernel `v` coordinate sees global geometry — bits match the
    dense kernel and the jnp gather exactly (selects pass texels through;
    the coordinate/lerp ops are the same sequence).

    Wrapped in custom_vjp (backward re-traces the jnp gather formulation,
    which GSPMD differentiates and partitions on its own)."""
    import jax
    import numpy as np
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    axis = axis or mesh.axis_names[0]
    n = int(mesh.shape[axis])
    rp = _ceil_div(halo, 8) * 8

    def body(block, m_blk, k, pairs, npairs):
        import jax.numpy as jnp

        h_blk = block.shape[0]
        start = (jax.lax.axis_index(axis) * h_blk).astype(jnp.int32)
        if n == 1:
            top = block[-rp:]
            bot = block[:rp]
        else:
            fwd = [(i, (i + 1) % n) for i in range(n)]
            bwd = [(i, (i - 1) % n) for i in range(n)]
            # device j receives shard j-1's bottom strip (its preceding rows)
            top = jax.lax.ppermute(block[-rp:], axis, fwd)
            # … and shard j+1's top strip (its following rows)
            bot = jax.lax.ppermute(block[:rp], axis, bwd)
        return _warp_block(block, m_blk, k, pairs, npairs, top, bot, start,
                           interpret=interpret)

    # check_vma=False: pallas_call can't declare its output's varying-axes
    # set (the body is honestly varying over `axis` and nothing else)
    sharded = shard_map(
        body, mesh=mesh,
        in_specs=(P(axis, None), P(axis, None), P(), P(), P()),
        out_specs=P(axis, None), check_vma=False,
    )

    @jax.custom_vjp
    def warp_fn(p, s, k, pairs, npairs):
        return sharded(p, s, k, pairs, npairs)

    def fwd_rule(p, s, k, pairs, npairs):
        return sharded(p, s, k, pairs, npairs), (p, s, k)

    def bwd_rule(res, cot):
        p, s, k = res
        from .warp import warp_planes

        h, w = p.shape
        rows = np.arange(h, dtype=np.int32)
        cols = np.arange(w, dtype=np.int32)

        def jnp_warp(pi, si, ki):
            return warp_planes((pi,), si, rows, cols, ki, h, w)[0]

        _, vjp = jax.vjp(jnp_warp, p, s, k)
        gp, gs, gk = vjp(cot)
        return (gp, gs, gk,
                np.zeros((cap, 2), dtype=jax.dtypes.float0),
                np.zeros((), dtype=jax.dtypes.float0))

    warp_fn.defvjp(fwd_rule, bwd_rule)
    return warp_fn


@functools.cache
def _warp_pallas_wrapped(halo: int, cap: int):
    """vmap- and grad-composable dense wrapper (the `pallas_blur` pattern):
    batched calls `lax.map` the rank-2 kernel; backward re-traces the jnp
    gather formulation for `(plane, strength, k)` cotangents."""
    import jax
    import numpy as np
    from jax.custom_batching import custom_vmap

    @custom_vmap
    def pallas_fn(p, s, k, pairs, npairs):
        return warp_pallas(p, s, k, pairs, npairs, halo)

    @pallas_fn.def_vmap
    def _batch_rule(axis_size, in_batched, p, s, k, pairs, npairs):  # noqa: ANN001
        pb, sb, kb, prb, npb = in_batched
        # only plane/strength batch in practice (BatchedGraph vmaps planes;
        # bindings ride unbatched) — broadcast anything else defensively
        def one(args):
            pi, si = args
            return warp_pallas(pi, si, k, pairs, npairs, halo)

        assert pb and sb and not (kb or prb or npb), "unsupported batch axes"
        out = jax.lax.map(one, (p, s))
        return out, True

    @jax.custom_vjp
    def warp_fn(p, s, k, pairs, npairs):
        return pallas_fn(p, s, k, pairs, npairs)

    def fwd(p, s, k, pairs, npairs):
        return pallas_fn(p, s, k, pairs, npairs), (p, s, k)

    def bwd(res, cot):
        p, s, k = res
        from .warp import warp_planes

        h, w = p.shape
        rows = np.arange(h, dtype=np.int32)
        cols = np.arange(w, dtype=np.int32)

        def jnp_warp(pi, si, ki):
            return warp_planes((pi,), si, rows, cols, ki, h, w)[0]

        _, vjp = jax.vjp(jnp_warp, p, s, k)
        gp, gs, gk = vjp(cot)
        # integer primals take float0 cotangents (the staircase table is
        # pure data movement — nothing differentiates through it)
        return (gp, gs, gk,
                np.zeros((cap, 2), dtype=jax.dtypes.float0),
                np.zeros((), dtype=jax.dtypes.float0))

    warp_fn.defvjp(fwd, bwd)
    return warp_fn
