"""Pallas TPU kernel for the separable wrap Gaussian blur.

Why this op gets a hand-written kernel when HeightToNormal's was deleted
(see `height_to_normal.py`'s lowering note): XLA fuses h2n's TWO rolled
reads into one streaming pass, but it will not fuse blur's up-to-31-tap
shifted-read sum at 4096² — it materializes rolled/shifted copies in HBM,
measured 15.1 ms for σ=5 @ 4096² (≈18 GB/s effective) and 3.1 ms for σ=1,
both far under the ≈780 GB/s roofline. The op is a pure streaming stencil:
read each input element once, write each output once (134 MB at 4096²,
≈0.2 ms at roofline).

Kernel design (the double-buffering pattern from the TPU Pallas playbook):
ONE kernel invocation (no grid) loops over row chunks with two input and
two output VMEM buffers — chunk i+1's HBM→VMEM DMA overlaps chunk i's
compute, and compute overlaps chunk i-1's VMEM→HBM write-back, so HBM
stays busy (the deleted h2n kernel's flaw was exactly this: one serial
DMA-wait-compute per tile). The input is wrap-padded by an 8-row-aligned
halo (Mosaic DMA slices must be 8-row aligned); the vertical pass reads
static tap-offset slices of the chunk, the horizontal pass uses lane
rotates (`pltpu.roll`).

Bit-exactness: the per-element arithmetic replays `blur._blur_axis0`
exactly — zero-init accumulator, taps added in order, plain f32 mul on TPU
(`exact_math.nc_mul` is an identity mul there) — and slices/rotates don't
round, so output planes are bit-identical to the jnp lowering (asserted in
interpret mode by `tests/test_pallas_blur.py` and on chip by
`scripts/tpu_parity.py`'s blur determinism row).

Composition: wrapped in `custom_vmap` (batched calls `lax.map` the rank-2
kernel — Mosaic rejects batched specs on ANY-space inputs) and `custom_vjp`
(backward re-traces the bit-identical jnp formulation for autodiff).
"""

from __future__ import annotations

import functools


def _ceil_div(a: int, b: int) -> int:
    return -(-a // b)


def _compute_chunk(taps: tuple, radius: int, rp: int, chunk_rows: int, width: int,
                   ibuf, vbuf, obuf, slot):
    """Both separable passes over one resident chunk — shared verbatim by the
    padded and halo kernels so their arithmetic cannot diverge.

    nc_mul is a plain mul on TPU (free) and the anti-FMA Dekker guard
    elsewhere — which makes INTERPRET mode (which runs as XLA:CPU, where
    LLVM contracts mul+add) bit-match `_blur_axis0`'s CPU arithmetic.

    Vertical pass: out row j (chunk-local) needs padded rows
    j + rp - radius + t; replay _blur_axis0's tap order. Accumulate IN
    PLACE through refs: an SSA accumulator chain makes Mosaic keep every
    unrolled tap's temps live on the VMEM stack (measured 40 MB at 7 taps
    x 192-row chunks — instant scoped-vmem OOM); ref stores end each
    temp's lifetime at the statement."""
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from .exact_math import nc_mul

    vbuf[...] = jnp.zeros((chunk_rows, width), jnp.float32)
    for t, w in enumerate(taps):
        rows = ibuf[slot, pl.ds(rp - radius + t, chunk_rows), :]
        vbuf[...] = vbuf[...] + nc_mul(rows, jnp.float32(w))

    # horizontal pass: lane rotate == jnp.roll(·, radius-t, axis=1)
    obuf[slot] = jnp.zeros((chunk_rows, width), jnp.float32)
    for t, w in enumerate(taps):
        shifted = pltpu.roll(vbuf[...], (radius - t) % width, 1)
        obuf[slot] = obuf[slot] + nc_mul(shifted, jnp.float32(w))


@functools.lru_cache(maxsize=256)
def _halo_call(block_h: int, width: int, taps: tuple, chunk_rows: int, interpret: bool):
    """Kernel over a RAW `(block_h, width)` block in HBM plus two
    8-row-aligned halo strips (`top8` rows `[rp-radius, rp)` = the radius
    rows preceding the block, `bot8` rows `[0, radius)` = the rows
    following it; the other strip rows are never read).

    This replaces `_padded_call`'s XLA-side `jnp.concatenate` wrap pad —
    which materialized a full padded copy of the plane in HBM (~2x the
    op's streaming traffic at small sigma; bench_ops rows @4096² moved
    0.42→0.35 ms at sigma=1 and 0.54→0.37 ms sharded — and those rows
    still pay an input materialization the old pad piggybacked on, so the
    saving inside a fused engine program is larger) — with in-kernel DMA
    segmentation: the first chunk
    DMAs the top strip + its block rows, the last chunk its block rows +
    the bottom strip, interior chunks a single contiguous slice. Requires
    `chunk_rows | block_h` and `rp <= chunk_rows` (so only the first/last
    chunks touch a strip) — `_pick_halo_chunk` finds such a chunk size or
    reports the geometry unviable, in which case callers keep the padded
    kernel. Arithmetic is `_compute_chunk`, shared with `_padded_call`."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    radius = (len(taps) - 1) // 2
    rp = _ceil_div(radius, 8) * 8
    if not (chunk_rows and block_h % chunk_rows == 0 and rp <= chunk_rows <= block_h):
        raise ValueError("unviable halo-kernel geometry; use _padded_call")
    n_chunks = block_h // chunk_rows
    c = chunk_rows

    def kernel(block_hbm, top_hbm, bot_hbm, out_hbm):
        def body(ibuf, vbuf, obuf, isem, osem):
            # ibuf row k of chunk i holds logical row i*c - rp + k (strip
            # rows standing in for out-of-range indices), matching
            # _padded_call's window layout exactly.
            def seg_first(slot):
                segs = [(top_hbm.at[pl.ds(0, rp), :], ibuf.at[slot, pl.ds(0, rp), :])]
                if n_chunks == 1:
                    segs.append((block_hbm.at[pl.ds(0, block_h), :],
                                 ibuf.at[slot, pl.ds(rp, block_h), :]))
                    segs.append((bot_hbm.at[pl.ds(0, rp), :],
                                 ibuf.at[slot, pl.ds(rp + block_h, rp), :]))
                else:
                    segs.append((block_hbm.at[pl.ds(0, c + rp), :],
                                 ibuf.at[slot, pl.ds(rp, c + rp), :]))
                return segs

            def seg_last(slot):
                return [
                    (block_hbm.at[pl.ds(block_h - c - rp, c + rp), :],
                     ibuf.at[slot, pl.ds(0, c + rp), :]),
                    (bot_hbm.at[pl.ds(0, rp), :],
                     ibuf.at[slot, pl.ds(c + rp, rp), :]),
                ]

            def seg_interior(slot, idx):
                # written as 8·q so Mosaic's divisibility prover accepts the
                # dynamic offset (it proves `idx*c` but not `idx*c - rp`)
                start = 8 * (idx * (c // 8) - rp // 8)
                return [(block_hbm.at[pl.ds(start, c + 2 * rp), :],
                         ibuf.at[slot, pl.ds(0, c + 2 * rp), :])]

            def in_issue(slot, idx, wait: bool):
                # `slot` is traced; Mosaic cannot prove 8-row alignment of a
                # VMEM destination offset composed with a dynamic leading
                # index ("failed to prove a tile index is divisible by 8"),
                # so unroll the two slots into pl.when branches with static
                # slice offsets.
                for s in (0, 1):
                    @pl.when(slot == s)
                    def _(s=s):
                        def run(segs):
                            for src, dst in segs:
                                copy = pltpu.make_async_copy(src, dst, isem.at[s])
                                copy.wait() if wait else copy.start()

                        if n_chunks == 1:
                            run(seg_first(s))
                            return

                        @pl.when(idx == 0)
                        def _():
                            run(seg_first(s))

                        if n_chunks > 2:
                            @pl.when((idx >= 1) & (idx <= n_chunks - 2))
                            def _():
                                run(seg_interior(s, idx))

                        @pl.when(idx == n_chunks - 1)
                        def _():
                            run(seg_last(s))

            def out_dma(slot, idx):
                return pltpu.make_async_copy(
                    obuf.at[slot],
                    out_hbm.at[pl.ds(idx * c, c), :],
                    osem.at[slot],
                )

            # chunk 0's copies start eagerly (static index: run its
            # segment list directly rather than through the traced
            # branches; the in-loop wait reconstructs identical
            # descriptors, so the semaphore byte counts match)
            for src, dst in seg_first(0):
                pltpu.make_async_copy(src, dst, isem.at[0]).start()

            def loop_body(i, _):
                slot = jax.lax.rem(i, 2)
                nxt = jax.lax.rem(i + 1, 2)

                @pl.when(i + 1 < n_chunks)
                def _():
                    in_issue(nxt, i + 1, wait=False)

                in_issue(slot, i, wait=True)

                # the previous occupant of this output slot must be flushed
                # before the horizontal pass accumulates into it
                @pl.when(i >= 2)
                def _():
                    out_dma(slot, i - 2).wait()

                _compute_chunk(taps, radius, rp, c, width, ibuf, vbuf, obuf, slot)
                out_dma(slot, i).start()

            jax.lax.fori_loop(0, n_chunks, loop_body, None)
            if n_chunks >= 2:
                out_dma((n_chunks - 2) % 2, n_chunks - 2).wait()
            out_dma((n_chunks - 1) % 2, n_chunks - 1).wait()

        pl.run_scoped(
            body,
            ibuf=pltpu.VMEM((2, c + 2 * rp, width), jnp.float32),
            vbuf=pltpu.VMEM((c, width), jnp.float32),
            obuf=pltpu.VMEM((2, c, width), jnp.float32),
            isem=pltpu.SemaphoreType.DMA((2,)),
            osem=pltpu.SemaphoreType.DMA((2,)),
        )

    return pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 3,
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct((block_h, width), jnp.float32),
        interpret=interpret,
    )


def _pick_halo_chunk(block_h: int, width: int, taps_len: int, preferred: int) -> int:
    """Chunk size for `_halo_call`: a multiple of 8 that divides `block_h`,
    is >= the aligned halo `rp` (so only the first/last chunks touch the
    strips and every DMA offset stays 8-row aligned), and fits VMEM.
    Unlike the padded kernel (tuned chunk ~64), this kernel measures
    fastest with SMALL chunks — 4096² on chip: sigma=5 1.26 ms at c=32 vs
    1.50 at c=64, sigma=1 0.54 at c=16/32 vs 0.62 at c=64 — so the target
    is min(preferred, 32), floored at rp. Returns the largest viable
    divisor <= target (or the smallest one above it), or 0 when the
    geometry is unviable — callers then keep the padded-copy kernel."""
    if block_h % 8 or taps_len > 63 or taps_len < 3:  # radius 0 → no strips to DMA
        return 0
    radius = (taps_len - 1) // 2
    rp = _ceil_div(radius, 8) * 8
    target = max(min(preferred, 32), rp)
    best = 0
    for c in range(8, min(block_h, 256) + 1, 8):
        if block_h % c or c < rp:
            continue
        # 2 in (c+2rp) + 2 out + 1 scratch + ~4 statement temps, f32
        if (2 * (c + 2 * rp) + 7 * c) * width * 4 > 12_000_000:
            break
        if c <= target:
            best = c
        elif best == 0:
            best = c
            break
        else:
            break
    return best


@functools.lru_cache(maxsize=256)  # (shape, taps) keyed; bound for long sessions
def _padded_call(height: int, width: int, taps: tuple, chunk_rows: int, interpret: bool):
    """The raw kernel over an already-halo-padded input.

    Input shape `(n_chunks*chunk_rows + 2*rp, width)` where row `rp + j` is
    logical input row `j`; rows `[rp - radius, rp)` must hold the true
    preceding rows and rows `[rp + height, rp + height + radius)` the true
    following rows (toroidal wrap for the single-device path, a neighbor
    shard's halo for the shard_map path); every other pad row is never read
    by an output row < `height` and may hold anything. Output is
    `(n_chunks*chunk_rows, width)`; rows ≥ `height` are garbage to slice off.
    """
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    radius = (len(taps) - 1) // 2
    rp = _ceil_div(radius, 8) * 8  # 8-row-aligned halo
    n_chunks = _ceil_div(height, chunk_rows)

    def kernel(hpad_hbm, out_hbm):
        def body(ibuf, vbuf, obuf, isem, osem):
            def in_dma(slot, idx):
                return pltpu.make_async_copy(
                    hpad_hbm.at[pl.ds(idx * chunk_rows, chunk_rows + 2 * rp), :],
                    ibuf.at[slot],
                    isem.at[slot],
                )

            def out_dma(slot, idx):
                return pltpu.make_async_copy(
                    obuf.at[slot],
                    out_hbm.at[pl.ds(idx * chunk_rows, chunk_rows), :],
                    osem.at[slot],
                )

            in_dma(0, 0).start()

            def loop_body(i, _):
                slot = jax.lax.rem(i, 2)
                nxt = jax.lax.rem(i + 1, 2)

                @pl.when(i + 1 < n_chunks)
                def _():
                    in_dma(nxt, i + 1).start()

                in_dma(slot, i).wait()

                # the previous occupant of this output slot must be flushed
                # before the horizontal pass accumulates into it
                @pl.when(i >= 2)
                def _():
                    out_dma(slot, i - 2).wait()

                _compute_chunk(taps, radius, rp, chunk_rows, width, ibuf, vbuf, obuf, slot)
                out_dma(slot, i).start()

            jax.lax.fori_loop(0, n_chunks, loop_body, None)
            if n_chunks >= 2:
                out_dma((n_chunks - 2) % 2, n_chunks - 2).wait()
            out_dma((n_chunks - 1) % 2, n_chunks - 1).wait()

        pl.run_scoped(
            body,
            ibuf=pltpu.VMEM((2, chunk_rows + 2 * rp, width), jnp.float32),
            vbuf=pltpu.VMEM((chunk_rows, width), jnp.float32),
            obuf=pltpu.VMEM((2, chunk_rows, width), jnp.float32),
            isem=pltpu.SemaphoreType.DMA((2,)),
            osem=pltpu.SemaphoreType.DMA((2,)),
        )

    return pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct((n_chunks * chunk_rows, width), jnp.float32),
        interpret=interpret,
    )


@functools.lru_cache(maxsize=256)
def _blur_kernel(height: int, width: int, taps: tuple, chunk_rows: int, interpret: bool):
    import jax
    import jax.numpy as jnp

    radius = (len(taps) - 1) // 2
    rp = _ceil_div(radius, 8) * 8
    n_chunks = _ceil_div(height, chunk_rows)
    padded_rows = n_chunks * chunk_rows + 2 * rp
    call = _padded_call(height, width, taps, chunk_rows, interpret)

    @jax.jit
    def blur(p):
        # wrap halo: padded[k] = p[(k - rp) % height]. Rows past
        # height + radius only feed outputs past `height` (sliced off), but
        # tiling makes the whole pad wrap-correct anyway.
        tail_len = padded_rows - rp - height
        head = jnp.tile(p, (_ceil_div(rp, height), 1))[-rp:, :]
        tail = jnp.tile(p, (_ceil_div(tail_len, height), 1))[:tail_len, :]
        hpad = jnp.concatenate([head, p, tail], axis=0)
        return call(hpad)[:height]

    return blur


def fits_kernel(width: int, taps_len: int) -> bool:
    """True when the kernel is viable for this (width, taps) pair:

    - at the minimum 8-row chunk, the 2×in + 2×out + scratch + temps VMEM
      footprint must stay under budget (fails for extreme widths);
    - the statically-unrolled 2×taps tap loops must stay a sane Mosaic
      program size (σ ≳ 10 → hundreds of taps → compile-time blowup; the
      jnp lowering handles those).
    """
    if taps_len > 63:  # radius ≤ 31, σ ≲ 10
        return False
    radius = (taps_len - 1) // 2
    rp = _ceil_div(radius, 8) * 8
    min_chunk_bytes = (2 * (8 + 2 * rp) + 3 * 8 + 4 * 8) * width * 4
    return min_chunk_bytes <= 12_000_000


def default_chunk_rows(width: int, taps_len: int) -> int:
    """Rows per chunk: fill ~10 MB of VMEM across 2×in + 2×out + vertical
    scratch buffers plus ~4 statement-scoped (T, W) f32 temps, floored to
    the 8-row multiple."""
    radius = (taps_len - 1) // 2
    rp = _ceil_div(radius, 8) * 8
    # bytes/row ≈ (2 in + 2 out + 1 scratch + 4 temps) · W · 4, minus halo
    t = (10_000_000 - 2 * 2 * rp * width * 4) // (9 * width * 4)
    return max(8, min(256, (t // 8) * 8))


def blur_pallas(plane, taps, chunk_rows: int | None = None, interpret: bool | None = None):
    """Double-buffered one-pass separable wrap blur of one `[H, W]` plane.

    Routes through `_halo_call` (wrap strips are two cheap `rp`-row slices
    of the plane, no padded copy) when the geometry admits it, else the
    padded-copy kernel."""
    import jax

    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    height, width = plane.shape
    taps_t = tuple(float(w) for w in taps)
    if chunk_rows is None:
        chunk_rows = default_chunk_rows(width, len(taps_t))
    halo_chunk = _pick_halo_chunk(height, width, len(taps_t), chunk_rows)
    if halo_chunk:
        rp = _ceil_div((len(taps_t) - 1) // 2, 8) * 8
        call = _halo_call(height, width, taps_t, halo_chunk, interpret)
        # top strip rows [rp-radius, rp) must be the radius rows preceding
        # row 0 under wrap — the plane's LAST rp rows give exactly that
        # (rp <= chunk <= height guarantees a single slice suffices)
        return call(plane, plane[height - rp:, :], plane[:rp, :])
    chunk_rows = min(chunk_rows, _ceil_div(height, 8) * 8)
    return _blur_kernel(height, width, taps_t, chunk_rows, interpret)(plane)


def _blur_block(block, taps: tuple, top, bot, interpret: bool | None = None):
    """Kernel over one row block whose ±radius neighbor rows arrive as
    explicit halos (`top` = the `radius` rows preceding the block, `bot` =
    the `radius` rows following it). Identical arithmetic to the wrap path —
    only the pad construction differs, and pad rows beyond the ±radius halo
    are never read by a kept output row (see `_padded_call`)."""
    import jax
    import jax.numpy as jnp

    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    block_h, width = block.shape
    radius = (len(taps) - 1) // 2
    rp = _ceil_div(radius, 8) * 8
    preferred = default_chunk_rows(width, len(taps))
    halo_chunk = _pick_halo_chunk(block_h, width, len(taps), preferred)
    if halo_chunk:
        # align the radius-row halos to rp-row strips (zeros land on rows
        # the kernel never reads for a kept output); only these 2·rp rows
        # are XLA-materialized — the block itself is DMA'd in place
        zpad = jnp.zeros((rp - radius, width), jnp.float32)
        top8 = jnp.concatenate([zpad, top], axis=0) if rp > radius else top
        bot8 = jnp.concatenate([bot, zpad], axis=0) if rp > radius else bot
        return _halo_call(block_h, width, taps, halo_chunk, interpret)(block, top8, bot8)
    chunk_rows = min(preferred, _ceil_div(block_h, 8) * 8)
    n_chunks = _ceil_div(block_h, chunk_rows)
    padded_rows = n_chunks * chunk_rows + 2 * rp
    hpad = jnp.concatenate(
        [
            jnp.zeros((rp - radius, width), jnp.float32),
            top,
            block,
            bot,
            jnp.zeros((padded_rows - rp - block_h - radius, width), jnp.float32),
        ],
        axis=0,
    )
    call = _padded_call(block_h, width, taps, chunk_rows, interpret)
    return call(hpad)[:block_h]


def fits_sharded(height: int, width: int, taps_len: int, n_shards: int) -> bool:
    """Viability of the shard_map'd kernel: rows must divide the mesh axis,
    each shard's block must cover the halo (one ppermute hop per side), and
    the per-shard kernel must itself be viable."""
    radius = (taps_len - 1) // 2
    return (
        height % n_shards == 0
        and height // n_shards >= max(radius, 8)
        and width % 128 == 0
        and fits_kernel(width, taps_len)
    )


@functools.lru_cache(maxsize=32)  # sigma edits mint new programs; bound them
def _blur_pallas_sharded(taps: tuple, mesh, interpret: bool, axis=None):
    """shard_map'd kernel: each device runs the Mosaic kernel on its row
    block after a ring `ppermute` exchange of the ±radius halo rows — the
    wrap-stencil sampling of `height_to_normal.rs:55-56` reproduced at mesh
    scale (ring neighbors ARE the toroidal continuation, so global wrap
    falls out of the exchange). GSPMD cannot partition a Mosaic custom call,
    so without this every `TextureProcessor(mesh=…)` program lost the
    kernel's 7-10× win; with it the kernel stays per-shard and only
    2·radius·W f32 rows ride the ICI per device.

    Wrapped in custom_vjp (backward re-traces the bit-identical jnp
    formulation, which GSPMD differentiates and partitions on its own)."""
    import jax
    import numpy as np
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    axis = axis or mesh.axis_names[0]
    n = int(mesh.shape[axis])
    radius = (len(taps) - 1) // 2

    def body(block):
        import jax.numpy as jnp

        if n == 1:
            top = block[-radius:]
            bot = block[:radius]
        else:
            fwd = [(i, (i + 1) % n) for i in range(n)]
            bwd = [(i, (i - 1) % n) for i in range(n)]
            # device j receives shard j-1's bottom rows (its preceding rows)
            top = jax.lax.ppermute(block[-radius:], axis, fwd)
            # … and shard j+1's top rows (its following rows)
            bot = jax.lax.ppermute(block[:radius], axis, bwd)
        return _blur_block(block, taps, top, bot, interpret=interpret)

    # check_vma=False: pallas_call can't declare its output's varying-axes
    # set, so shard_map's replication checker must be off (the body is
    # honestly varying over `axis` and nothing else)
    sharded = shard_map(
        body, mesh=mesh, in_specs=P(axis, None), out_specs=P(axis, None),
        check_vma=False,
    )

    @jax.custom_vjp
    def blur_fn(p):
        return sharded(p)

    def fwd_rule(p):
        return sharded(p), p

    def bwd_rule(p, cotangent):
        from .blur import _blur_axis0

        taps_arr = np.asarray(taps, dtype=np.float32)

        def jnp_blur(q):
            vert = _blur_axis0(q, taps_arr)
            return _blur_axis0(vert.T, taps_arr).T

        _, vjp = jax.vjp(jnp_blur, p)
        return vjp(cotangent)

    blur_fn.defvjp(fwd_rule, bwd_rule)
    return blur_fn


@functools.cache
def _blur_pallas_wrapped(taps: tuple):
    """vmap- and grad-composable wrapper (same pattern the h2n kernel used;
    see module docstring)."""
    import jax
    from jax.custom_batching import custom_vmap

    @custom_vmap
    def pallas_fn(p):
        return blur_pallas(p, taps)

    @pallas_fn.def_vmap
    def _batch_rule(axis_size, in_batched, p):  # noqa: ANN001
        out = jax.lax.map(lambda q: blur_pallas(q, taps), p)
        return out, True

    @jax.custom_vjp
    def blur_fn(p):
        return pallas_fn(p)

    def fwd(p):
        return pallas_fn(p), p

    def bwd(p, cotangent):
        import numpy as np

        from .blur import _blur_axis0

        taps_arr = np.asarray(taps, dtype=np.float32)

        def jnp_blur(q):
            vert = _blur_axis0(q, taps_arr)
            return _blur_axis0(vert.T, taps_arr).T

        _, vjp = jax.vjp(jnp_blur, p)
        return vjp(cotangent)

    blur_fn.defvjp(fwd, bwd)
    return blur_fn
