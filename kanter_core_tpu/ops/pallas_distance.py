"""Pallas TPU kernel for the jump-flood Distance propagation.

Why this op gets a kernel (DESIGN.md §10 has the full rework ledger): the
step-batched packed JFA's roll→select chain is the HBM-materialization
class — XLA materializes the 8 rolled copies of the state plane every
step, chip-measured 27.5 ms at 4096² (~1.3× that materializing bound).
But a JFA step only ever reads rows y−k, y, y+k of the state, so a
double-buffered kernel needs THREE CHUNK-SIZED ROW WINDOWS resident per
chunk — not the full plane (the residency concern that deferred this
kernel in the first r4 pass was wrong): per step the plane streams
3 reads + 1 write for k ≥ 8 and 1 read + 1 write for k < 8, a ~4.6×
traffic cut over the materializing form. Chip result: **27.7 → 10.8 ms
at 4096², bit-identical (0/16.7M)**; the remaining time is VPU compute
(~190 int-ops/px/step of unpack + toroidal d² + fold — chunk-size and
DMA-shape variations measure neutral), so this is the formulation's
compute envelope, not a traffic shortfall.

Kernel design (the blur kernel's double-buffer pattern, `pallas_blur`):
ONE invocation per JFA step loops over 8-row chunks with two input and
two output VMEM slots — chunk i+1's HBM→VMEM DMAs overlap chunk i's
compute, which overlaps chunk i−1's write-back. The 8-row chunk makes
every k ≥ 8 window trivially aligned AND unsplittable: JFA steps are
powers of two, so a window start `(8·i ± k) mod H` is a chunk boundary
(Mosaic's 8-row DMA alignment holds, and a window never crosses the
wrap seam mid-copy — it IS a whole chunk at block index
`(i ± k/8) mod n`). Steps k < 8 instead DMA one `[8·i − 8, 8·i + 16)`
window (the blur's first/interior/last halo-strip segmentation) and take
static in-VMEM row offsets 8∓k.

Bit-exactness: the candidate fold replays `distance_plane`'s
step-batched order exactly — same (oy, ox) enumeration, same strict-<
first-seen-wins ties — and every op is INTEGER (i32 unpack/abs/wrap/
mul/add/compare/select; `pltpu.roll` is data movement), so outputs are
bit-identical to the jnp lowering on every backend by construction
(asserted in interpret mode by `tests/test_pallas_distance.py` across
wrap-seam/near-step/degenerate geometries, and on chip by the battery's
`distance_jfa` row, whose TPU side runs this kernel vs the CPU jnp
form).

Composition: `custom_vmap` wraps the full step ladder (batched calls
`lax.map` the rank-2 kernel — Mosaic rejects batched specs on ANY-space
inputs). No custom_vjp is needed: the JFA state is integer, so JAX
already treats the propagation as gradient-dead (the only differentiable
path through Distance is max_dist via the final fade, which stays jnp).
GSPMD cannot partition a Mosaic call, so mesh programs keep the jnp
form (its rolls lower to collective permutes — `dryrun_multichip`
validates that composition bit-identically).
"""

from __future__ import annotations

import functools

#: test hook: force the Pallas lowering (interpret mode) off-TPU so the
#: CPU suite exercises the kernel path the chip runs (`blur` convention)
FORCE_PALLAS_INTERPRET = False

_CHUNK = 8  # minimum chunk; every k ≥ 8 window stays one aligned copy


def _chunk_for(height: int, k: int) -> int:
    """Rows per chunk for step k: the largest of {32, 16, 8} dividing the
    height AND (for far steps) the step — `c | k` keeps each ±k window a
    whole number of chunks, so it never splits at the wrap seam and every
    DMA offset stays 8-row aligned. Chunk size measured ~neutral on chip
    (c=8 everywhere: 10.8 ms at 4096²; c=min(32,k): 11.3 ms — within
    tunnel noise): the kernel is VPU-COMPUTE-bound (~190 int-ops/px/step
    of unpack+d²+fold), so DMA latency is already hidden either way;
    the larger chunks are kept for the smaller per-step loop counts."""
    for c in (32, 16, 8):
        if height % c == 0 and height >= 2 * c and (k < 8 or k % c == 0):
            return c
    return 0


def fits_kernel(height: int, width: int) -> bool:
    """Viability: 8-row-divisible height (chunk grid + wrap-seam
    alignment), lane-aligned width (`pltpu.roll` tiling), enough rows for
    the near-step halo window, and the VMEM footprint at the largest
    chunk (~7 MB at 4096 lanes; only extreme widths could overflow)."""
    return (
        height % _CHUNK == 0
        and height >= 4 * _CHUNK  # near-mode first/last segmentation room
        and width % 128 == 0
        and (2 * 3 + 2 + 8) * 32 * width * 4 <= 12_000_000
    )


@functools.lru_cache(maxsize=512)  # (H, W, k) keyed; steps are ~13/canvas
def _jfa_step_call(height: int, width: int, k: int, interpret: bool):
    """One JFA step over the packed i32 state plane: new state where each
    pixel folds its 8 step-k neighbors' candidates (step-batched,
    `distance_plane` order)."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    c = _chunk_for(height, k)
    assert c, "caller must gate on fits_kernel"
    n = height // c
    far = k >= 8
    kc = (k // c) % n if far else 0  # window displacement in chunks
    q = c // 8  # offsets written as 8·(q·idx ± …) for the Mosaic prover

    def d2_of(cand, rows_g, cols_g):
        # EXACTLY distance_plane.d2_of: i32 unpack, toroidal |Δ|, i32 d².
        # Scalar constants are minted INSIDE the traced kernel (pallas
        # rejects captured constant arrays).
        sent = jnp.int32(0x7FFFFFFF)
        big = jnp.int32(2**30)  # _FAR — the d² sentinel
        half_h, half_w = jnp.int32(height // 2), jnp.int32(width // 2)
        hh, ww = jnp.int32(height), jnp.int32(width)
        valid = cand != sent
        cy = jnp.right_shift(cand, jnp.int32(16))
        cx = jnp.bitwise_and(cand, jnp.int32(0xFFFF))
        dy = jnp.abs(rows_g - cy)
        dy = jnp.where(dy > half_h, hh - dy, dy)
        dx = jnp.abs(cols_g - cx)
        dx = jnp.where(dx > half_w, ww - dx, dx)
        dy = jnp.where(valid, dy, jnp.int32(0))
        dx = jnp.where(valid, dx, jnp.int32(0))
        return jnp.where(valid, dy * dy + dx * dx, big)

    def compute(ibuf, obuf, best_ref, bestd_ref, slot, i):
        cols_g = jax.lax.broadcasted_iota(jnp.int32, (c, width), 1)
        rows_g = (
            jax.lax.broadcasted_iota(jnp.int32, (c, width), 0)
            + (i * jnp.int32(c))
        )

        def window(dy_sign):
            # candidate rows (r − oy) mod H for oy = dy_sign·k
            if far:
                # ibuf[slot] holds [rows−k, rows, rows+k] wait — see DMA:
                # index 0 = (i−kc) (rows r−k → oy=+k), 1 = center,
                # 2 = (i+kc) (rows r+k → oy=−k)
                j = {+1: 0, 0: 1, -1: 2}[dy_sign]
                return ibuf[slot, j]
            # near mode: one window holds rows [8i−8, 8i+16); candidate
            # rows (r − oy) sit at static offset 8 − oy
            off = 8 - dy_sign * k
            return ibuf[slot, pl.ds(off, c), :]

        center = window(0)
        best_ref[...] = center
        bestd_ref[...] = d2_of(center, rows_g, cols_g)
        # distance_plane's step-batched enumeration, same order
        for oy in (-k, 0, k):
            vert = window(1 if oy > 0 else (-1 if oy < 0 else 0))
            for ox in (-k, 0, k):
                if oy == 0 and ox == 0:
                    continue
                cand = pltpu.roll(vert, ox % width, 1) if ox % width else vert
                d2 = d2_of(cand, rows_g, cols_g)
                better = d2 < bestd_ref[...]  # strict: first-seen wins
                best_ref[...] = jnp.where(better, cand, best_ref[...])
                bestd_ref[...] = jnp.where(better, d2, bestd_ref[...])
        obuf[slot] = best_ref[...]

    def kernel(in_hbm, out_hbm):
        def body(ibuf, obuf, best_ref, bestd_ref, isem, osem):
            def far_segs(s, i):
                # three whole-chunk windows; block indices mod n (offsets
                # written as 8·(q·idx) so Mosaic's divisibility prover
                # accepts them — the blur's seg_interior trick)
                up = jax.lax.rem(i - kc + n, n)
                dn = jax.lax.rem(i + kc, n)
                return [
                    (in_hbm.at[pl.ds(8 * (q * up), c), :], ibuf.at[s, 0]),
                    (in_hbm.at[pl.ds(8 * (q * i), c), :], ibuf.at[s, 1]),
                    (in_hbm.at[pl.ds(8 * (q * dn), c), :], ibuf.at[s, 2]),
                ]

            # near-mode [c·i−8, c·i+c+8) mod H windows (±8-row halo for
            # k < 8) as 1-2 static-length segments — the blur's
            # first/interior/last halo segmentation
            def near_first(s):
                return [
                    (in_hbm.at[pl.ds(height - 8, 8), :],
                     ibuf.at[s, pl.ds(0, 8), :]),
                    (in_hbm.at[pl.ds(0, c + 8), :],
                     ibuf.at[s, pl.ds(8, c + 8), :]),
                ]

            def near_interior(s, i):
                start = 8 * (q * i - 1)
                return [(in_hbm.at[pl.ds(start, c + 16), :],
                         ibuf.at[s, pl.ds(0, c + 16), :])]

            def near_last(s):
                return [
                    (in_hbm.at[pl.ds(height - c - 8, c + 8), :],
                     ibuf.at[s, pl.ds(0, c + 8), :]),
                    (in_hbm.at[pl.ds(0, 8), :],
                     ibuf.at[s, pl.ds(c + 8, 8), :]),
                ]

            def run(segs, s, wait: bool):
                for src, dst in segs:
                    copy = pltpu.make_async_copy(src, dst, isem.at[s])
                    copy.wait() if wait else copy.start()

            def in_issue(slot, i, wait: bool):
                """slot/i traced; Mosaic cannot prove alignment through a
                dynamic leading VMEM index, so the two slots unroll into
                pl.when branches with static slot indices (blur
                convention)."""
                for s in (0, 1):
                    @pl.when(slot == s)
                    def _(s=s):
                        if far:
                            run(far_segs(s, i), s, wait)
                            return

                        @pl.when(i == 0)
                        def _():
                            run(near_first(s), s, wait)

                        if n > 2:
                            @pl.when((i >= 1) & (i <= n - 2))
                            def _():
                                run(near_interior(s, i), s, wait)

                        @pl.when(i == n - 1)
                        def _():
                            run(near_last(s), s, wait)

            def out_dma(slot, i):
                return pltpu.make_async_copy(
                    obuf.at[slot],
                    out_hbm.at[pl.ds(8 * (q * i), c), :],
                    osem.at[slot],
                )

            # chunk 0's copies start eagerly with STATIC descriptors (the
            # in-loop wait reconstructs identical ones, so the semaphore
            # byte counts match — blur convention)
            run(far_segs(0, 0) if far else near_first(0), 0, wait=False)

            def loop_body(i, _):
                slot = jax.lax.rem(i, 2)
                nxt = jax.lax.rem(i + 1, 2)

                @pl.when(i + 1 < n)
                def _():
                    in_issue(nxt, i + 1, wait=False)

                in_issue(slot, i, wait=True)

                @pl.when(i >= 2)
                def _():
                    out_dma(slot, i - 2).wait()

                compute(ibuf, obuf, best_ref, bestd_ref, slot, i)
                out_dma(slot, i).start()

            jax.lax.fori_loop(0, n, loop_body, None)
            if n >= 2:
                out_dma((n - 2) % 2, n - 2).wait()
            out_dma((n - 1) % 2, n - 1).wait()

        ishape = (2, 3, c, width) if far else (2, c + 16, width)
        pl.run_scoped(
            body,
            ibuf=pltpu.VMEM(ishape, jnp.int32),
            obuf=pltpu.VMEM((2, c, width), jnp.int32),
            best_ref=pltpu.VMEM((c, width), jnp.int32),
            bestd_ref=pltpu.VMEM((c, width), jnp.int32),
            isem=pltpu.SemaphoreType.DMA((2,)),
            osem=pltpu.SemaphoreType.DMA((2,)),
        )

    return pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct((height, width), jnp.int32),
        interpret=interpret,
    )


@functools.lru_cache(maxsize=64)
def _jfa_ladder(height: int, width: int, steps: tuple, interpret: bool):
    """The full step ladder over the packed state, vmap-composable."""
    import jax
    from jax.custom_batching import custom_vmap

    calls = [_jfa_step_call(height, width, k, interpret) for k in steps]

    @custom_vmap
    def ladder(packed):
        for call in calls:
            packed = call(packed)
        return packed

    @ladder.def_vmap
    def _batch_rule(axis_size, in_batched, packed):  # noqa: ANN001
        def one(p):
            for call in calls:
                p = call(p)
            return p

        return jax.lax.map(one, packed), True

    return ladder


def jfa_propagate_pallas(packed, steps, interpret: bool | None = None):
    """Run the whole JFA ladder through the Mosaic step kernel.

    `packed` is the y<<16|x i32 state plane from `distance_plane`;
    `steps` the static `_jfa_steps` ladder. Caller gates on
    `fits_kernel`."""
    import jax

    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    h, w = packed.shape
    return _jfa_ladder(h, w, tuple(int(k) for k in steps), interpret)(packed)
