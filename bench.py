"""Benchmark: fused-graph throughput + incremental re-eval latency.

Mirrors BASELINE.json configs 4/5: a deep invert/blend/square chain over a
4k RGBA canvas compiled into one fused XLA program (config 4), the
interactive path (re-run after a Value edit — a program-cache hit), a
16×4k batched variant AT SPEC (config 5) via vmap, and config 4's eviction
clause — the same chain through the live engine with a one-plane device
tier, forcing the PlaneBufferQueue to spill to host mid-run (default
canvas 4096 = BASELINE config 4 AT SPEC; set KANTER_BENCH_EVICT_CANVAS=2048
if tunnel stalls blow the run's budget).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...}

## Honesty protocol

The TPU here sits behind a remote HTTP tunnel whose per-dispatch round trip
(~15-30 ms) dwarfs the actual kernel times and which can complete
`block_until_ready` without a data-forcing read. Naive wall-clock timing of
individual dispatches therefore measures the tunnel, not the chip (and
without a forcing read it measures *nothing* — the r1 numbers were enqueue
acks). Every stage here instead:

1. runs N evaluations inside ONE jitted `lax.scan`, each iteration binding a
   unique scalar and emitting an on-device checksum. The output planes pass
   through `lax.optimization_barrier` before the checksum slice, so XLA must
   fully materialize every iteration's output (no slice push-down, no DCE);
2. fetches all N checksums to host inside the timed window (a remote backend
   cannot ack-without-executing a data read) and verifies they are pairwise
   distinct (`checksums_distinct` in the JSON);
3. times the scan at two lengths N1 < N2 and reports the *difference*
   `(T(N2)-T(N1))/(N2-N1)` — the fixed tunnel/dispatch overhead cancels,
   leaving pure per-evaluation device time;
4. reports a measured pointwise-op roofline (`roofline_gbps`) first, plus
   each stage's `implied_gbps`, so any implausible number is self-evident:
   implied must be ≤ roofline.

`incremental_p50_ms` is the honest END-TO-END latency of one synchronous
re-evaluation including the tunnel round trip and a forcing read
(`tunnel_roundtrip_ms` records the measured floor — a no-op dispatch+fetch);
`incremental_device_ms` is the amortized on-device time a local deployment
would see. `sustained_edit_ms` is the pipelined interactive number: K edits
(value tick + input roll) dispatched asynchronously with ONE forcing read at
the end — a single synchronous edit can never beat the RTT on this tunnel,
but an editor pipelining slider ticks amortizes it below the 10 ms target.

The north-star target is >=50 Gpixel/s fused-graph throughput on a v5e-8;
per chip that is 6.25 Gpixel/s. The headline `value` counts RAW OUTPUT
pixels only (one canvas per evaluation pass); the flattering-but-defensible
"node-evals × pixels" figure is reported separately as `node_evals_gpix_s`.
"""

from __future__ import annotations

import json
import os
import time

import numpy as np

from benchlib import ScanBench as _ScanBench, chk as _chk, device_random as _device_random

CANVAS = int(os.environ.get("KANTER_BENCH_CANVAS", "4096"))
CHAIN = int(os.environ.get("KANTER_BENCH_CHAIN", "64"))
BATCH = int(os.environ.get("KANTER_BENCH_BATCH", "16"))
BATCH_CANVAS = int(os.environ.get("KANTER_BENCH_BATCH_CANVAS", "4096"))
TARGET_PER_CHIP_GPIX = 50.0 / 8.0  # v5e-8 north star, per chip


def main() -> None:
    import jax

    from kanter_core_tpu import SlotId
    from kanter_core_tpu.compiler import CompiledGraph
    from kanter_core_tpu.graphs import bounded_chain_graph

    backend = jax.default_backend()
    extras: dict = {}
    distinct = True

    # --- tunnel round-trip floor: no-op dispatch + scalar fetch ---
    tiny = jax.jit(lambda c: c * 2.0)
    float(tiny(np.float32(1.0)))
    rtt = []
    for i in range(10):
        t0 = time.perf_counter()
        float(tiny(np.float32(i)))
        rtt.append((time.perf_counter() - t0) * 1000.0)
    extras["tunnel_roundtrip_ms"] = round(float(np.percentile(rtt, 50)), 3)

    # --- roofline: max over two pointwise calibration shapes ---
    # (a) one 256 MB array in/out; (b) three separate 64 MB planes in/out,
    # the same buffer shape the fused chain moves. Achievable bandwidth
    # differs by >20% between these on this chip, so the roofline is the max.
    roof_plane = _device_random((4, 4096, 4096), seed=7)
    roof = _ScanBench(lambda c, x: (x * c,), roof_plane, n1=8, n2=64)
    roof_s, ok = roof.run()
    distinct &= ok
    roofline_a = 2 * roof_plane.size * 4 / roof_s / 1e9
    del roof, roof_plane
    planes3 = tuple(_device_random((4096, 4096), seed=20 + i) for i in range(3))
    roof3 = _ScanBench(
        lambda c, ps: tuple(p * c for p in ps), planes3, n1=8, n2=64
    )
    roof3_s, ok3 = roof3.run()
    distinct &= ok3
    roofline_b = 2 * 3 * 4096 * 4096 * 4 / roof3_s / 1e9
    del roof3
    # (c) SAME-STRUCTURE calibration for the fused chain (VERDICT r3 weak
    # #5): three INTERDEPENDENT outputs over three input planes, so XLA
    # emits ONE fused kernel interleaving all 3 reads + 3 writes — the
    # chain's exact memory structure — instead of (b)'s three independent
    # kernels whose launch gaps depress the measured ceiling. With this
    # row in the max, `implied_within_roofline` holds at 1.05× headroom
    # (r3's chain beat calibration (b) by 6.5% and passed only through a
    # 1.25× fudge).
    roof3f = _ScanBench(
        lambda c, ps: (
            ps[0] * c,
            (ps[0] + ps[1]) * c,
            ((ps[0] + ps[1]) + ps[2]) * c,
        ),
        planes3, n1=8, n2=64,
    )
    roof3f_s, ok3f = roof3f.run()
    distinct &= ok3f
    roofline_c = 2 * 3 * 4096 * 4096 * 4 / roof3f_s / 1e9
    del roof3f, planes3
    roofline_gbps = max(roofline_a, roofline_b, roofline_c)
    extras["roofline_checksums_distinct"] = ok and ok3 and ok3f
    extras["roofline_gbps"] = round(roofline_gbps, 1)
    extras["roofline_1buf_gbps"] = round(roofline_a, 1)
    extras["roofline_3buf_gbps"] = round(roofline_b, 1)
    extras["roofline_3buf_fused_gbps"] = round(roofline_c, 1)

    # --- config 4: fused 64-node chain @ 4k, amortized device time ---
    graph, inputs, white, out = bounded_chain_graph(depth=CHAIN)
    from kanter_core_tpu.node import NodeTypeKind as _K

    # count the COMPUTE nodes from the graph itself: the builder's
    # round-robin emits ceil(depth/5)*5 mixes (65 at depth 64), so
    # CHAIN + 1 undercounted node_evals_gpix_s
    compute_nodes = sum(
        1 for n in graph.nodes
        if n.node_type.kind in (_K.MIX, _K.COMBINE_RGBA)
    )
    prog = CompiledGraph(graph, targets=[(out, SlotId(0))])
    for i, node in enumerate(inputs):
        prog.bind_input(node, [_device_random((CANVAS, CANVAS), seed=i)])
    out_key = (out, SlotId(0))
    white_key = f"value_{int(white)}"

    def chain_body(val, bindings):
        return prog._raw_fn({**bindings, white_key: val})[out_key]

    chain = _ScanBench(chain_body, dict(prog._bindings), n1=8, n2=64, base=0.955)
    chain_s, ok = chain.run()
    distinct &= ok
    extras["chain_checksums_distinct"] = ok

    raw_gpix_s = CANVAS * CANVAS / chain_s / 1e9
    node_evals_gpix_s = compute_nodes * raw_gpix_s
    # one fused pass reads 3 input planes and writes 3 computed output
    # planes; the alpha output aliases the 4th input (CombineRgba zero-copy:
    # never copied, only corner-sampled by the checksum) → 6 plane transfers
    chain_gbps = 6 * CANVAS * CANVAS * 4 / chain_s / 1e9
    extras["chain_device_ms"] = round(chain_s * 1e3, 3)
    extras["chain_implied_gbps"] = round(chain_gbps, 1)
    extras["node_evals_gpix_s"] = round(node_evals_gpix_s, 1)
    # 1.05× headroom (tightened from r3's 1.25× fudge): the roofline max
    # now includes the same-structure fused-kernel calibration (c), so the
    # chain has no structural edge left over the ceiling — anything >5%
    # above it is a traffic-model or measurement error, not "overlap"
    extras["implied_within_roofline"] = bool(chain_gbps <= roofline_gbps * 1.05)

    # --- interactive: one synchronous re-eval incl. tunnel + forcing read ---
    chk_jit = jax.jit(lambda planes: _chk(planes))
    lat = []
    inc_vals = []
    for i in range(20):
        prog.set_value(white, 0.95 - (i + 1) * 1e-4)
        t0 = time.perf_counter()
        r = prog()
        inc_vals.append(float(chk_jit(r[out_key])))
        lat.append((time.perf_counter() - t0) * 1000.0)
    inc_ok = len(set(inc_vals)) == len(inc_vals)
    distinct &= inc_ok
    extras["incremental_checksums_distinct"] = inc_ok
    incremental_p50_ms = float(np.percentile(lat, 50))
    extras["incremental_device_ms"] = round(chain_s * 1e3, 3)

    # --- sustained (pipelined) editing: K edits submitted asynchronously,
    # all forced at the end. One SYNCHRONOUS edit can never beat the tunnel
    # round trip (incremental_p50_ms ≈ tunnel_roundtrip_ms + device time);
    # an editor that pipelines slider ticks amortizes the RTT across K
    # in-flight evaluations — this is the deployment-relevant interactive
    # number, and on local hardware it converges to the device time. ---
    K = 32
    import jax.numpy as jnp

    # distinctness driver: a value edit PLUS a per-iteration roll of one
    # input plane (value steps alone can collide — the chaotic chain needs
    # ~log2(1/δ) iterations to decorrelate a δ-sized edit, and the in-band
    # step budget is too small at K=32); the roll is data movement the
    # checksum's corner slice sees directly. Also the realistic editor mix:
    # slider ticks + canvas strokes.
    base0 = prog._bindings[f"input_{int(inputs[0])}"][0]
    roll_jit = jax.jit(lambda p, k: jnp.roll(p, k, axis=0))
    in0_key = f"input_{int(inputs[0])}"
    # warm the override-shape executable, roll program, AND the K-way stack
    # outside the window (each compile costs seconds through the tunnel)
    warm_chk = chk_jit(prog(**{in0_key: (roll_jit(base0, 999),)})[out_key])
    np.asarray(jnp.stack([warm_chk] * K))
    chks = []
    t0 = time.perf_counter()
    for i in range(K):
        prog.set_value(white, 0.9 - (i + 1) * 1e-4)
        rolled = roll_jit(base0, i + 1)
        r = prog(**{in0_key: (rolled,)})
        chks.append(chk_jit(r[out_key]))  # async device checksum, no force yet
    # ONE forcing read for all K results (an editor fetches only the latest
    # preview; fetching each intermediate would serialize K tunnel RTTs)
    sustained_vals = np.asarray(jnp.stack(chks)).tolist()
    sustained_ms = (time.perf_counter() - t0) * 1000.0 / K
    sus_ok = len(set(sustained_vals)) == len(sustained_vals)
    distinct &= sus_ok
    extras["sustained_edit_k"] = K
    extras["sustained_edit_ms"] = round(sustained_ms, 3)
    extras["sustained_edit_checksums_distinct"] = sus_ok

    # --- config 4 in the opt-in bf16 pipeline (DESIGN.md §9: bf16 at rest,
    # f32 in flight). EXPECTED ~parity (speedup ≈ 1.0): the deep chain is
    # VPU-bound, so halving the plane bytes doesn't move it — bf16 is a
    # FOOTPRINT feature (half the committed working set / tier / transfer
    # bytes), and this stage exists to keep that throughput-neutrality
    # claim measured rather than assumed. Implied bandwidth uses 2-byte
    # planes. The f32 value-tick driver works unchanged — deltas amplify
    # chaotically IN F32 to O(1) before the single output downcast, so
    # bf16 outputs stay pairwise distinct at this depth. ---
    prog16 = CompiledGraph(graph, targets=[(out, SlotId(0))], dtype="bfloat16")
    for node in inputs:
        # reuse the on-device f32 planes; bind_input downcasts on device
        prog16.bind_input(node, prog._bindings[f"input_{int(node)}"])

    def chain16_body(val, bindings):
        return prog16._raw_fn({**bindings, white_key: val})[out_key]

    chain16 = _ScanBench(
        chain16_body, dict(prog16._bindings), n1=8, n2=64, base=0.955
    )
    chain16_s, ok16 = chain16.run()
    distinct &= ok16
    extras["chain_bf16_checksums_distinct"] = ok16
    extras["chain_bf16_device_ms"] = round(chain16_s * 1e3, 3)
    extras["chain_bf16_raw_gpix_s"] = round(CANVAS * CANVAS / chain16_s / 1e9, 2)
    extras["chain_bf16_speedup"] = round(chain_s / chain16_s, 2)
    extras["chain_bf16_implied_gbps"] = round(
        6 * CANVAS * CANVAS * 2 / chain16_s / 1e9, 1
    )

    # --- Warp displacement: XLA:TPU's worst case vs the staircase kernel.
    # The data-dependent gather is the one op class where XLA's lowering
    # collapses to element-gather speed (~0.3 GB/s effective at 4k); the
    # Pallas staircase kernel (ops/pallas_warp.py, bit-identical — chip
    # battery rows warp_pallas_*) replaces it on kernel-viable geometries.
    # Both sides run the same scan protocol ((strength+c) % 1.0 varies the
    # displacement field per iteration); intensity 24 = halo bucket 32,
    # the WORST pair-table class. TPU-only: the comparison is about this
    # chip's gather lowering, and each gather iteration costs ~0.6 s. ---
    if backend == "tpu":
        from kanter_core_tpu.ops.pallas_warp import (
            fits_kernel as _w_fits,
            warp_pallas as _warp_pallas,
        )
        from kanter_core_tpu.ops.warp import (
            warp_bindings as _warp_bindings,
            warp_halo as _warp_halo,
            warp_planes as _warp_planes,
        )

        wb = _warp_bindings((57.0, 24.0))
        whalo = _warp_halo(24.0)
        if _w_fits(CANVAS, CANVAS, whalo) and "pairs" in wb:
            wrows = np.arange(CANVAS, dtype=np.int32)
            wp1 = _device_random((CANVAS, CANVAS), seed=40)
            wp2 = _device_random((CANVAS, CANVAS), seed=41)

            def warp_gather_body(c, ps):
                return _warp_planes(
                    (ps[0],), (ps[1] + c) % 1.0, wrows, wrows, ps[2],
                    CANVAS, CANVAS,
                )

            # gather iterations are ~0.6 s — tiny scan lengths are safe
            # (the two-length difference sits ~20× above the RTT jitter)
            wg = _ScanBench(
                warp_gather_body, (wp1, wp2, wb["k"]), n1=2, n2=5, base=0.25
            )
            wg_s, wg_ok = wg.run(repeats=3)
            distinct &= wg_ok

            def warp_kernel_body(c, ps):
                return (_warp_pallas(
                    ps[0], (ps[1] + c) % 1.0, ps[2], ps[3],
                    wb["npairs"], whalo,
                ),)

            wk = _ScanBench(
                warp_kernel_body,
                (wp1, wp2, wb["k"], jnp.asarray(wb["pairs"])),
                n1=8, n2=32, base=0.25,
            )
            wk_s, wk_ok = wk.run(repeats=3)
            distinct &= wk_ok
            extras["warp_intensity"] = 24
            extras["warp_gather_ms"] = round(wg_s * 1e3, 3)
            extras["warp_kernel_ms"] = round(wk_s * 1e3, 3)
            extras["warp_kernel_speedup"] = round(wg_s / wk_s, 1)
            extras["warp_checksums_distinct"] = wg_ok and wk_ok
            del wg, wk, wp1, wp2, warp_gather_body, warp_kernel_body

    # --- flagship composition (VERDICT r4 #1): the showcase pipeline —
    # 4 inputs → 8-mix RGBA chain → FBM noise × Brick pattern × JFA
    # Distance spread × Voronoi pores → radial Ramp vignette → Curvature
    # edge-wear → multi-scale AO (3 wrap Gaussians) → HeightToNormal →
    # Pallas blur → Hsv → Pallas warp — all in ONE fused program, the
    # composition isolation can't see (three Mosaic kernels + the gather
    # + four separable blur passes sharing VMEM/fusion). Honest protocol:
    # every iteration rolls input 0 AND perturbs every procedural
    # source's runtime argument (pattern seed — which also re-seeds the
    # Distance mask — voronoi jitter, noise persistence, ramp k), so XLA
    # cannot hoist any source out of the scan. Alongside, a sum-of-parts
    # model: Σ of the per-op bench_ops rows for its stages (from the
    # committed BENCHOPS table artifact, same chip/protocol), with
    # elementwise mixes counted per plane. Parts are measured STANDALONE
    # (each pays its own HBM round trip), so fused ≤ sum is the expected
    # direction; flagship_vs_sum_of_parts > 1.5 would flag a pathological
    # interaction (VMEM pressure splitting fusions). ---
    if backend == "tpu":
        from __graft_entry__ import _flagship

        def _benchops_rows(canvas):
            rows = {}
            try:
                path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                    "BENCHOPS_r05.jsonl")
                with open(path) as f:
                    for line in f:
                        r = json.loads(line)
                        if r.get("canvas") == canvas and r.get("ms"):
                            rows[r["op"]] = r["ms"]
            except OSError:
                pass
            return rows

        for fcanvas, fn1, fn2 in ((2048, 4, 16), (4096, 2, 8)):
            fgraph, finputs, fout = _flagship(fcanvas)
            fprog = CompiledGraph(fgraph, targets=[(fout, SlotId(0))])
            for fi, node in enumerate(finputs):
                fprog.bind_input(
                    node, [_device_random((fcanvas, fcanvas), seed=200 + fi)]
                )
            fout_key = (fout, SlotId(0))
            fin0 = f"input_{int(finputs[0])}"
            src_keys = sorted(
                k for k in fprog._bindings
                if k.startswith(("noise_", "pattern_", "voronoi_", "ramp_"))
            )

            def flagship_body(c, bindings, _p=fprog, _in0=fin0,
                              _srcs=src_keys, _out=fout_key):
                b = dict(bindings)
                ci = c.astype(jnp.int32)
                b[_in0] = (jnp.roll(bindings[_in0][0], ci, axis=0),)
                for k in _srcs:
                    sb = dict(bindings[k])
                    if k.startswith("noise_"):
                        sb["persistence"] = sb["persistence"] + c * jnp.float32(1e-4)
                    elif k.startswith("pattern_"):
                        sb["seed"] = sb["seed"] + c.astype(jnp.uint32)
                    elif k.startswith("voronoi_"):
                        sb["jitter"] = (sb["jitter"] + c * jnp.float32(1e-4)) % 1.0
                    else:  # ramp_
                        sb["k"] = sb["k"] * (1.0 + c * jnp.float32(1e-5))
                    b[k] = sb
                return _p._raw_fn(b)[_out]

            fbench = _ScanBench(
                flagship_body, dict(fprog._bindings), n1=fn1, n2=fn2,
                base=0.0, step=1.0,
            )
            flag_s, flag_ok = fbench.run(repeats=3)
            distinct &= flag_ok
            tag = "4k" if fcanvas == 4096 else str(fcanvas)
            extras[f"flagship_{tag}_ms"] = round(flag_s * 1e3, 3)
            extras[f"flagship_{tag}_checksums_distinct"] = flag_ok

            # sum-of-parts: count the graph's Mix nodes; RGBA ones (those
            # BETWEEN the CombineRgba and the SeparateRgba — the bounded
            # chain's per-channel mixes are GRAY) weigh 3× the gray mix
            # row's traffic
            from kanter_core_tpu.node import NodeTypeKind as _K

            sep = next(
                n.node_id for n in fgraph.nodes
                if n.node_type.kind == _K.SEPARATE_RGBA
            )
            comb = next(
                n.node_id for n in fgraph.nodes
                if n.node_type.kind == _K.COMBINE_RGBA
            )
            ancestors, frontier = {sep}, [sep]
            while frontier:
                for p in fgraph.get_parents(frontier.pop()):
                    if p not in ancestors:
                        ancestors.add(p)
                        frontier.append(p)
            descendants = set(fgraph.get_children_recursive(comb))
            n_mix_rgba = n_mix_gray = 0
            for n in fgraph.nodes:
                if n.node_type.kind != _K.MIX:
                    continue
                if n.node_id in ancestors and n.node_id in descendants:
                    n_mix_rgba += 1
                else:
                    n_mix_gray += 1
            rows = _benchops_rows(fcanvas)
            # each part lists fallbacks (first available wins): blur_s1 is
            # below the noise floor at 2048 — σ=5 is the conservative
            # stand-in there
            part_names = [
                ("distance_jfa",), ("voronoi_cellular",),
                ("ambient_occlusion_r2",), ("warp_pallas",),
                ("blur_s1", "blur_s5"), ("h2n",), ("hsv_rgba",),
                ("curvature",), ("noise_fbm4",), ("pattern_brick",),
                ("ramp_radial",),
            ]
            picked = [
                next((rows[n] for n in alts if n in rows), None)
                for alts in part_names
            ]
            if all(v is not None for v in picked) and "mix_add" in rows:
                sum_parts = sum(picked)
                sum_parts += rows["mix_add"] * (n_mix_gray + 3 * n_mix_rgba)
                extras[f"flagship_{tag}_sum_of_parts_ms"] = round(sum_parts, 3)
                extras[f"flagship_{tag}_vs_sum_of_parts"] = round(
                    flag_s * 1e3 / sum_parts, 3
                )
            del fbench, fprog, flagship_body, fgraph

    # --- config 5 AT SPEC: BATCH×BATCH_CANVAS² (default 16×4096²) batched
    # re-eval. Inputs 4×16×4k² f32 = 4.3 GB + outputs 4.3 GB fit a 16 GB
    # chip; if this backend OOMs, halve the canvas and SAY SO. ---
    # release the 4k planes before the 4.3 GB stage — including the
    # CLOSURES (chain_body holds prog; a del of the prog name alone keeps
    # every bound plane alive through the cell) and the interactive stage's
    # device temps
    del chain, prog, chain16, prog16, chain_body, chain16_body
    del base0, rolled, r, chks, warm_chk

    # per-shape roofline for config 5: achievable pointwise bandwidth at the
    # batched stage's 1 GB buffers is measurably LOWER than at 64 MB planes
    # (measured ~667 vs ~800 GB/s on this chip) — batched_implied_gbps must
    # be read against THIS calibration, not the small-plane roofline (the
    # r2 "20% below roofline" gap was exactly this artifact).
    cal = tuple(
        _device_random((BATCH, BATCH_CANVAS, BATCH_CANVAS), seed=60 + i)
        for i in range(3)
    )
    # n1=8/n2=32: at ~10 ms/iter the two-length difference must sit well
    # above the ~30 ms RTT jitter (CLAUDE.md measured a 14 ms artifact at
    # n1=2,n2=8)
    calb = _ScanBench(lambda c, ps: tuple(p * c for p in ps), cal, n1=8, n2=32)
    cal_s, cal_ok = calb.run(repeats=3)
    roofline_batched = 2 * 3 * BATCH * BATCH_CANVAS * BATCH_CANVAS * 4 / cal_s / 1e9
    distinct &= cal_ok
    extras["roofline_batched_gbps"] = round(roofline_batched, 1)
    del cal, calb

    batch_canvas = BATCH_CANVAS
    bgraph, binputs, bwhite, bout = bounded_chain_graph(depth=16)
    bwhite_key = f"value_{int(bwhite)}"
    bout_key = (bout, SlotId(0))
    bprog = CompiledGraph(bgraph, targets=[(bout, SlotId(0))])
    while True:
        try:
            bound = dict(bprog._bindings)
            for bi, node in enumerate(binputs):
                bound[f"input_{int(node)}"] = (
                    _device_random((BATCH, batch_canvas, batch_canvas), seed=100 + bi),
                )
            batch_axes = {
                k: (0,) if k.startswith("input_") else None for k in bound
            }

            def batched_body(val, bindings):
                args = dict(bindings)
                args[bwhite_key] = val
                out_planes = jax.vmap(bprog._raw_fn, in_axes=(batch_axes,))(args)
                return out_planes[bout_key]

            bbench = _ScanBench(batched_body, bound, n1=8, n2=32, base=0.955)
            batched_s, ok = bbench.run(repeats=3)
            distinct &= ok
            extras["batched_checksums_distinct"] = ok
            break
        except Exception as e:  # noqa: BLE001 — XLA OOM surfaces as RuntimeError
            if "RESOURCE_EXHAUSTED" not in str(e) and "Out of memory" not in str(e):
                raise
            extras["batched_oom_at"] = batch_canvas
            batch_canvas //= 2
            if batch_canvas < 512:
                raise
    batched_raw_gpix = BATCH * batch_canvas * batch_canvas / batched_s / 1e9
    extras["batched_canvas"] = batch_canvas
    extras["batched_reeval_device_ms"] = round(batched_s * 1e3, 3)
    extras["batched_raw_gpix_s"] = round(batched_raw_gpix, 2)
    batched_gbps = 6 * BATCH * batch_canvas * batch_canvas * 4 / batched_s / 1e9
    extras["batched_implied_gbps"] = round(batched_gbps, 1)
    extras["batched_of_batched_roofline"] = round(batched_gbps / roofline_batched, 3)

    # --- config 4 eviction clause: the SAME 64-node chain through the live
    # engine with a device tier too small for the chain's ~(CHAIN+1) gray
    # planes, so the PlaneBufferQueue must spill to host MID-RUN. Wall time
    # includes those device→host transfers (over the tunnel, here); the
    # bytes_host metric proves eviction actually happened. ---
    # bbench._consts pins the 4.3 GB input set and batched_body holds
    # bprog — release them all or the eviction stage runs with ~4.3 GB
    # less headroom than designed
    del bprog, bound, bbench, batched_body
    # Default 4096 = BASELINE config 4 AT SPEC. Two-phase pipelined eviction
    # (transient_buffer.begin_evict) overlaps the device→host copies and no
    # longer blocks the render: r2's serial loop took 77-346 s, the pipelined
    # pass ~70 s, and now the render itself completes in ~10 s with the spill
    # draining in the background (checksum 1548799557 across all three).
    # Override with KANTER_BENCH_EVICT_CANVAS=2048 if tunnel stalls blow the
    # budget.
    evict_canvas = int(os.environ.get("KANTER_BENCH_EVICT_CANVAS", "4096"))
    evict_threshold = int(
        os.environ.get("KANTER_BENCH_EVICT_THRESHOLD", str(4 * evict_canvas * evict_canvas))
    )  # default: ONE gray plane — every further commit forces eviction
    # clamp to >=1 (ADVICE r4): 0 reps left `checksums`/`metrics` unbound
    # and crashed the benchmark instead of skipping the stage
    evict_reps = max(1, int(os.environ.get("KANTER_BENCH_EVICT_REPS", "3")))
    from kanter_core_tpu import SlotData, SlotImage, TextureProcessor

    # Tunnel transfer-rate calibration row (VERDICT r3 weak #3): the
    # eviction wall is dominated by device→host copies OVER THE TUNNEL,
    # whose rate swings ~10× run to run — a same-run fetch calibration
    # makes each rep's wall interpretable as (bytes moved / tunnel rate),
    # so the artifact records a rate-normalized quantity, not a raw sample
    # of tunnel weather.
    fetch_s = []
    for rep in range(3):
        # a FRESH plane per rep: the tunnel caches repeated fetches of the
        # same buffer (a first cut re-fetched one plane and measured a
        # fictional 831 GB/s "tunnel" on the cached reps)
        fetch_plane = _device_random((4096, 4096), seed=77 + rep)
        t0 = time.perf_counter()
        np.asarray(fetch_plane)
        fetch_s.append(time.perf_counter() - t0)
        del fetch_plane
    extras["tunnel_fetch_gbps"] = round(
        4096 * 4096 * 4 / float(np.median(fetch_s)) / 1e9, 3
    )

    # ≥3 reps, median + spread (VERDICT r3 weak #3: r2/r3 recorded single
    # samples of a ~10×-variance quantity). Inputs vary per rep (the
    # tunnel dedups identical dispatches). The drain metric is measured
    # from the state at render end: `drain_start_bytes_device` records how
    # much was still undrained — when render-path eviction already reached
    # the watermark the drain wall is reported as None (not a vacuous
    # 0.001), otherwise it times draining that REAL backlog.
    rng = np.random.default_rng(5)
    evict_walls, drain_walls, drain_starts, host_bytes, checksums = [], [], [], [], []
    for rep in range(evict_reps):
        tp = TextureProcessor(evict_threshold)
        try:
            lg = tp.new_live_graph()
            egraph, einputs, _ewhite, eout = bounded_chain_graph(depth=CHAIN)
            with lg.write() as g:
                g.set_node_graph(egraph)
                for node in einputs:
                    g.add_input_slot_data(
                        SlotData(
                            node,
                            SlotId(0),
                            SlotImage.Gray(
                                rng.random((evict_canvas, evict_canvas), np.float32)
                            ),
                        )
                    )
            t0 = time.perf_counter()
            pixels = TextureProcessor.buffer_rgba(lg, eout, SlotId(0))
            evict_walls.append(time.perf_counter() - t0)
            # Eviction is ASYNC (two-phase manager daemon): the render
            # returns while device→host copies may still be draining, and
            # shutdown_now abandons whatever is left — so wait for the
            # watermark before reading tier bytes, else bytes_host
            # undercounts (a pre-fix run read 64 MB where the drained
            # figure is ~870 MB). The drain is background work overlapping
            # further edits on a live deployment, hence reported
            # separately from the render wall.
            start_bytes = int(tp.metrics()["bytes_device"])
            drain_starts.append(start_bytes)
            t0 = time.perf_counter()
            deadline = t0 + 240.0
            while (
                tp.metrics()["bytes_device"] > evict_threshold
                and time.perf_counter() < deadline
            ):
                time.sleep(0.2)
            drain_walls.append(
                round(time.perf_counter() - t0, 3)
                if start_bytes > evict_threshold
                else None
            )
            metrics = tp.metrics()
            host_bytes.append(int(metrics["bytes_host"]))
            checksums.append(
                int(np.asarray(pixels, dtype=np.uint64).sum() % (1 << 32))
            )
        finally:
            tp.shutdown_now()
    extras["evict_canvas"] = evict_canvas
    extras["evict_threshold_bytes"] = evict_threshold
    extras["evict_reps"] = evict_reps
    extras["evict_wall_s"] = round(float(np.median(evict_walls)), 3)
    extras["evict_wall_s_all"] = [round(w, 3) for w in evict_walls]
    extras["evict_wall_s_spread"] = round(
        float(max(evict_walls) - min(evict_walls)), 3
    )
    extras["evict_drain_wall_s_all"] = drain_walls
    extras["evict_drain_start_bytes_device"] = drain_starts
    extras["evict_drained_to_watermark"] = bool(
        metrics["bytes_device"] <= evict_threshold
    )
    extras["evict_bytes_host"] = int(np.median(host_bytes))
    extras["evict_happened"] = bool(min(host_bytes) > 0)
    # all reps render DIFFERENT inputs → all checksums must differ (the
    # same honesty contract as every scan stage)
    extras["evict_checksums_distinct"] = len(set(checksums)) == len(checksums)
    extras["evict_px_checksum"] = checksums[-1]

    print(
        json.dumps(
            {
                "metric": f"fused {CHAIN}-node chain @ {CANVAS}^2 RGBA, {backend} ({jax.device_count()} dev), raw output throughput",
                "value": round(raw_gpix_s, 3),
                "unit": "Gpixel/s/chip (output pixels / s)",
                "vs_baseline": round(raw_gpix_s / TARGET_PER_CHIP_GPIX, 3),
                "incremental_p50_ms": round(incremental_p50_ms, 3),
                "checksums_distinct": distinct,
                **extras,
            }
        )
    )


if __name__ == "__main__":
    try:
        main()
    except RuntimeError as e:
        # the axon tunnel goes DOWN for hours at a time (backend init
        # raises UNAVAILABLE) — keep the one-JSON-line contract with an
        # honest failure record instead of a stack trace the driver
        # cannot parse
        if "UNAVAILABLE" not in str(e) and "Unable to initialize backend" not in str(e):
            raise
        print(
            json.dumps(
                {
                    "metric": "fused chain throughput",
                    "value": 0.0,
                    "unit": "Gpixel/s/chip",
                    "vs_baseline": 0.0,
                    "error": f"TPU backend unavailable (tunnel outage): {e}",
                }
            )
        )
    # Belt and braces for the driver: the JSON line above IS the result. The
    # remote-TPU client has aborted the process at interpreter teardown
    # before ("FATAL: exception not rethrown" unwinding a daemon thread
    # through C++) — the library now shuts its daemons down cleanly
    # (texture_processor.shutdown_now + transient_buffer shutdown guards),
    # but a tunnel stall at exit must not turn a completed benchmark into a
    # non-zero exit code.
    import sys

    sys.stdout.flush()
    sys.stderr.flush()
    os._exit(0)
