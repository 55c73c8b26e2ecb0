"""Run the golden battery on the CURRENT default backend (the real TPU when
run plainly) and report per-golden bit-exactness, then (off-CPU) an f32-PLANE
determinism section comparing production kernels against XLA:CPU production
kernels run in a subprocess.

Expected result on TPU: 17/17 goldens bit-exact (ops/exact_math.py corrects
TPU div/sqrt/pow rounding; the last three rows re-run goldens through the
blockwise tiled engine paths — fused partitions and the per-node
auto_update path — with `tile_bytes=1`), and every determinism row OK — the only allowed
f32-level difference is mix POW, where glibc powf itself misrounds ~48 of
the 65536 u8-grid points (ds_pow returns the correctly-rounded value; u8
export absorbs all of them). See DESIGN.md §7.

Run: python scripts/tpu_parity.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
from PIL import Image

import jax

if os.environ.get("KANTER_FORCE_CPU"):
    jax.config.update("jax_platforms", "cpu")

from kanter_core_tpu import (
    MixType,
    Node,
    NodeGraph,
    NodeType,
    ResizePolicy,
    Size,
    SlotId,
    TextureProcessor,
)

DATA = "/root/reference/data"
GOLD = os.path.join(DATA, "test_compare")


def main(goldens_only: bool = False):
    print(f"backend: {jax.default_backend()}")
    tp = TextureProcessor(1 << 62)
    results = []

    def check(name, lg, out, label=None):
        from kanter_core_tpu import TextureProcessor as TP

        label = label or name
        data = TP.buffer_rgba(lg, out, SlotId(0))
        gold = np.asarray(Image.open(os.path.join(GOLD, name)), dtype=np.uint8)
        same = np.array_equal(data.reshape(gold.shape), gold)
        diff = 0 if same else int((data.reshape(gold.shape) != gold).sum())
        results.append((label, same, diff, gold.size))
        print(f"{'OK ' if same else 'DIFF'} {label}" + ("" if same else f"  ({diff}/{gold.size} bytes)"))

    for mt, gray_name, rgba_name in [
        (MixType.ADD, "add_node_gray.png", "add_node_rgba.png"),
        (MixType.SUBTRACT, "subtract_node_gray.png", "subtract_node_rgba.png"),
        (MixType.MULTIPLY, "multiply_node_gray.png", "multiply_node_rgba.png"),
        (MixType.DIVIDE, "divide_node_gray.png", "divide_node_rgba.png"),
        (MixType.POW, "pow_node_gray.png", "pow_node_rgba.png"),
    ]:
        lg = tp.new_live_graph()
        with lg.write() as g:
            img = g.add_node(Node(NodeType.Image(os.path.join(DATA, "image_2.png"))))
            sep = g.add_node(Node(NodeType.SeparateRgba()))
            mix = g.add_node(Node(NodeType.Mix(mt)))
            out = g.add_node(Node(NodeType.OutputGray("out")))
            g.connect(img, sep, SlotId(0), SlotId(0))
            g.connect(sep, mix, SlotId(0), SlotId(0))
            g.connect(sep, mix, SlotId(1), SlotId(1))
            g.connect(mix, out, SlotId(0), SlotId(0))
        check(gray_name, lg, out)

        lg = tp.new_live_graph()
        with lg.write() as g:
            i1 = g.add_node(Node(NodeType.Image(os.path.join(DATA, "image_1.png"))))
            i2 = g.add_node(Node(NodeType.Image(os.path.join(DATA, "image_2.png"))))
            mix = g.add_node(Node(NodeType.Mix(mt)))
            out = g.add_node(Node(NodeType.OutputRgba("out")))
            g.connect(i1, mix, SlotId(0), SlotId(0))
            g.connect(i2, mix, SlotId(0), SlotId(1))
            g.connect(mix, out, SlotId(0), SlotId(0))
        check(rgba_name, lg, out)

    # invert graph (nested)
    ig = NodeGraph.from_path(os.path.join(DATA, "invert_graph.json"))
    lg = tp.new_live_graph()
    with lg.write() as g:
        img = g.add_node(Node(NodeType.Image(os.path.join(DATA, "image_2.png"))))
        sep = g.add_node(Node(NodeType.SeparateRgba()))
        gn = g.add_node(Node(NodeType.Graph(ig)))
        out = g.add_node(Node(NodeType.OutputGray("out")))
        g.connect(img, sep, SlotId(0), SlotId(0))
        g.connect(sep, gn, SlotId(0), ig.input_slot_id_with_name("in"))
        g.connect(gn, out, ig.output_slot_id_with_name("out"), SlotId(0))
    check("invert_graph_node_import.png", lg, out)

    # height-to-normal (wrap stencil)
    lg = tp.new_live_graph()
    with lg.write() as g:
        img = g.add_node(Node(NodeType.Image(os.path.join(DATA, "clouds.png"))))
        sep = g.add_node(Node(NodeType.SeparateRgba()))
        h2n = g.add_node(Node(NodeType.HeightToNormal()))
        out = g.add_node(Node(NodeType.OutputRgba("out")))
        g.connect(img, sep, SlotId(0), SlotId(0))
        g.connect(sep, h2n, SlotId(0), SlotId(0))
        g.connect(h2n, out, SlotId(0), SlotId(0))
    check("height_to_normal_node.png", lg, out)

    # resampler (110² → 128² Triangle)
    lg = tp.new_live_graph()
    with lg.write() as g:
        i1 = g.add_node(Node(NodeType.Image(os.path.join(DATA, "heart_128.png"))))
        i2 = g.add_node(Node(NodeType.Image(os.path.join(DATA, "heart_110.png"))))
        mix = g.add_node(Node(NodeType.Mix()))
        out = g.add_node(Node(NodeType.OutputRgba("out")))
        g.connect(i1, mix, SlotId(0), SlotId(0))
        g.connect(i2, mix, SlotId(0), SlotId(1))
        g.connect(mix, out, SlotId(0), SlotId(0))
    check("irregular_sizes.png", lg, out)

    # value upscale
    lg = tp.new_live_graph()
    with lg.write() as g:
        vals = [g.add_node(Node(NodeType.Value(v))) for v in (0.0, 0.33, 0.66, 1.0)]
        comb = Node(NodeType.CombineRgba())
        comb.resize_policy = ResizePolicy.SpecificSize(Size(256, 256))
        comb = g.add_node(comb)
        for i, v in enumerate(vals):
            g.connect(v, comb, SlotId(0), SlotId(i))
    check("value_node.png", lg, out=comb)

    tp.shutdown_now()

    # tiled engine path (tile_bytes=1 forces row-band evaluation of every
    # partition): same goldens, bands on the REAL device — proves the
    # blockwise path's halo gathers and banded twins are bit-exact on chip,
    # not just on the CPU test backend (tests/test_tiled.py)
    tp = TextureProcessor(1 << 62, tile_bytes=1)
    lg = tp.new_live_graph()
    with lg.write() as g:
        img = g.add_node(Node(NodeType.Image(os.path.join(DATA, "clouds.png"))))
        sep = g.add_node(Node(NodeType.SeparateRgba()))
        h2n = g.add_node(Node(NodeType.HeightToNormal()))
        out = g.add_node(Node(NodeType.OutputRgba("out")))
        g.connect(img, sep, SlotId(0), SlotId(0))
        g.connect(sep, h2n, SlotId(0), SlotId(0))
        g.connect(h2n, out, SlotId(0), SlotId(0))
    check("height_to_normal_node.png", lg, out, label="height_to_normal_node.png (tiled)")

    lg = tp.new_live_graph()
    with lg.write() as g:
        i1 = g.add_node(Node(NodeType.Image(os.path.join(DATA, "heart_128.png"))))
        i2 = g.add_node(Node(NodeType.Image(os.path.join(DATA, "heart_110.png"))))
        mix = g.add_node(Node(NodeType.Mix()))
        out = g.add_node(Node(NodeType.OutputRgba("out")))
        g.connect(i1, mix, SlotId(0), SlotId(0))
        g.connect(i2, mix, SlotId(0), SlotId(1))
        g.connect(mix, out, SlotId(0), SlotId(0))
    check("irregular_sizes.png", lg, out, label="irregular_sizes.png (tiled)")

    # per-node path (auto_update) with the tile budget: oversized single
    # nodes evaluate row-banded on the REAL device
    lg = tp.new_live_graph()
    with lg.write() as g:
        g.auto_update = True
        img = g.add_node(Node(NodeType.Image(os.path.join(DATA, "clouds.png"))))
        sep = g.add_node(Node(NodeType.SeparateRgba()))
        h2n = g.add_node(Node(NodeType.HeightToNormal()))
        out = g.add_node(Node(NodeType.OutputRgba("out")))
        g.connect(img, sep, SlotId(0), SlotId(0))
        g.connect(sep, h2n, SlotId(0), SlotId(0))
        g.connect(h2n, out, SlotId(0), SlotId(0))
    check(
        "height_to_normal_node.png", lg, out,
        label="height_to_normal_node.png (per-node tiled, auto_update)",
    )
    tp.shutdown_now()

    passed = sum(1 for _, same, _, _ in results if same)
    print(f"\n{passed}/{len(results)} goldens bit-exact on {jax.default_backend()}")

    if jax.default_backend() != "cpu" and not goldens_only:
        f32_determinism()


def _determinism_kernels():
    """(name, fn, known_diffs) — fn is jitted on the PROCESS default backend
    so each side runs its production gate (exact_math off-CPU, plain on CPU)."""
    from kanter_core_tpu import Size
    from kanter_core_tpu.node import MixType, ResizeFilter
    from kanter_core_tpu.ops.height_to_normal import _h2n_jnp
    from kanter_core_tpu.ops.mix import _gray_kernel
    from kanter_core_tpu.ops.resize import resample_plane

    grid = np.arange(256, dtype=np.float32) / np.float32(255.0)
    A = np.tile(grid[:, None], (1, 256))
    B = np.tile(grid[None, :], (256, 1))
    rng = np.random.default_rng(0)
    h = rng.integers(0, 256, (512, 512)).astype(np.float32) / np.float32(255.0)
    src = rng.integers(0, 256, (173, 211)).astype(np.float32) / np.float32(255.0)

    cases = []
    for mt in MixType:
        # POW: TPU runs ds_pow (correctly rounded); CPU runs glibc powf,
        # which misrounds ~48/65536 grid points (u8 export absorbs all)
        cases.append(
            (f"mix_{mt.name}", lambda mt=mt: _gray_kernel(mt)(A, B),
             60 if mt == MixType.POW else 0)
        )
    cases.append(("height_to_normal", lambda: jax.jit(_h2n_jnp)(h), 0))
    from kanter_core_tpu.ops.blur import blur_plane

    cases.append(
        ("blur_sigma2.2", lambda: jax.jit(lambda x: blur_plane(x, 2.2))(src), 0)
    )
    # lane-aligned width so the TPU side actually takes the Mosaic kernel
    # (the 211-wide row above gates to jnp on every backend); the CPU ref
    # side still runs jnp — this is the kernel-vs-jnp cross-backend proof
    src_al = rng.integers(0, 256, (160, 256)).astype(np.float32) / np.float32(255.0)
    cases.append(
        ("blur_pallas_aligned", lambda: jax.jit(lambda x: blur_plane(x, 2.2))(src_al), 0)
    )

    def _sharded_blur():
        from jax.sharding import Mesh

        mesh = Mesh(np.asarray(jax.devices()[:1]), ("rows",))
        return jax.jit(lambda x: blur_plane(x, 2.2, mesh=mesh))(src_al)

    # the shard_map'd kernel (ppermute halo exchange) on a 1-device mesh —
    # re-runs the battery for the NEW formulation per CLAUDE.md's rule
    cases.append(("blur_pallas_sharded", _sharded_blur, 0))

    def _bucketed_row():
        # the shape-bucketed evaluator's data-movement formulations (indexed
        # two-pass resample over padded planes, gathered H2N neighbors with
        # host-computed texel steps, column-gather blur horizontal pass) are
        # NEW formulations around plain-mul tap sums — CLAUDE.md's rule:
        # re-verify on chip. Cross-backend equality here, plus the CPU fuzz
        # (bucketed == dense) and dense CPU==TPU rows, closes the square.
        from kanter_core_tpu.bucketed import BucketedGraph
        from kanter_core_tpu.node import MixType as _MT

        g = NodeGraph()
        gin = g.add_node(Node(NodeType.InputGray("in")))
        val = g.add_node(Node(NodeType.Value(0.7)))
        mix = Node(NodeType.Mix(_MT.MULTIPLY))
        mix.resize_policy = ResizePolicy.SpecificSize(Size(97, 411))
        mix = g.add_node(mix)
        g.connect(gin, mix, SlotId(0), SlotId(0))
        g.connect(val, mix, SlotId(0), SlotId(1))
        h2n = g.add_node(Node(NodeType.HeightToNormal()))
        g.connect(mix, h2n, SlotId(0), SlotId(0))
        bl = g.add_node(Node(NodeType.Blur(1.3)))
        g.connect(h2n, bl, SlotId(0), SlotId(0))
        out_node = g.add_node(Node(NodeType.OutputRgba("out")))
        g.connect(bl, out_node, SlotId(0), SlotId(0))
        bg = BucketedGraph(
            g,
            targets=[(out_node, SlotId(0))],
            bindings={f"input_{int(gin)}": (src,)},
        )
        return tuple(bg()[(out_node, SlotId(0))])

    cases.append(("bucketed_mix_h2n_blur", _bucketed_row, 0))

    def _levels_row():
        from kanter_core_tpu.ops.levels import levels_plane

        params = np.asarray([0.15, 0.85, 2.3, 0.05, 0.95], np.float32)
        return jax.jit(levels_plane)(src, params)

    # Levels routes pow through ds_pow off-CPU: like mix_POW, the only
    # allowed diffs are inputs where glibc powf itself misrounds
    cases.append(("levels_remap", _levels_row, 80))

    def _levels_g1_row():
        from kanter_core_tpu.ops.levels import levels_plane

        params = np.asarray([0.15, 0.85, 1.0, 0.05, 0.95], np.float32)
        return jax.jit(levels_plane)(src, params)

    # identity gamma takes the r5 lax.cond fast path (no pow at all —
    # glibc powf(x,1)==x is special-cased, so the skip is bit-identical
    # on CPU and the off-CPU cond must match EXACTLY: allowance 0)
    cases.append(("levels_identity_gamma", _levels_g1_row, 0))

    def _noise_row():
        from kanter_core_tpu.ops.noise import noise_bindings, noise_plane

        b = noise_bindings((211, 173, 5, 4, 12345, 0.55))
        return jax.jit(noise_plane)(
            b["rows"], b["cols"], b["seed"], b["persistence"],
            b["fx"], b["fy"], b["periods"],
        )

    # FBM value noise: integer-hash lattice is exact everywhere; the float
    # interp path uses nc_mul + the gated div, so 0 diffs expected
    cases.append(("noise_fbm", _noise_row, 0))

    def _pattern_row():
        import jax.numpy as _jnp

        from kanter_core_tpu.ops.pattern import (
            pattern_bindings,
            pattern_planes,
        )

        outs = []
        for kind in ("Checker", "Brick", "Stripe"):
            # non-dyadic frequencies + a runtime bevel divisor: the
            # groove-ramp div is the row's real subject
            b = pattern_bindings((211, 173, kind, 5, 7, 0.18, 0.07, 4242))
            mask, cells = jax.jit(pattern_planes, static_argnums=0)(
                kind, b["rows"], b["cols"], b["fx"], b["fy"],
                b["px"], b["py"], b["mortar"], b["bevel"], b["seed"],
            )
            outs.append(_jnp.concatenate([mask, cells], axis=0))
        return _jnp.concatenate(outs, axis=0)

    # integer-hash lattice exact; products via nc_mul; the one division
    # (groove ramp) has a RUNTIME divisor → corrected_div off-CPU → 0 diffs
    cases.append(("pattern_kinds", _pattern_row, 0))

    def _voronoi_row():
        import jax.numpy as _jnp

        from kanter_core_tpu.ops.voronoi import (
            voronoi_bindings,
            voronoi_planes,
        )

        outs = []
        for cells_x, cells_y, jitter, seed in (
            (5, 7, 0.85, 4242),  # non-dyadic frequencies, jittered points
            (4, 4, 0.0, 17),  # degenerate grid: heavy d² ties at midlines
        ):
            b = voronoi_bindings((211, 173, cells_x, cells_y, jitter, seed))
            distance, borders, cells = jax.jit(voronoi_planes)(
                b["rows"], b["cols"], b["fx"], b["fy"],
                b["px"], b["py"], b["jitter"], b["seed"],
            )
            outs.append(_jnp.concatenate([distance, borders, cells], axis=0))
        return _jnp.concatenate(outs, axis=0)

    # integer-hash lattice exact; d² products via nc_mul, fixed-order
    # select chains (strict < keeps the earliest candidate on ties — the
    # jitter=0 case forces midline ties); sqrt via the backend gate
    # (corrected_sqrt off-CPU) → 0 diffs expected
    cases.append(("voronoi_cellular", _voronoi_row, 0))

    def _ramp_row():
        import jax.numpy as _jnp

        from kanter_core_tpu.ops.ramp import ramp_bindings, ramp_plane

        outs = []
        for kind, angle, cx, cy, scale in (
            ("Linear", 37.5, 0.3, 0.7, 1.4),   # off-axis f64 cos/sin
            ("Linear", 90.0, 0.5, 0.5, 1.0),   # exact quarter-turn table
            ("Radial", 0.0, 0.45, 0.55, 1.2),  # sqrt gate path
            ("Box", 0.0, 0.5, 0.5, 2.0),       # max/abs exact path
        ):
            b = ramp_bindings((211, 173, kind, angle, cx, cy, scale))
            outs.append(jax.jit(ramp_plane, static_argnums=0)(
                kind, b["rows"], b["cols"], b["iw"], b["ih"], b["k"],
            ))
        return _jnp.concatenate(outs, axis=0)

    # nc_mul-guarded products, exact subs/max/clip, Radial's sqrt via the
    # backend gate (corrected_sqrt off-CPU) → 0 diffs expected
    cases.append(("ramp_gradient", _ramp_row, 0))

    def _hsv_row():
        import jax.numpy as _jnp

        from kanter_core_tpu.ops.hsv import hsv_bindings, hsv_planes

        r = src
        g = np.roll(src, 37, axis=0)
        b = np.roll(src, 91, axis=1)
        outs = []
        for params in ((123.4, 0.6, 1.2), (-450.0, 2.0, 0.8)):
            outs.extend(jax.jit(
                lambda pr, a, c, d: hsv_planes([a, c, d], pr)
            )(hsv_bindings(params), r, g, b))
        return _jnp.concatenate(outs, axis=0)

    # hexcone adjust: sector-unit hue (no constant divisors), runtime-
    # divisor divisions via corrected_div off-CPU, exact selects/floor —
    # 0 diffs expected
    cases.append(("hsv_adjust", _hsv_row, 0))

    def _curvature_row():
        from kanter_core_tpu.ops.curvature import curvature_plane

        return jax.jit(curvature_plane)(src, np.float32(7.3))

    # exact ops only: f32 sub/add in fixed association, one nc_mul-guarded
    # product, clip — 0 diffs expected (173 rows / 211 cols also exercise
    # the odd-extent wrap rolls)
    cases.append(("curvature", _curvature_row, 0))

    def _ao_row():
        from kanter_core_tpu.ops.ambient_occlusion import ao_plane

        # pallas_ok=True on purpose: off-chip the width (211, not
        # lane-aligned) routes to the jnp formulation; the dense chip run
        # exercises whatever dispatch a production 211-wide canvas gets
        return jax.jit(
            lambda s, p: ao_plane(p, s, 1.4)
        )(np.float32(3.1), src)

    # three wrap blurs (nc_mul tap sums — Blur's proven-exact class) +
    # exact subtract/max/clip combine with nc_mul-guarded products and
    # constant-MULTIPLY scale weights — 0 diffs expected
    cases.append(("ambient_occlusion", _ao_row, 0))

    def _distance_row():
        from kanter_core_tpu.ops.distance import distance_plane

        mask = (src > 0.82).astype(np.float32)  # sparse seed set
        return jax.jit(
            lambda m, d: distance_plane(m, d)
        )(mask, np.float32(9.0))

    # jump flooding is INTEGER end to end (i32 coords/squared distances,
    # strict-< ties in static offset order); the only f32 ops are the
    # final corrected_sqrt / corrected_div / sub / clip — 0 diffs expected
    cases.append(("distance_jfa", _distance_row, 0))

    def _gradient_row():
        from kanter_core_tpu.ops.gradient import gradient_bindings, gradient_planes

        b = gradient_bindings((
            (0.0, 0.05, 0.1, 0.3, 1.0),
            (0.35, 0.8, 0.5, 0.2, 1.0),
            (0.7, 0.95, 0.9, 0.6, 0.9),
            (1.0, 1.0, 1.0, 1.0, 1.0),
        ))
        return jax.jit(gradient_planes)(src, b["pos"], b["colors"])

    # segment select + lerp: corrected_div (runtime divisors) + nc_mul,
    # so 0 diffs expected
    cases.append(("gradient_map", _gradient_row, 0))

    def _transform_row():
        import numpy as _np

        from kanter_core_tpu.ops.transform import (
            transform_bindings,
            transform_planes,
        )

        b = transform_bindings((7.25, -3.5, 33.0, 1.3, 0.8))
        h, w = src.shape
        out, = jax.jit(transform_planes, static_argnums=(6, 7))(
            (src,),
            _np.arange(h, dtype=_np.int32), _np.arange(w, dtype=_np.int32),
            b["cs"], b["inv_s"], b["off"], h, w,
        )
        return out

    # affine wrap-sample: host-side trig/reciprocals, nc_mul coordinate
    # chain, barriered wrap extents, no in-trace division → 0 diffs
    cases.append(("transform_affine", _transform_row, 0))

    def _warp_row():
        import numpy as _np

        from kanter_core_tpu.ops.warp import warp_bindings, warp_planes

        b = warp_bindings((57.0, 18.5))
        h, w = src.shape
        # a smooth-ish strength field derived from the shared source plane
        strength = _np.asarray(src) * _np.float32(0.9)
        out, = jax.jit(warp_planes, static_argnums=(5, 6))(
            (src,), strength,
            _np.arange(h, dtype=_np.int32), _np.arange(w, dtype=_np.int32),
            b["k"], h, w,
        )
        return out

    # directional displacement through the shared bilinear wrap sampler:
    # same nc_mul/barrier construction as Transform → 0 diffs (strength is
    # clamped to [0,1] by contract — the 0.9-scaled source stays in range,
    # so the clamp is exercised as a pass-through here and as an active
    # bound in the banded row below)
    cases.append(("warp_directional", _warp_row, 0))

    def _warp_mesh_row():
        from jax.sharding import Mesh

        from kanter_core_tpu.ops.warp import (
            warp_bindings, warp_halo, warp_planes_mesh,
        )

        b = warp_bindings((57.0, 18.5))
        h, w = src.shape
        strength = np.asarray(src) * np.float32(0.9)
        mesh = Mesh(np.asarray(jax.devices()[:1]), ("rows",))
        halo = warp_halo(18.5)
        out, = jax.jit(
            lambda ps, st, k: warp_planes_mesh(
                ps, st, k, mesh, "rows", halo, h, w
            )
        )((src,), strength, b["k"])
        return out

    # the shard_map'd warp (ppermute halo exchange + global→local row
    # remap) on a 1-device mesh — re-runs the battery for the NEW
    # formulation per CLAUDE.md's rule, like blur_pallas_sharded
    cases.append(("warp_mesh_sharded", _warp_mesh_row, 0))

    def _warp_banded_row():
        from kanter_core_tpu.ops.warp import (
            warp_bindings, warp_halo, warp_planes,
        )

        b = warp_bindings((301.0, 27.5))  # negative-k quadrant, bucket 16
        h, w = src.shape
        halo = warp_halo(27.5)
        # strength spans the clamp's active range (plateaus beyond [0,1])
        strength = np.asarray(src) * np.float32(1.6) - np.float32(0.3)
        rows = np.arange(40, 48, dtype=np.int32)  # one interior 8-row band
        offs = np.arange(-halo, halo + 1)
        need = np.unique((rows[:, None] + offs[None, :]).ravel() % h)
        lut = np.zeros(h, np.int32)
        lut[need] = np.arange(len(need), dtype=np.int32)
        sub = np.ascontiguousarray(np.asarray(src)[need])

        def f(subp, st, lut_):
            return warp_planes(
                (subp,), st, rows, np.arange(w, dtype=np.int32),
                b["k"], h, w, row_local=lambda y: lut_[y],
            )[0]

        return jax.jit(f)(sub, strength[rows], lut)

    # the tiled band's halo-hoisted formulation (row subset + LUT remap,
    # clamp actively bounding out-of-range strength) — same texels through
    # the same lerp, new data movement → its own chip row
    cases.append(("warp_banded_lut", _warp_banded_row, 0))

    def _warp_pallas_row():
        import numpy as _np

        from kanter_core_tpu.ops.warp import (
            warp_bindings, warp_halo, warp_planes,
        )

        # lane-aligned width so the TPU side takes the Mosaic staircase
        # kernel (ops/pallas_warp.py); the CPU ref side gates to the jnp
        # gather — the kernel-vs-gather cross-backend proof, like
        # blur_pallas_aligned. Strength spans the clamp's active range.
        b = warp_bindings((57.0, 18.5))
        halo = warp_halo(18.5)
        h, w = 160, 256
        rng_ = _np.random.default_rng(9)
        plane = rng_.integers(0, 256, (h, w)).astype(_np.float32) / _np.float32(255)
        strength = rng_.random((h, w), dtype=_np.float32) * _np.float32(1.4) - _np.float32(0.2)

        def f(p, s, k, pairs, npairs):
            return warp_planes(
                (p,), s,
                _np.arange(h, dtype=_np.int32), _np.arange(w, dtype=_np.int32),
                k, h, w, table=(pairs, npairs), halo=halo,
            )[0]

        return jax.jit(f)(plane, strength, b["k"], b["pairs"], b["npairs"])

    cases.append(("warp_pallas_staircase", _warp_pallas_row, 0))

    def _warp_pallas_sharded_row():
        import numpy as _np
        from jax.sharding import Mesh

        from kanter_core_tpu.ops.pallas_warp import _warp_pallas_sharded
        from kanter_core_tpu.ops.warp import warp_bindings, warp_halo

        # the shard_map'd staircase kernel on a 1-device mesh (real Mosaic
        # on chip; the CPU ref side runs it interpret — both against the
        # same exchange + global-row-origin formulation), re-running the
        # battery for the NEW formulation per CLAUDE.md's rule
        b = warp_bindings((57.0, 18.5))
        halo = warp_halo(18.5)
        h, w = 160, 256
        rng_ = _np.random.default_rng(9)
        plane = rng_.integers(0, 256, (h, w)).astype(_np.float32) / _np.float32(255)
        strength = rng_.random((h, w), dtype=_np.float32) * _np.float32(1.4) - _np.float32(0.2)
        mesh = Mesh(np.asarray(jax.devices()[:1]), ("rows",))
        fn = _warp_pallas_sharded(
            halo, int(b["pairs"].shape[0]), mesh,
            jax.default_backend() != "tpu",
        )
        return jax.jit(fn)(plane, strength, b["k"], b["pairs"], b["npairs"])

    cases.append(("warp_pallas_sharded", _warp_pallas_sharded_row, 0))

    def _blend_row():
        import jax.numpy as jnp

        from kanter_core_tpu.node import MixType
        from kanter_core_tpu.ops.mix import _binary

        def chain(a, b):
            d = _binary(MixType.DARKEN)(a, b)
            l = _binary(MixType.LIGHTEN)(a, b)
            s = _binary(MixType.SCREEN)(d, l)
            return _binary(MixType.OVERLAY)(s, _binary(MixType.DIFFERENCE)(a, b))

        return jax.jit(chain)(src, jnp.roll(src, 1, axis=0))

    # extension blend modes composed into one fused chain: min/max/abs are
    # exact, products are nc_mul'd, the only select is Overlay's → 0 diffs
    cases.append(("blend_modes", _blend_row, 0))

    def _wood_row():
        from kanter_core_tpu.compiler import CompiledGraph
        from kanter_core_tpu.models import wood_material_graph

        g = wood_material_graph(size=96)
        targets = [(oid, SlotId(0)) for oid in sorted(g.output_ids(), key=int)]
        res = CompiledGraph(g, targets=targets)()
        return tuple(np.asarray(p) for t in targets for p in res[t])

    # the full procedural-material COMPOSITION through the fused compiler
    # (Noise → Transform → Warp → Levels → GradientMap/Blur/H2N/invert):
    # a new formulation CONTEXT per CLAUDE.md's rule, so it gets its own
    # chip row. Levels gamma routes pow (ds_pow vs glibc powf) and its
    # misrounds can amplify through the downstream gather/stencil consumers
    # — the allowance covers that class only (measured 63 diffs across the
    # 10 output planes on chip; everything else in the chain is
    # nc_mul/exact-op construction)
    cases.append(("wood_material_fused", _wood_row, 100))
    from kanter_core_tpu.slot_image import _jitted_converters

    sweep = (np.arange(65536, dtype=np.float32) / 65535.0).reshape(256, 256)
    cases.append(
        ("srgb_u8_export", lambda: _jitted_converters()["gray_to_u8_srgb"](sweep), 0)
    )

    # inputs drawn EAGERLY (a lazy draw inside the lambda would desync the
    # shared rng between a KANTER_PARITY_ROWS-filtered run and the
    # unfiltered --dump-ref subprocess)
    _mean_rng = np.random.default_rng(77)
    _mr, _mg, _mb = (
        _mean_rng.integers(0, 256, (128, 128)).astype(np.float32) / np.float32(255.0)
        for _ in range(3)
    )
    cases.append(
        (
            # rgba->gray coercion: the /3 routes through the gated corrected
            # div off-CPU so the gray plane's bits match the CPU pipeline
            "rgba_to_gray_mean",
            lambda: _jitted_converters()["rgb_mean"](_mr, _mg, _mb),
            0,
        )
    )
    for filt in ResizeFilter:
        cases.append(
            (f"resample_{filt.name}",
             lambda f=filt: jax.jit(lambda x: resample_plane(x, Size(300, 97), f))(src),
             0)
        )
    return cases


def f32_determinism():
    """Cross-backend f32-PLANE determinism (stricter than u8 goldens): the
    production kernels on this device must match the production kernels on
    XLA:CPU (== the Rust reference's rounding) bit-for-bit. The CPU side
    runs in a subprocess so its backend gates resolve to the CPU paths."""
    import subprocess
    import sys as _sys

    print("\nf32-plane determinism vs XLA:CPU production paths (bit level):")
    subprocess.run(
        [_sys.executable, os.path.abspath(__file__), "--dump-ref", "/tmp/parity_ref.npz"],
        check=True,
        env={**os.environ, "KANTER_FORCE_CPU": "1"},
    )
    ref = np.load("/tmp/parity_ref.npz")
    rows_filter = os.environ.get("KANTER_PARITY_ROWS", "")
    wanted = [r for r in rows_filter.split(",") if r]
    for name, fn, known in _determinism_kernels():
        if wanted and not any(w in name for w in wanted):
            continue
        got = np.stack([np.asarray(p) for p in jax.tree.leaves(fn())])
        r = ref[name]
        if got.dtype.kind == "f":
            bad = (got.view(np.uint32) != r.view(np.uint32)) & ~(
                np.isnan(got) & np.isnan(r)
            )
        else:
            bad = got != r
        n = int(bad.sum())
        tag = "OK " if n <= known else "DIFF"
        extra = f" ({n} f32-bit diffs, {known} known-glibc-misrounds allowed)" if n else ""
        print(f"{tag} {name}{extra}")


def dump_ref(path: str) -> None:
    out = {
        name: np.stack([np.asarray(p) for p in jax.tree.leaves(fn())])
        for name, fn, _ in _determinism_kernels()
    }
    np.savez(path, **out)


if __name__ == "__main__":
    if len(sys.argv) > 2 and sys.argv[1] == "--dump-ref":
        dump_ref(sys.argv[2])
    elif len(sys.argv) > 1 and sys.argv[1] == "--determinism-only":
        # the f32-plane battery alone (the goldens take many tunnel minutes;
        # re-verifying a NEW kernel formulation only needs these rows)
        print(f"backend: {jax.default_backend()}")
        f32_determinism()
    elif len(sys.argv) > 1 and sys.argv[1] == "--goldens-only":
        # the 17-golden battery without the determinism section (each half
        # fits a tunnel-stalled time budget on its own)
        main(goldens_only=True)
    else:
        main()
