"""Run the golden battery on the CURRENT default backend (the real TPU when
run plainly) and report per-golden bit-exactness.

Expected result on TPU: everything passes except divide/pow RGBA cases,
where TPU f32 div/pow differ from glibc by ~1 ulp on a handful of pixels
(see kanter_core_tpu.precision). On CPU all pass.

Run: python scripts/tpu_parity.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
from PIL import Image

import jax

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


def main():
    print(f"backend: {jax.default_backend()}")
    tp = TextureProcessor(1 << 62)
    results = []

    def check(name, lg, out):
        from kanter_core_tpu import TextureProcessor as TP

        data = TP.buffer_rgba(lg, out, SlotId(0))
        gold = np.asarray(Image.open(os.path.join(GOLD, name)), dtype=np.uint8)
        same = np.array_equal(data.reshape(gold.shape), gold)
        diff = 0 if same else int((data.reshape(gold.shape) != gold).sum())
        results.append((name, same, diff, gold.size))
        print(f"{'OK ' if same else 'DIFF'} {name}" + ("" if same else f"  ({diff}/{gold.size} bytes)"))

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

    # height-to-normal (Pallas on TPU)
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

    passed = sum(1 for _, same, _, _ in results if same)
    print(f"\n{passed}/{len(results)} goldens bit-exact on {jax.default_backend()}")
    tp.shutdown_now()


if __name__ == "__main__":
    main()
