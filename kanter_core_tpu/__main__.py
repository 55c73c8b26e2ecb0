"""Command-line interface: render and inspect graph JSON files.

The reference is a library with no CLI; this gives the standalone framework
a direct way to execute the serde-compatible graph files it shares with the
reference (`data/invert_graph.json` format).

    python -m kanter_core_tpu render graph.json --input in=height.png \\
        --output out=result.png [--value <node_id>=0.5] [--srgb]
    python -m kanter_core_tpu info graph.json
    python -m kanter_core_tpu bench  # one-line JSON benchmark
"""

from __future__ import annotations

import argparse
import sys


def _cmd_info(args) -> int:
    from .node_graph import NodeGraph

    graph = NodeGraph.from_path(args.graph)
    print(f"{args.graph}: {len(graph.nodes)} nodes, {len(graph.edges)} edges")
    for node in graph.nodes:
        print(f"  [{int(node.node_id)}] {node.node_type!r}  "
              f"policy={node.resize_policy.kind.value} filter={node.resize_filter.value}")
    inputs = ", ".join(f"{s.name}#{int(s.slot_id)}" for s in graph.input_slots())
    outputs = ", ".join(f"{s.name}#{int(s.slot_id)}" for s in graph.output_slots())
    print(f"  inputs:  {inputs or '(none)'}")
    print(f"  outputs: {outputs or '(none)'}")
    return 0


def _cmd_render(args) -> int:
    from .ids import NodeId, SlotId
    from .live_graph import LiveGraph, NodeState
    from .node import NodeType, NodeTypeKind
    from .node_graph import NodeGraph
    from .ops.image_io import read_slot_image, save_rgba_png
    from .slot_data import SlotData
    from .texture_processor import TextureProcessor

    graph = NodeGraph.from_path(args.graph)

    with TextureProcessor(
        args.memory_threshold, tile_bytes=args.tile_bytes,
        bucket_sizes=args.bucket_sizes, precision=args.precision,
    ) as tex_pro:
        live_graph = tex_pro.new_live_graph()
        with live_graph.write() as lg:
            lg.set_node_graph(graph)

            for spec in args.input or []:
                name, _, path = spec.partition("=")
                slot = graph.input_slot_id_with_name(name)
                if slot is None:
                    print(f"error: no input named {name!r}", file=sys.stderr)
                    return 2
                image = read_slot_image(path)
                if graph.node(NodeId(int(slot))).node_type.kind.value == "InputGray":
                    image = image.as_type(False)
                lg.add_input_slot_data(SlotData(NodeId(int(slot)), SlotId(0), image))

            for spec in args.levels or []:
                node_id, _, csv = spec.partition("=")
                parts = [float(x) for x in csv.split(",")]
                if len(parts) != 5:
                    print("error: --levels NODE_ID=in_lo,in_hi,gamma,out_lo,out_hi",
                          file=sys.stderr)
                    return 2
                lg.node_graph.set_levels(NodeId(int(node_id)), *parts)
                lg.set_state(NodeId(int(node_id)), NodeState.DIRTY)

            for spec in args.warp or []:
                node_id, _, csv = spec.partition("=")
                parts = [float(x) for x in csv.split(",")]
                if len(parts) != 2:
                    print("error: --warp NODE_ID=angle,intensity",
                          file=sys.stderr)
                    return 2
                lg.set_warp(NodeId(int(node_id)), *parts)

            for spec in args.curvature or []:
                node_id, _, value = spec.partition("=")
                lg.set_curvature(NodeId(int(node_id)), float(value))

            for spec in args.distance or []:
                node_id, _, value = spec.partition("=")
                lg.set_distance(NodeId(int(node_id)), float(value))

            for spec in args.ambient_occlusion or []:
                node_id, _, csv = spec.partition("=")
                parts = [float(x) for x in csv.split(",")]
                if len(parts) != 2:
                    print("error: --ambient-occlusion NODE_ID=strength,radius",
                          file=sys.stderr)
                    return 2
                lg.set_ambient_occlusion(NodeId(int(node_id)), *parts)

            for spec in args.hsv or []:
                node_id, _, csv = spec.partition("=")
                parts = [float(x) for x in csv.split(",")]
                if len(parts) != 3:
                    print("error: --hsv NODE_ID=hue,saturation,value",
                          file=sys.stderr)
                    return 2
                lg.set_hsv(NodeId(int(node_id)), *parts)

            for spec in args.voronoi or []:
                node_id, _, csv = spec.partition("=")
                parts = csv.split(",")
                if len(parts) != 6:
                    print("error: --voronoi NODE_ID=width,height,cells_x,"
                          "cells_y,jitter,seed", file=sys.stderr)
                    return 2
                lg.set_voronoi(
                    NodeId(int(node_id)), int(parts[0]), int(parts[1]),
                    int(parts[2]), int(parts[3]), float(parts[4]),
                    int(parts[5]),
                )

            for spec in args.ramp or []:
                node_id, _, csv = spec.partition("=")
                parts = csv.split(",")
                if len(parts) != 7:
                    print("error: --ramp NODE_ID=width,height,kind,angle,"
                          "cx,cy,scale", file=sys.stderr)
                    return 2
                lg.set_ramp(
                    NodeId(int(node_id)), int(parts[0]), int(parts[1]),
                    parts[2], float(parts[3]), float(parts[4]),
                    float(parts[5]), float(parts[6]),
                )

            for spec in args.transform or []:
                node_id, _, csv = spec.partition("=")
                parts = [float(x) for x in csv.split(",")]
                if len(parts) != 5:
                    print("error: --transform NODE_ID=offset_x,offset_y,"
                          "rotation,scale_x,scale_y", file=sys.stderr)
                    return 2
                lg.set_transform(NodeId(int(node_id)), *parts)

            for spec in args.value or []:
                node_id, _, value = spec.partition("=")
                node = lg.node_mut(NodeId(int(node_id)))
                if node.node_type.kind != NodeTypeKind.VALUE:
                    print(
                        f"error: node {node_id} is {node.node_type.kind.value}, "
                        "not a Value node",
                        file=sys.stderr,
                    )
                    return 2
                node.node_type = NodeType.Value(float(value))

        for spec in args.output or []:
            name, _, path = spec.partition("=")
            slot = graph.output_slot_id_with_name(name)
            if slot is None:
                print(f"error: no output named {name!r}", file=sys.stderr)
                return 2
            node_id = NodeId(int(slot))
            with LiveGraph.await_clean_read(live_graph, node_id) as lg:
                pixels = (
                    lg.buffer_srgba(node_id, SlotId(0))
                    if args.srgb
                    else lg.buffer_rgba(node_id, SlotId(0))
                )
                size = lg.slot_data_size(node_id, SlotId(0))
            save_rgba_png(path, pixels, size)
            print(f"wrote {path} ({size})")
        return 0


def _cmd_bench(_args) -> int:
    import importlib.util
    import os

    spec = importlib.util.spec_from_file_location(
        "kanter_bench",
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "bench.py"),
    )
    module = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(module)
    module.main()
    return 0


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(prog="kanter_core_tpu")
    sub = parser.add_subparsers(dest="command", required=True)

    p_info = sub.add_parser("info", help="describe a graph JSON file")
    p_info.add_argument("graph")
    p_info.set_defaults(fn=_cmd_info)

    p_render = sub.add_parser("render", help="evaluate a graph JSON file")
    p_render.add_argument("graph")
    p_render.add_argument("--input", action="append", metavar="NAME=IMAGE.png")
    p_render.add_argument("--output", action="append", metavar="NAME=OUT.png")
    p_render.add_argument("--value", action="append", metavar="NODE_ID=FLOAT")
    p_render.add_argument(
        "--levels", action="append",
        metavar="NODE_ID=in_lo,in_hi,gamma,out_lo,out_hi",
        help="override a Levels node's parameters",
    )
    p_render.add_argument(
        "--warp", action="append", metavar="NODE_ID=angle,intensity",
        help="override a Warp node's parameters",
    )
    p_render.add_argument(
        "--curvature", action="append", metavar="NODE_ID=strength",
        help="override a Curvature node's strength",
    )
    p_render.add_argument(
        "--hsv", action="append", metavar="NODE_ID=hue,saturation,value",
        help="override an Hsv node's adjust parameters (hue in degrees)",
    )
    p_render.add_argument(
        "--ambient-occlusion", action="append", dest="ambient_occlusion",
        metavar="NODE_ID=strength,radius",
        help="override an AmbientOcclusion node's parameters",
    )
    p_render.add_argument(
        "--distance", action="append", metavar="NODE_ID=max_dist",
        help="override a Distance node's spread (pixels)",
    )
    p_render.add_argument(
        "--voronoi", action="append",
        metavar="NODE_ID=width,height,cells_x,cells_y,jitter,seed",
        help="override a Voronoi node's parameters",
    )
    p_render.add_argument(
        "--ramp", action="append",
        metavar="NODE_ID=width,height,kind,angle,cx,cy,scale",
        help="override a Ramp node's parameters",
    )
    p_render.add_argument(
        "--transform", action="append",
        metavar="NODE_ID=offset_x,offset_y,rotation,scale_x,scale_y",
        help="override a Transform node's placement",
    )
    p_render.add_argument("--srgb", action="store_true", help="export via sRGB conversion")
    p_render.add_argument("--memory-threshold", type=int, default=1 << 31)
    p_render.add_argument(
        "--tile-bytes", type=int, default=None,
        help="device working-set budget: partitions whose dense footprint "
        "exceeds it evaluate in row bands (canvases larger than device "
        "memory render bit-identically; see kanter_core_tpu.tiled)",
    )
    p_render.add_argument(
        "--bucket-sizes", action="store_true",
        help="shape-bucketed sizing: SpecificSize edits recompile once per "
        "size bucket instead of once per pixel size (kanter_core_tpu.bucketed)",
    )
    p_render.add_argument(
        "--precision", choices=["float32", "bfloat16"], default=None,
        help="pipeline storage dtype: float32 (default, bit-exact) or "
        "bfloat16 (bf16 at rest, f32 in flight — half the memory "
        "footprint and transfer bytes, u8 output differs by a few LSB; "
        "DESIGN.md §9)",
    )
    p_render.set_defaults(fn=_cmd_render)

    p_bench = sub.add_parser("bench", help="run the one-line JSON benchmark")
    p_bench.set_defaults(fn=_cmd_bench)

    args = parser.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    raise SystemExit(main())
