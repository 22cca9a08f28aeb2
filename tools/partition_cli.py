#!/usr/bin/env python
"""Offline partitioning CLI (reference ``tools/partition_graph.py`` +
``tools/dispatch_data.py``): partition a saved graph into per-part shards.

Usage:
    python tools/partition_cli.py --graph graph.npz --num-parts 8 \
        --out parts/ [--method metis|random]
"""
import argparse
import json
import sys
import time


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--graph", required=True, help=".npz from dgl.save_graphs")
    p.add_argument("--name", default="graph")
    p.add_argument("--num-parts", type=int, required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--method", default="metis", choices=["metis", "random"])
    p.add_argument("--num-hops", type=int, default=1)
    args = p.parse_args()

    import os
    import sys

    sys.path.insert(
        0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    import jax

    jax.config.update("jax_platforms", "cpu")
    from dgl_tpu.data.serialize import load_graphs
    from dgl_tpu.distributed import partition_graph
    from dgl_tpu.distributed.partition import (
        edge_cut,
        metis_partition_assignment,
        random_partition_assignment,
    )

    graphs, _ = load_graphs(args.graph)
    g = graphs[0]
    print(f"graph: {g.num_nodes()} nodes, {g.num_edges()} edges")
    t0 = time.time()
    partition_graph(
        g, args.name, args.num_parts, args.out,
        part_method=args.method, num_hops=args.num_hops,
    )
    with open(f"{args.out}/{args.name}.json") as f:
        book = json.load(f)
    print(
        f"partitioned into {args.num_parts} parts in {time.time()-t0:.1f}s; "
        f"edge cut {book['edge_cut']} "
        f"({100*book['edge_cut']/max(g.num_edges(),1):.1f}%)"
    )


if __name__ == "__main__":
    main()
