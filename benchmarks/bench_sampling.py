"""Sampling throughput benchmark (reference ``benchmarks/benchmarks/api/``
+ GraphBolt sampling benchmarks): seeds/s for the native fixed-shape
sampler and the full padded-MFG block build."""
import argparse
import json
import time

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--num-nodes", type=int, default=1_000_000)
    p.add_argument("--num-edges", type=int, default=10_000_000)
    p.add_argument("--batch-size", type=int, default=1024)
    p.add_argument("--fanouts", type=int, nargs="+", default=[10, 10])
    args = p.parse_args()

    import dgl_tpu as dgl
    from dgl_tpu import _native, dataloading
    from dgl_tpu.sampling import sample_neighbors_fixed

    rng = np.random.default_rng(0)
    N, E = args.num_nodes, args.num_edges
    t0 = time.perf_counter()
    g = dgl.graph((rng.integers(0, N, E), rng.integers(0, N, E)), num_nodes=N)
    build_s = time.perf_counter() - t0
    print(
        json.dumps(
            {"bench": "graph_build", "num_edges": E, "s": round(build_s, 3),
             "native": _native.available()}
        ),
        flush=True,
    )

    seeds = rng.integers(0, N, args.batch_size * 20)
    t0 = time.perf_counter()
    for lo in range(0, seeds.shape[0], args.batch_size):
        sample_neighbors_fixed(
            g, seeds[lo : lo + args.batch_size], args.fanouts[0], seed=lo
        )
    dt = time.perf_counter() - t0
    print(
        json.dumps(
            {
                "bench": "sample_neighbors_fixed",
                "fanout": args.fanouts[0],
                "seeds_per_s": round(seeds.shape[0] / dt),
            }
        ),
        flush=True,
    )

    sampler = dataloading.FixedShapeNeighborSampler(
        args.fanouts, batch_size=args.batch_size, seed=0
    )
    batches = 10
    t0 = time.perf_counter()
    for i in range(batches):
        sampler.sample_blocks(
            g, seeds[i * args.batch_size : (i + 1) * args.batch_size]
        )
    dt = time.perf_counter() - t0
    print(
        json.dumps(
            {
                "bench": "padded_mfg_build",
                "fanouts": args.fanouts,
                "batch_size": args.batch_size,
                "batches_per_s": round(batches / dt, 2),
                "seeds_per_s": round(batches * args.batch_size / dt),
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
