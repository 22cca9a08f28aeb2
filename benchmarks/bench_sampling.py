"""Sampling throughput benchmark (reference ``benchmarks/benchmarks/api/``
+ GraphBolt sampling benchmarks): seeds/s for the native fixed-shape
sampler and the full padded-MFG block build."""
import jax
jax.config.update("jax_platforms", "cpu")  # host-side sampling benchmark
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
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

    # weighted (prob) sampling: native OpenMP E-S reservoir vs the numpy
    # per-row loop (the pre-round-2 fallback path)
    g.edata["p"] = rng.random(E).astype(np.float32)
    prob_seeds = seeds[: args.batch_size * 4]
    t0 = time.perf_counter()
    for lo in range(0, prob_seeds.shape[0], args.batch_size):
        sample_neighbors_fixed(
            g, prob_seeds[lo : lo + args.batch_size], args.fanouts[0],
            prob="p", seed=lo,
        )
    dt_native = time.perf_counter() - t0
    import os

    os.environ["DGL_TPU_NO_NATIVE"] = "1"
    import dgl_tpu._native as nat

    nat._LIB, nat._TRIED = None, True  # force the numpy fallback
    t0 = time.perf_counter()
    for lo in range(0, prob_seeds.shape[0], args.batch_size):
        sample_neighbors_fixed(
            g, prob_seeds[lo : lo + args.batch_size], args.fanouts[0],
            prob="p", seed=lo,
        )
    dt_numpy = time.perf_counter() - t0
    nat._TRIED = False
    os.environ.pop("DGL_TPU_NO_NATIVE")
    print(
        json.dumps(
            {
                "bench": "sample_neighbors_prob",
                "fanout": args.fanouts[0],
                "seeds_per_s_native": round(prob_seeds.shape[0] / dt_native),
                "seeds_per_s_numpy": round(prob_seeds.shape[0] / dt_numpy),
                "speedup": round(dt_numpy / dt_native, 1),
            }
        ),
        flush=True,
    )


def bench_worker_scaling():
    """Threaded sampler-worker scaling (ROADMAP item 4: input-pipeline
    throughput): SamplePerLayer over a FusedCSCSamplingGraph, serial vs
    MultiprocessingWrapper(num_workers). The pick kernels are numpy/
    native (GIL-releasing), so thread workers overlap."""
    import numpy as np

    import dgl_tpu
    from dgl_tpu import graphbolt as gb

    rng = np.random.default_rng(0)
    N, E = 200_000, 2_000_000
    g = dgl_tpu.graph(
        (rng.integers(0, N, E), rng.integers(0, N, E)), num_nodes=N
    )
    fused = gb.from_dglgraph(g)
    seeds = np.arange(100_000)

    def pipe():
        src = gb.ItemSampler(gb.ItemSet(seeds, "seeds"), batch_size=1024)
        return gb.SamplePerLayer(src, fused, fanout=10, seed=0)

    t0 = time.perf_counter()
    n_serial = sum(1 for _ in pipe())
    dt_serial = time.perf_counter() - t0
    out = {"bench": "sampler_worker_scaling", "batches": n_serial,
           "serial_s": round(dt_serial, 3)}
    for w in (2, 4):
        t0 = time.perf_counter()
        n = sum(1 for _ in gb.MultiprocessingWrapper(pipe(), num_workers=w))
        dt = time.perf_counter() - t0
        assert n == n_serial
        out[f"workers{w}_s"] = round(dt, 3)
        out[f"workers{w}_speedup"] = round(dt_serial / dt, 2)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
    bench_worker_scaling()
