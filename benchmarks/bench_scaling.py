"""Scaling-efficiency harness (the BASELINE north star: >=80% edges/s
scaling efficiency 1 -> N shards for partition-parallel training).

Measures the halo-exchange SpMM's edges/s on a 1-device "mesh" vs the full
mesh. On real multi-chip hardware this measures ICI overlap quality; on the
virtual CPU mesh it validates the harness itself. One JSON line per mesh
size.
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import argparse
import json
import time

import numpy as np


def bench_mesh(g, n_dev, feat_dim, iters=5):
    import jax
    import jax.numpy as jnp

    import dgl_tpu.distributed as dist
    from dgl_tpu.distributed.dist_spmm import shard_arrays
    from dgl_tpu.parallel import create_mesh

    devices = jax.devices()[:n_dev]
    mesh = create_mesh((n_dev,), ("gp",), devices=devices)
    parts = (
        dist.metis_partition_assignment(g, n_dev)
        if n_dev > 1
        else np.zeros(g.num_nodes(), np.int64)
    )
    shards = dist.build_shards(g, parts, n_dev)
    tables = shard_arrays(mesh, shards)
    rng = np.random.default_rng(0)
    x = shards.shard_features(
        rng.normal(size=(g.num_nodes(), feat_dim)).astype(np.float32)
    )

    @jax.jit
    def chained(x, k):
        def body(_, h):
            return dist.dist_copy_u_sum(mesh, shards, h, tables=tables) * 1e-3
        return jnp.sum(jax.lax.fori_loop(0, k, body, x))

    float(chained(x, 1))

    def timed(k):
        float(chained(x, k))
        t0 = time.perf_counter()
        float(chained(x, k))
        return time.perf_counter() - t0

    dt = (timed(1 + iters) - timed(1)) / iters
    return dt, shards


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--num-nodes", type=int, default=100_000)
    p.add_argument("--num-edges", type=int, default=1_000_000)
    p.add_argument("--feat", type=int, default=128)
    args = p.parse_args()

    import jax

    import dgl_tpu as dgl

    rng = np.random.default_rng(0)
    g = dgl.graph(
        (rng.integers(0, args.num_nodes, args.num_edges),
         rng.integers(0, args.num_nodes, args.num_edges)),
        num_nodes=args.num_nodes,
    )
    E = g.num_edges()
    n_avail = len(jax.devices())
    base_dt = None
    for n_dev in [1, n_avail] if n_avail > 1 else [1]:
        dt, shards = bench_mesh(g, n_dev, args.feat)
        eps = E / dt
        if base_dt is None:
            base_dt = dt
            eff = 1.0
        else:
            eff = (base_dt / dt) / n_dev
        print(
            json.dumps(
                {
                    "bench": "dist_spmm_scaling",
                    "n_devices": n_dev,
                    "edges_per_s": round(eps),
                    "ms_per_iter": round(dt * 1e3, 2),
                    "scaling_efficiency": round(eff, 3),
                    "h_max": shards.h_max,
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
