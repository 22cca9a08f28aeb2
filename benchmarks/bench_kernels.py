"""Kernel microbenchmarks (reference ``benchmarks/benchmarks/kernel/``:
bench_gspmm_copy_u, bench_gspmm_u_mul_e, bench_gsddmm_u_dot_v,
bench_edge_softmax). Prints one JSON line per config.

Timing uses chained iterations + scalar fetch (remote-device safe; see
bench.py at the repo root).
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import argparse
import json
import time
from functools import partial

import numpy as np


def chain_timer(op, g, args, iters=10, reps=3):
    import jax
    import jax.numpy as jnp

    @jax.jit
    def chained(g, k, *a):
        def body(_, c):
            # mix the carry into the inputs so the op is loop-variant —
            # otherwise XLA hoists it out of the loop and timing collapses
            a_dep = tuple(x * (1.0 + c * 1e-20) for x in a)
            return c + jnp.sum(op(g, *a_dep)) * 1e-9
        return jax.lax.fori_loop(0, k, body, jnp.float32(0))

    float(chained(g, 1, *args))

    def timed(k):
        float(chained(g, k, *args))
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            float(chained(g, k, *args))
            best = min(best, time.perf_counter() - t0)
        return best

    # differencing cancels dispatch overhead but is noisy for sub-ms
    # kernels: clamp to a dispatch-noise floor
    dt = (timed(1 + iters) - timed(1)) / iters
    return max(dt, 1e-6)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--num-nodes", type=int, default=169_343)
    p.add_argument("--num-edges", type=int, default=1_166_243)
    p.add_argument("--feats", type=int, nargs="+", default=[4, 32, 256])
    p.add_argument("--iters", type=int, default=10)
    args = p.parse_args()

    import jax.numpy as jnp

    import dgl_tpu as dgl
    from dgl_tpu import ops

    N, E = args.num_nodes, args.num_edges
    rng = np.random.default_rng(0)
    g = dgl.graph((rng.integers(0, N, E), rng.integers(0, N, E)), num_nodes=N)

    for F in args.feats:
        x = jnp.asarray(rng.normal(size=(N, F)), dtype=jnp.float32)
        w = jnp.asarray(rng.normal(size=(E,)), dtype=jnp.float32)
        xe = jnp.asarray(rng.normal(size=(E, F)), dtype=jnp.float32)
        cases = {
            "gspmm_copy_u_sum": (ops.copy_u_sum, (x,)),
            "gspmm_copy_u_max": (ops.copy_u_max, (x,)),
            "gspmm_u_mul_e_sum": (ops.u_mul_e_sum, (x, w)),
            "gsddmm_u_dot_v": (
                lambda g, a: ops.gsddmm(
                    g._relation(None), "dot", a, a,
                    lhs_target="u", rhs_target="v",
                ),
                (x,),
            ),
            "edge_softmax": (
                lambda g, e: ops.edge_softmax(g, e), (xe[:, :1],)
            ),
        }
        for name, (op, a) in cases.items():
            dt = chain_timer(op, g, a, iters=args.iters)
            print(
                json.dumps(
                    {
                        "bench": name,
                        "num_nodes": N,
                        "num_edges": E,
                        "feat": F,
                        "ms": round(dt * 1e3, 3),
                        "edges_per_s": round(E / dt),
                    }
                ),
                flush=True,
            )


if __name__ == "__main__":
    main()
