"""Round-2 probe I: weighted shell g-SpMM (u_mul_e_sum) on-chip.

Classic path = gather + gather + sorted segsum (~19+ ns/edge expected);
shell path = the segment-sum-free decomposition generalized to edge
weights (ops/shell_spmm.py). arxiv-scale zipf graph, F=256, 1-D weights.
Run: timeout 560 python benchmarks/probe_r2i.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import numpy as np
import jax
import jax.numpy as jnp

import dgl_tpu
from dgl_tpu import ops


def log(*a):
    print(*a, flush=True)


N, E, F = 169_343, 1_166_243, 256
ITERS = 20


def timed(fn, g, x, e, iters=ITERS, reps=2):
    def t(k):
        kk = jnp.int32(k)
        float(fn(g, x, e, kk))
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            float(fn(g, x, e, kk))
            best = min(best, time.perf_counter() - t0)
        return best

    return (t(1 + iters) - t(1)) / iters


def main():
    log("devices:", jax.devices())
    rng = np.random.default_rng(0)
    w = 1.0 / np.arange(1, N + 1)
    src = rng.choice(N, E, p=w / w.sum())
    dst = rng.integers(0, N, E)
    g0 = dgl_tpu.graph((src, dst), num_nodes=N)
    gw = g0.with_spmm_plans(num_hubs=2048, weighted=True)
    x = jnp.asarray(rng.normal(size=(N, F)), dtype=jnp.float32)
    e = jnp.asarray(rng.normal(size=(g0.num_edges(),)), dtype=jnp.float32)
    ref = ops.u_mul_e_sum(g0, x, e)
    out = ops.u_mul_e_sum(gw, x, e)
    err = float(jnp.max(jnp.abs(out - ref)) / jnp.max(jnp.abs(ref)))

    @jax.jit
    def chain(g, x, e, k):
        def body(_, h):
            return ops.u_mul_e_sum(g, h, e) * 1e-3
        return jnp.sum(jax.lax.fori_loop(0, k, body, x))

    dt0 = timed(chain, g0, x, e)
    log(f"classic : {dt0*1e3:6.2f} ms  {dt0*1e9/E:5.1f} ns/edge")
    dt1 = timed(chain, gw, x, e)
    log(f"shell   : {dt1*1e3:6.2f} ms  {dt1*1e9/E:5.1f} ns/edge  "
        f"{dt0/dt1:.2f}x  relerr {err:.2e}")


if __name__ == "__main__":
    main()
