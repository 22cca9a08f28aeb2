"""Round-2 probe J: full GAT layer (train step) arxiv-scale, classic vs
shell plans.

The GAT hot path is edge_softmax (3 segment reductions) + u_mul_e_sum
(weighted SpMM). With with_spmm_plans(weighted=True) both run
segment-free (ops/shell_spmm.py). This times one GATConv forward+backward
step on the arxiv-scale zipf graph, both modes.
Run: timeout 560 python benchmarks/probe_r2j.py
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


def log(*a):
    print(*a, flush=True)


N, E, F, HID, HEADS = 169_343, 1_166_243, 128, 32, 4
ITERS = 10


def main():
    from dgl_tpu.nn.conv.gatconv import GATConv

    log("devices:", jax.devices())
    rng = np.random.default_rng(0)
    w = 1.0 / np.arange(1, N + 1)
    src = rng.choice(N, E, p=w / w.sum())
    dst = rng.integers(0, N, E)
    g0 = dgl_tpu.graph((src, dst), num_nodes=N)
    gw = g0.with_spmm_plans(num_hubs=2048, weighted=True)
    x = jnp.asarray(rng.normal(size=(N, F)), dtype=jnp.float32)
    conv = GATConv(F, HID, HEADS, allow_zero_in_degree=True)
    params = conv.init(jax.random.PRNGKey(0), g0, x)

    # the graph is a jit ARGUMENT, not a closure: closing over it embeds
    # ~10s of MB of index arrays as HLO constants, which overflows the
    # remote compile service's request-size limit (HTTP 413 on axon)
    @jax.jit
    def chain(params, x, k, g):
        def body(_, c):
            p, h = c
            def loss(p):
                return jnp.sum(conv.apply(p, g, h) ** 2) * 1e-6
            l, grads = jax.value_and_grad(loss)(p)
            p2 = jax.tree_util.tree_map(
                lambda a, b: a - 1e-9 * b, p, grads)
            return (p2, h)
        p, _ = jax.lax.fori_loop(0, k, body, (params, x))
        return jnp.sum(p["params"]["fc"]["kernel"])

    def timed(g):
        def t(k):
            kk = jnp.int32(k)
            float(chain(params, x, kk, g))
            best = float("inf")
            for _ in range(2):
                t0 = time.perf_counter()
                float(chain(params, x, kk, g))
                best = min(best, time.perf_counter() - t0)
            return best

        return (t(1 + ITERS) - t(1)) / ITERS

    mode = sys.argv[1] if len(sys.argv) > 1 else "all"
    if mode in ("all", "err"):
        @jax.jit
        def relerr(params, x):
            r0 = conv.apply(params, g0, x)
            r1 = conv.apply(params, gw, x)
            return jnp.max(jnp.abs(r1 - r0)) / jnp.max(jnp.abs(r0))

        log(f"relerr {float(relerr(params, x)):.2e}")
    if mode in ("all", "classic"):
        dt0 = timed(g0)
        log(f"classic GAT layer fwd+bwd: {dt0*1e3:7.2f} ms")
    if mode in ("all", "shell"):
        dt1 = timed(gw)
        log(f"shell   GAT layer fwd+bwd: {dt1*1e3:7.2f} ms")


if __name__ == "__main__":
    main()
