"""Round-2 probe E: time breakdown of the int8-hub + bf16-cold SpMM.

Separates the three components of the shipping fast path at H=2048:
  (1) full   — hub matmul + cold gather/segsum + add (the bench path)
  (2) mm     — dense A_hub int8 matmul only
  (3) cold   — bf16 cold gather + sorted segsum only
to locate the remaining milliseconds. Run while the tunnel is alive:
  timeout 560 python benchmarks/probe_r2e.py
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
from dgl_tpu.ops.hub_spmm import build_hub_plan, hub_copy_u_sum, _mm, _cold_gather


def log(*a):
    print(*a, flush=True)


N, E, F = 169_343, 1_166_243, 256
ITERS, XLA_MS = 20, 22.56


def timed(fn, g, x, iters=ITERS, reps=2):
    def t(k):
        kk = jnp.int32(k)
        float(fn(g, x, kk))
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            float(fn(g, x, kk))
            best = min(best, time.perf_counter() - t0)
        return best

    return (t(1 + iters) - t(1)) / iters


def main():
    log("devices:", jax.devices())
    rng = np.random.default_rng(0)
    w = 1.0 / np.arange(1, N + 1)
    src = rng.choice(N, E, p=w / w.sum())
    dst = rng.integers(0, N, E)
    g = dgl_tpu.graph((src, dst), num_nodes=N)
    x = jnp.asarray(rng.normal(size=(N, F)), dtype=jnp.float32)
    rel = g._relation(None)
    plan = build_hub_plan(rel, num_hubs=2048, precision="int8")
    jax.block_until_ready(plan.a_hub)
    ncold = int(np.sum(np.asarray(plan.cold_dst) < N))
    log(f"plan H={plan.num_hubs} cov={plan.coverage:.3f} cold_edges={ncold}")

    @jax.jit
    def full(plan, x, k):
        def body(_, h):
            return hub_copy_u_sum(plan, h) * 1e-3
        return jnp.sum(jax.lax.fori_loop(0, k, body, x))

    @jax.jit
    def mm_only(plan, x, k):
        def body(_, h):
            return _mm(plan.a_hub, h[: plan.num_hubs], plan.precision) * 1e-3
        return jnp.sum(jax.lax.fori_loop(0, k, body, x[: plan.num_dst]))

    @jax.jit
    def cold_only(plan, x, k):
        def body(_, h):
            return jax.ops.segment_sum(
                _cold_gather(h, plan.cold_src, plan.cold),
                plan.cold_dst,
                num_segments=plan.num_dst,
                indices_are_sorted=True,
            ) * 1e-3
        return jnp.sum(jax.lax.fori_loop(0, k, body, x))

    for name, fn in (("full", full), ("mm", mm_only), ("cold", cold_only)):
        dt = timed(fn, plan, x)
        log(f"{name:5s}: {dt*1e3:6.2f} ms   ({XLA_MS/ (dt*1e3):.2f}x of XLA)")


if __name__ == "__main__":
    main()
