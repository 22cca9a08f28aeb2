"""Round-2 probe G: gather vs segsum rates, hoist-proof.

probe_r2f's bodies were loop-invariant — XLA hoisted the op out of the
fori_loop and the k-vs-1 differencing cancelled it (~0 ns/edge readings).
Here each iteration's op consumes the carry (N,F) and produces the next
carry, exactly like the shipping path, with E' = N edges so the gather
output reshapes straight into the carry without slice-of-gather rewrites:
  (1) gath  — h' = f32(bf16(h)[idx]) * 1e-3            (gather only)
  (2) seg   — h' = segsum(bf16(h) rows, sorted dst)    (segsum only)
Run: timeout 560 python benchmarks/probe_r2g.py
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
from dgl_tpu.ops.hub_spmm import build_hub_plan


def log(*a):
    print(*a, flush=True)


N, E, F = 169_343, 1_166_243, 256
ITERS = 20


def timed(fn, a, b, iters=ITERS, reps=2):
    def t(k):
        kk = jnp.int32(k)
        float(fn(a, b, kk))
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            float(fn(a, b, kk))
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
    # E' = N edges: first N cold edges (sorted dst subset stays sorted)
    idx = plan.cold_src[:N]
    dstN = plan.cold_dst[:N]

    @jax.jit
    def gath(idx, x, k):
        def body(_, h):
            return h * 1e-4 + bf(h)[idx].astype(jnp.float32) * 1e-3
        def bf(h):
            return h.astype(jnp.bfloat16)
        return jnp.sum(jax.lax.fori_loop(0, k, body, x))

    @jax.jit
    def seg(dstv, x, k):
        def body(_, h):
            return jax.ops.segment_sum(
                h.astype(jnp.bfloat16), dstv, num_segments=N,
                indices_are_sorted=True,
            ).astype(jnp.float32) * 1e-3
        return jax.lax.fori_loop(0, k, body, x).sum()

    for name, fn, a in (("gath", gath, idx), ("seg", seg, dstN)):
        dt = timed(fn, a, x)
        log(f"{name:4s}: {dt*1e3:6.2f} ms  {dt*1e9/N:5.1f} ns/edge (E'={N})")


if __name__ == "__main__":
    main()
