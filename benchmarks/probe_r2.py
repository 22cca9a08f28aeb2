"""Round-2 on-chip probe: dense-hub SpMM vs XLA baseline (arxiv-like graph).

Timing per memory notes: chained fori_loop inside one jit, scalar fetch,
k vs 1 differencing (block_until_ready is a no-op on axon). Flushed prints.
Run: timeout 900 python benchmarks/probe_r2.py
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
from dgl_tpu.ops.hub_spmm import build_hub_plan, hub_copy_u_sum


def log(*a):
    print(*a, flush=True)


N, E, F = 169_343, 1_166_243, 256
ITERS = 20


def timed(fn, g, x, iters=ITERS, reps=2):
    def t(k):
        kk = jnp.int32(k)
        float(fn(g, x, kk))  # warm
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
    # arxiv-like power-law out-degrees (zipf s=1.0), uniform in-degrees
    w = 1.0 / np.arange(1, N + 1)
    src = rng.choice(N, E, p=w / w.sum())
    dst = rng.integers(0, N, E)
    g = dgl_tpu.graph((src, dst), num_nodes=N)
    x = jnp.asarray(rng.normal(size=(N, F)), dtype=jnp.float32)
    log("graph built; transferring x")

    @jax.jit
    def base(g, x, k):
        def body(_, h):
            return ops.copy_u_sum(g, h) * 1e-3
        return jnp.sum(jax.lax.fori_loop(0, k, body, x))

    t0 = time.perf_counter()
    float(base(g, x, 1))
    log(f"baseline compiled in {time.perf_counter()-t0:.1f}s")
    dt = timed(base, g, x)
    gbps = (E + N) * F * 4 / dt / 1e9
    log(f"BASELINE xla gather+segsum: {dt*1e3:.2f} ms  eff {gbps:.1f} GB/s")

    for H in (2048,):
        rel = g._relation(None)
        t0 = time.perf_counter()
        plan = build_hub_plan(rel, num_hubs=H, precision="bf16")
        jax.block_until_ready(plan.a_hub)
        log(f"plan H={H} built in {time.perf_counter()-t0:.1f}s "
            f"coverage={plan.coverage:.3f}")

        @jax.jit
        def hub(plan, x, k):
            def body(_, h):
                return hub_copy_u_sum(plan, h) * 1e-3
            return jnp.sum(jax.lax.fori_loop(0, k, body, x))

        t0 = time.perf_counter()
        float(hub(plan, x, 1))
        log(f"hub H={H} compiled in {time.perf_counter()-t0:.1f}s")
        dt_h = timed(hub, plan, x)
        gbps_h = (E + N) * F * 4 / dt_h / 1e9
        log(f"HUB H={H} bf16: {dt_h*1e3:.2f} ms  eff {gbps_h:.1f} GB/s  "
            f"speedup {dt/dt_h:.2f}x")
        # correctness spot check on-chip
        ref = ops.copy_u_sum(g, x)
        out = hub_copy_u_sum(plan, x)
        err = float(jnp.max(jnp.abs(out - ref)) / (jnp.max(jnp.abs(ref)) + 1e-9))
        log(f"relerr(max) vs baseline: {err:.2e}")


if __name__ == "__main__":
    main()
