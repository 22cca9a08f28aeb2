"""Round-2 on-chip probe B: int8-stored A_hub at larger H.

int8 halves the A_hub HBM stream vs bf16, making H=8192 affordable
(coverage ~0.75 on zipf) — projected ~3x over the XLA baseline. Two fresh
compiles max per run (the remote compile service wedges under load).

Run: timeout 900 python benchmarks/probe_r2b.py [H ...]
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
XLA_BASELINE_MS = 22.56  # measured this round (probe_r2.py)


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
    hs = [int(a) for a in sys.argv[1:]] or [2048, 8192]
    log("devices:", jax.devices())
    rng = np.random.default_rng(0)
    w = 1.0 / np.arange(1, N + 1)
    src = rng.choice(N, E, p=w / w.sum())
    dst = rng.integers(0, N, E)
    g = dgl_tpu.graph((src, dst), num_nodes=N)
    x = jnp.asarray(rng.normal(size=(N, F)), dtype=jnp.float32)
    rel = g._relation(None)
    ref = None

    for H in hs:
        t0 = time.perf_counter()
        plan = build_hub_plan(rel, num_hubs=H, precision="int8")
        jax.block_until_ready(plan.a_hub)
        log(f"plan H={H} ({plan.precision}) built in "
            f"{time.perf_counter()-t0:.1f}s coverage={plan.coverage:.3f}")

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
        log(f"HUB H={H} int8: {dt_h*1e3:.2f} ms  eff {gbps_h:.1f} GB/s  "
            f"speedup {XLA_BASELINE_MS/(dt_h*1e3):.2f}x vs XLA")
        if ref is None:
            ref = ops.copy_u_sum(g, x)
        out = hub_copy_u_sum(plan, x)
        err = float(jnp.max(jnp.abs(out - ref)) / (jnp.max(jnp.abs(ref)) + 1e-9))
        log(f"relerr(max) vs baseline: {err:.2e}")


if __name__ == "__main__":
    main()
