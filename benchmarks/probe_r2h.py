"""Round-2 probe H: shell-decomposition cold tail on-chip.

probe_r2g located the cold-tail cost in the sorted segment-sum itself
(~14 ns/edge scatter lowering) rather than the gather (~8 ns/edge). The
shell decomposition (hub_spmm._build_shells) removes the segment-sum:
degree-ranked prefix slices + one flat gather per shell + one unrank
gather. Expected ~6.2-6.5 ms vs the 8.28 ms segsum cold path.
Run: timeout 560 python benchmarks/probe_r2h.py
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
    ref = ops.copy_u_sum(g, x)

    @jax.jit
    def hub(plan, x, k):
        def body(_, h):
            return hub_copy_u_sum(plan, h) * 1e-3
        return jnp.sum(jax.lax.fori_loop(0, k, body, x))

    for cold in ("shell",):
        plan = build_hub_plan(rel, num_hubs=2048, precision="int8", cold=cold)
        jax.block_until_ready(plan.a_hub)
        log(f"plan H={plan.num_hubs} cov={plan.coverage:.3f} cold={plan.cold} "
            f"shells={len(plan.shells)} rev_shells={len(plan.rev_shells)}")
        out = hub_copy_u_sum(plan, x)
        err = float(jnp.max(jnp.abs(out - ref)) / jnp.max(jnp.abs(ref)))
        dt = timed(hub, plan, x)
        gbps = (E + N) * F * 4 / dt / 1e9
        log(f"HUB cold={cold}: {dt*1e3:.2f} ms  eff {gbps:.1f} GB/s  "
            f"{XLA_MS/(dt*1e3):.2f}x of XLA  relerr {err:.2e}")


if __name__ == "__main__":
    main()
