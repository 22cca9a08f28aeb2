"""Round-2 probe D: integrated int8 + bf16-cold plan at H=2048/4096."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
import numpy as np, jax, jax.numpy as jnp
import dgl_tpu
from dgl_tpu import ops
from dgl_tpu.ops.hub_spmm import build_hub_plan, hub_copy_u_sum

def log(*a): print(*a, flush=True)
N, E, F = 169_343, 1_166_243, 256
ITERS, XLA_MS = 20, 22.56

def timed(fn, g, x, iters=ITERS, reps=2):
    def t(k):
        kk = jnp.int32(k); float(fn(g, x, kk))
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter(); float(fn(g, x, kk))
            best = min(best, time.perf_counter() - t0)
        return best
    return (t(1 + iters) - t(1)) / iters

def main():
    log("devices:", jax.devices())
    rng = np.random.default_rng(0)
    w = 1.0 / np.arange(1, N + 1)
    src = rng.choice(N, E, p=w / w.sum()); dst = rng.integers(0, N, E)
    g = dgl_tpu.graph((src, dst), num_nodes=N)
    x = jnp.asarray(rng.normal(size=(N, F)), dtype=jnp.float32)
    rel = g._relation(None)
    ref = ops.copy_u_sum(g, x)
    for H in (4096, 2048):
        plan = build_hub_plan(rel, num_hubs=H, precision="int8")
        jax.block_until_ready(plan.a_hub)
        log(f"plan H={H} cov={plan.coverage:.3f} cold={plan.cold}")
        @jax.jit
        def hub(plan, x, k):
            def body(_, h): return hub_copy_u_sum(plan, h) * 1e-3
            return jnp.sum(jax.lax.fori_loop(0, k, body, x))
        t0 = time.perf_counter(); float(hub(plan, x, 1))
        log(f"compiled in {time.perf_counter()-t0:.1f}s")
        dt = timed(hub, plan, x)
        gbps = (E + N) * F * 4 / dt / 1e9
        out = hub_copy_u_sum(plan, x)
        err = float(jnp.max(jnp.abs(out - ref)) / jnp.max(jnp.abs(ref)))
        log(f"HUB H={H} int8+bf16cold: {dt*1e3:.2f} ms  eff {gbps:.1f} GB/s  "
            f"speedup {XLA_MS/(dt*1e3):.2f}x  relerr {err:.2e}")

if __name__ == "__main__":
    main()
