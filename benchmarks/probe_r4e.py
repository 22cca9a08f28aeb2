"""Round-4 probe E: decompose the post-blocked-residual headline SpMM.

The headline (bench.py) measures 4.24 ms at F=256 = 329.7 GB/s (40% of
roofline). Pieces, on the exact headline configuration (arxiv-scale zipf,
rank-relabeled, dense-hub H=2048 int8 + shell cold):

  hub   : the A_hub int8 matmul alone ((N,2048) int8 stream + MXU)
  cold  : the shell cold-tail sum alone (bf16 gathers + prefix reduce)
  full  : hub + cold (the headline op)
  floor : one plain bf16 gather of the cold rows (the issue-rate bound)

Run: timeout 580 python benchmarks/probe_r4e.py
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


N, E, F = 169_343, 1_166_243, 256


def chain(fn, args, iters=20):
    def t(k):
        kk = jnp.int32(k)
        float(fn(*args, kk))
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            float(fn(*args, kk))
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
    from dgl_tpu.transforms import reorder_for_spmm

    gp, _ = reorder_for_spmm(g, num_hubs=2048, precision="int8")
    plan = gp._relation(None).hub_plan
    x = jnp.asarray(rng.normal(size=(N, F)), jnp.float32)
    log(f"plan: H={plan.num_hubs} coverage={plan.coverage:.3f} "
        f"cold_edges={int(plan.cold_src.shape[0])}")

    from dgl_tpu.ops.hub_spmm import _mm, _shell_sum

    @jax.jit
    def full(plan, x, k):
        from dgl_tpu.ops.hub_spmm import hub_copy_u_sum

        def body(_, h):
            return hub_copy_u_sum(plan, h) * 1e-3
        return jnp.sum(jax.lax.fori_loop(0, k, body, x))

    @jax.jit
    def hub_only(plan, x, k):
        def body(_, h):
            return _mm(plan.a_hub, h[plan.hub_ids],
                       plan.precision) * 1e-3
        return jnp.sum(jax.lax.fori_loop(0, k, body, x))

    @jax.jit
    def cold_only(plan, x, k):
        def body(_, h):
            return _shell_sum(h, plan.shells, plan.res_dst,
                              plan.unrank_dst, plan.num_dst,
                              plan.cold) * 1e-3
        return jnp.sum(jax.lax.fori_loop(0, k, body, x))

    @jax.jit
    def floor_gather(plan, x, k):
        idx = plan.cold_src

        def body(_, h):
            g = jnp.take(h.astype(jnp.bfloat16), idx, axis=0,
                         mode="fill", fill_value=0)
            return (g[: N].astype(jnp.float32)) * 1e-3
        return jnp.sum(jax.lax.fori_loop(0, k, body, x))

    for name, fn in [("full", full), ("hub", hub_only),
                     ("cold", cold_only), ("floor", floor_gather)]:
        dt = chain(fn, (plan, x))
        log(f"{name:6s}: {dt*1e3:7.3f} ms")


if __name__ == "__main__":
    main()
