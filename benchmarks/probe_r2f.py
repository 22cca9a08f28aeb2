"""Round-2 probe F: split the cold tail — gather vs sorted segment-sum.

probe_r2e: cold (bf16 gather + sorted segsum, 408k edges) = 7.93 ms =
19.4 ns/edge, identical to the full-graph XLA rate. Which half owns it?
  (1) gath — bf16 gather + plain sum (no segsum)
  (2) seg16 — sorted segsum of PRE-materialized bf16 messages (no gather)
  (3) seg32 — same with f32 messages
Run: timeout 560 python benchmarks/probe_r2f.py
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
    Ec = int(plan.cold_src.shape[0])
    ncold = int(np.sum(np.asarray(plan.cold_dst) < N))
    log(f"cold edges {ncold} (padded {Ec})")
    msgs16 = jnp.zeros((Ec, F), jnp.bfloat16) + jnp.bfloat16(1e-3)
    msgs32 = jnp.zeros((Ec, F), jnp.float32) + 1e-3

    @jax.jit
    def gath(idx, x, k):
        xb = x.astype(jnp.bfloat16)

        def body(_, acc):
            return acc * 0.5 + jnp.sum(xb[idx].astype(jnp.float32))
        return jax.lax.fori_loop(0, k, body, jnp.float32(0))

    def make_seg(dstv):
        @jax.jit
        def seg(m, _x, k):
            def body(_, acc):
                return acc * 0.5 + jnp.sum(
                    jax.ops.segment_sum(
                        m, dstv, num_segments=N, indices_are_sorted=True
                    )
                )
            return jax.lax.fori_loop(0, k, body, jnp.float32(0))
        return seg

    seg = make_seg(plan.cold_dst)
    per = lambda dt: dt * 1e9 / ncold
    dt = timed(gath, plan.cold_src, x)
    log(f"gath : {dt*1e3:6.2f} ms  {per(dt):5.1f} ns/edge")
    dt = timed(seg, msgs16, x)
    log(f"seg16: {dt*1e3:6.2f} ms  {per(dt):5.1f} ns/edge")
    dt = timed(seg, msgs32, x)
    log(f"seg32: {dt*1e3:6.2f} ms  {per(dt):5.1f} ns/edge")


if __name__ == "__main__":
    main()
