"""Round-5 probe A: Pallas shell-prefix accumulator vs XLA prefix_reduce
on the exact headline SpMM configuration (arxiv-scale zipf, rank-
relabeled, dense-hub H=2048 int8 + shell cold, F=256).

probe_r4e isolated ~1.85 ms of the 3.72 ms cold tail as the prefix-
accumulator stream; ops/shell_pallas.py keeps each output block in VMEM
across its level visits. Expected: full SpMM 4.26 -> ~3.0 ms.

Run: timeout 580 python benchmarks/probe_r5a.py
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


def chain(fn, args, iters=20):
    import statistics

    def times(k, r=3):
        kk = jnp.int32(k)
        float(fn(*args, kk))
        out = []
        for _ in range(r):
            t0 = time.perf_counter()
            float(fn(*args, kk))
            out.append(time.perf_counter() - t0)
        return out

    for _ in range(3):
        dt = (statistics.median(times(1 + iters))
              - statistics.median(times(1))) / iters
        if dt > 0:
            return dt
    return dt


def main():
    log("devices:", jax.devices())
    rng = np.random.default_rng(0)
    w = 1.0 / np.arange(1, N + 1)
    src = rng.choice(N, E, p=w / w.sum())
    dst = rng.integers(0, N, E)
    g = dgl_tpu.graph((src, dst), num_nodes=N)
    from dgl_tpu.transforms import reorder_for_spmm

    gp, _ = reorder_for_spmm(g, num_hubs=2048, precision="int8")
    x = jnp.asarray(rng.normal(size=(N, F)), dtype=jnp.float32)

    # the gate is read at TRACE time: use two distinct jit functions so
    # each captures its own path (no cache aliasing)
    def make_chain():
        @jax.jit
        def spmm_chain(g, x, k):
            def body(_, h):
                return ops.copy_u_sum(g, h) * 1e-3
            return jnp.sum(jax.lax.fori_loop(0, k, body, x))
        return spmm_chain

    @jax.jit
    def one_pallas(g, x):
        return ops.copy_u_sum(g, x)

    chain_pallas = make_chain()
    y_pallas = one_pallas(gp, x)
    os.environ["DGL_TPU_NO_PALLAS_SHELLS"] = "1"

    @jax.jit
    def one_xla(g, x):
        return ops.copy_u_sum(g, x)

    chain_xla = make_chain()
    y_xla = one_xla(gp, x)
    rel_err = float(jnp.linalg.norm(y_pallas - y_xla)
                    / jnp.linalg.norm(y_xla))
    log(f"pallas-vs-xla on-chip rel err: {rel_err:.2e}")

    dt_xla = chain(chain_xla, (gp, x))
    log(f"XLA prefix_reduce : {dt_xla*1e3:.3f} ms "
        f"({(E+N)*F*4/dt_xla/1e9:.1f} GB/s)")
    del os.environ["DGL_TPU_NO_PALLAS_SHELLS"]
    dt_p = chain(chain_pallas, (gp, x))
    log(f"Pallas shells     : {dt_p*1e3:.3f} ms "
        f"({(E+N)*F*4/dt_p/1e9:.1f} GB/s)  speedup {dt_xla/dt_p:.2f}x")


if __name__ == "__main__":
    main()
