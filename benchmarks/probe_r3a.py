"""Round-3 probe A: where does the PubMed GCN epoch go?

PubMed is the weakest flagship ratio (0.463 s / 200 epochs = 2.3 ms/epoch
vs reference 0.690 s — only 1.49x, while Cora runs 12.9x). This probe
times three fori_loop chains at pubmed scale (N=19.7k, E=88.7k, F=500,
hidden 16) to split the epoch between the SpMM, the dense matmuls, and
the optimizer/overhead floor:

  full    : the real GCN epoch (matmul + SpMM + adam)
  no_spmm : update_all replaced by identity (matmul + adam only)
  no_mm   : SpMM on raw features, no weight matmuls (SpMM + adam only)

Run each mode in its own process (one compile chunk per run, the wedge
discipline): timeout 560 python benchmarks/probe_r3a.py [full|no_spmm|no_mm]
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
import optax

import dgl_tpu as dgl
from dgl_tpu import function as fn


def log(*a):
    print(*a, flush=True)


N, E, F, HID, C = 19717, 88651, 500, 16, 3
ITERS = 50


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "full"
    log("devices:", jax.devices())
    rng = np.random.default_rng(0)
    src = rng.integers(0, N, E)
    dst = rng.integers(0, N, E)
    g = dgl.add_self_loop(dgl.graph((src, dst), num_nodes=N))
    if jax.devices()[0].platform != "cpu":
        g = g.with_spmm_plans(num_hubs=512, weighted=True)
    x = jnp.asarray(rng.normal(size=(N, F)), jnp.float32)
    y = jnp.asarray(rng.integers(0, C, N).astype(np.int32))
    w1 = jnp.asarray(rng.normal(size=(F, HID)) * 0.05, jnp.float32)
    w2 = jnp.asarray(rng.normal(size=(HID, C)) * 0.05, jnp.float32)
    params = {"w1": w1, "w2": w2}
    tx = optax.adam(1e-2)
    opt0 = tx.init(params)

    def spmm(gg, h):
        with gg.local_scope() as s:
            s.srcdata["h"] = h
            s.update_all(fn.copy_u("h", "m"), fn.mean("m", "o"))
            return s.dstdata["o"]

    def fwd(p, gg, xx):
        if mode == "no_mm":
            h = spmm(gg, xx[:, :HID])
            h = jax.nn.relu(h)
            return spmm(gg, h)[:, :C]
        if mode == "cached":
            # static-input aggregation caching: xx is ALREADY spmm(g, x)
            # (computed once outside the epoch loop) — exact rewrite
            # spmm(x @ w1) == spmm(x) @ w1; layer-1 SpMM gone fwd+bwd
            h = jax.nn.relu(xx @ p["w1"])
            return spmm(gg, h @ p["w2"])
        h = xx @ p["w1"]
        if mode != "no_spmm":
            h = spmm(gg, h)
        h = jax.nn.relu(h)
        h = h @ p["w2"]
        if mode != "no_spmm":
            h = spmm(gg, h)
        return h

    @jax.jit
    def train(p, opt, k, gg, xx):
        if mode == "no_mm":
            # no params in the loss: feed the SpMM output back into the
            # carry or XLA hoists the whole body (the probe_r2f lesson)
            def body(i, h):
                out = spmm(gg, jax.nn.relu(spmm(gg, h)))
                return h + 1e-6 * out

            h = jax.lax.fori_loop(0, k, body, xx[:, :HID])
            return jnp.sum(h)

        def body(i, carry):
            p, opt = carry

            def loss(p):
                logits = fwd(p, gg, xx)
                return optax.softmax_cross_entropy_with_integer_labels(
                    logits, y
                ).mean()

            _, grads = jax.value_and_grad(loss)(p)
            upd, opt = tx.update(grads, opt)
            return optax.apply_updates(p, upd), opt

        p, _ = jax.lax.fori_loop(0, k, body, (p, opt))
        return jnp.sum(p["w2"])

    if mode == "cached":
        x = jax.jit(lambda gg, xx: spmm(gg, xx))(g, x)

    def t(k):
        kk = jnp.int32(k)
        float(train(params, opt0, kk, g, x))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            float(train(params, opt0, kk, g, x))
            best = min(best, time.perf_counter() - t0)
        return best

    dt = (t(1 + ITERS) - t(1)) / ITERS
    log(f"mode={mode}: {dt*1e3:.3f} ms/epoch")


if __name__ == "__main__":
    main()
