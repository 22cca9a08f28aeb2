"""Round-3 probe F: decompose the dense-attention GAT epoch (Cora shapes).

GAT Cora via dense masked attention measures ~6.5 ms/epoch on v5e, far
above the ~1.5 ms HBM-traffic estimate for the (8, 2708, 2708) tensors.
Time the candidates separately: attention fwd, fwd+bwd, the attn-dropout
bernoulli RNG, and the feat-dropout path.

Run: timeout 560 python benchmarks/probe_r3f.py
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


def log(*a):
    print(*a, flush=True)


N, H, O = 2708, 8, 8


def chain_time(fn, *arrays, iters=8):
    @jax.jit
    def run(kk, *a):
        def body(i, c):
            return fn(c, *a) * 1e-20 + c * 0.5

        return jax.lax.fori_loop(0, kk, body, jnp.float32(1.0))

    def t(k):
        float(run(jnp.int32(k), *arrays))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            float(run(jnp.int32(k), *arrays))
            best = min(best, time.perf_counter() - t0)
        return best

    return (t(iters + 1) - t(1)) / iters


def main():
    import dgl_tpu as dgl
    from dgl_tpu.ops.dense_attn import (
        build_dense_adj, dense_masked_attention,
    )

    log(f"devices: {jax.devices()}")
    rng = np.random.default_rng(0)
    e = 10556
    src = rng.integers(0, N, e)
    dst = rng.integers(0, N, e)
    flat = np.unique(dst.astype(np.int64) * N + src)
    g = dgl.add_self_loop(dgl.remove_self_loop(
        dgl.graph(((flat % N), (flat // N)), num_nodes=N)))
    plan = build_dense_adj(g._relation(None))
    el = jnp.asarray(rng.normal(size=(N, H)).astype(np.float32))
    er = jnp.asarray(rng.normal(size=(N, H)).astype(np.float32))
    hs = jnp.asarray(rng.normal(size=(N, H, O)).astype(np.float32))

    def fwd(c, el, er, hs):
        out = dense_masked_attention(
            plan, el + c * 1e-30, er, hs, compute_dtype=jnp.bfloat16
        )
        return out.astype(jnp.float32).sum()

    log(f"attention fwd bf16: {chain_time(fwd, el, er, hs)*1e3:.3f} ms")

    def fwd32(c, el, er, hs):
        out = dense_masked_attention(plan, el + c * 1e-30, er, hs)
        return out.astype(jnp.float32).sum()

    log(f"attention fwd f32:  {chain_time(fwd32, el, er, hs)*1e3:.3f} ms")

    def fwdbwd(c, el, er, hs):
        def f(el_, hs_):
            out = dense_masked_attention(
                plan, el_, er, hs_, compute_dtype=jnp.bfloat16
            )
            return out.astype(jnp.float32).sum()

        v, (g1, g2) = jax.value_and_grad(f, argnums=(0, 1))(
            el + c * 1e-30, hs
        )
        return v + g1.sum() + g2.sum()

    log(f"attention fwd+bwd bf16: {chain_time(fwdbwd, el, er, hs)*1e3:.3f} ms")

    def rng_only(c, el):
        key = jax.random.PRNGKey(0)
        key = jax.random.fold_in(key, (c * 1e10).astype(jnp.int32))
        m = jax.random.bernoulli(key, 0.4, (H, N, N))
        return m.sum().astype(jnp.float32)

    log(f"bernoulli (H,N,N): {chain_time(rng_only, el)*1e3:.3f} ms")

    def fwdbwd_drop(c, el, er, hs):
        key = jax.random.fold_in(
            jax.random.PRNGKey(0), (c * 1e10).astype(jnp.int32)
        )

        def f(el_, hs_):
            out = dense_masked_attention(
                plan, el_, er, hs_, compute_dtype=jnp.bfloat16,
                dropout_fn=lambda a: a * jax.random.bernoulli(
                    key, 0.4, a.shape
                ).astype(a.dtype) / 0.4,
            )
            return out.astype(jnp.float32).sum()

        v, (g1, g2) = jax.value_and_grad(f, argnums=(0, 1))(
            el + c * 1e-30, hs
        )
        return v + g1.sum() + g2.sum()

    log(f"attention fwd+bwd+attndrop: "
        f"{chain_time(fwdbwd_drop, el, er, hs)*1e3:.3f} ms")

    def rng_rbg(c, el):
        kd = jnp.array([0, 1, 2, 3], jnp.uint32) + (c * 1e10).astype(
            jnp.uint32
        )
        rk = jax.random.wrap_key_data(kd, impl="rbg")
        m = jax.random.bernoulli(rk, 0.4, (H, N, N))
        return m.sum().astype(jnp.float32)

    log(f"bernoulli rbg (H,N,N): {chain_time(rng_rbg, el)*1e3:.3f} ms")

    def fwdbwd_drop_rbg(c, el, er, hs):
        kd = jnp.array([0, 1, 2, 3], jnp.uint32) + (c * 1e10).astype(
            jnp.uint32
        )
        rk = jax.random.wrap_key_data(kd, impl="rbg")

        def f(el_, hs_):
            out = dense_masked_attention(
                plan, el_, er, hs_, compute_dtype=jnp.bfloat16,
                dropout_fn=lambda a: a * jax.random.bernoulli(
                    rk, 0.4, a.shape
                ).astype(a.dtype) / 0.4,
            )
            return out.astype(jnp.float32).sum()

        v, (g1, g2) = jax.value_and_grad(f, argnums=(0, 1))(
            el + c * 1e-30, hs
        )
        return v + g1.sum() + g2.sum()

    log(f"attention fwd+bwd+attndrop rbg: "
        f"{chain_time(fwdbwd_drop_rbg, el, er, hs)*1e3:.3f} ms")


if __name__ == "__main__":
    main()
