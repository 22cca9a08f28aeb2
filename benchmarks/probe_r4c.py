"""Round-4 probe C: fused shell-space GAT layer vs the round-2/3 paths.

Same config as probe_r2j (arxiv-scale zipf graph, GATConv F=128 HID=32
HEADS=4, full fwd+bwd train step): round-3 measured classic 743 ms /
shell 488 ms. The fused op (ops/fused_gat.py) should land well under the
150 ms verdict target. Also times the raw op (attention only, no
fc/params) and u_mul_e_sum vs copy_u_sum at equal shape (verdict #4's
second criterion).

Run: timeout 580 python benchmarks/probe_r4c.py [mode]
  mode in {layer, op, umule}
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


N, E, F, HID, HEADS = 169_343, 1_166_243, 128, 32, 4


def build():
    rng = np.random.default_rng(0)
    w = 1.0 / np.arange(1, N + 1)
    src = rng.choice(N, E, p=w / w.sum())
    dst = rng.integers(0, N, E)
    g0 = dgl_tpu.graph((src, dst), num_nodes=N)
    gw = g0.with_spmm_plans(num_hubs=2048, weighted=True)
    return gw, rng


def chain_timer(fn, args, iters=10):
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


def mode_layer():
    from dgl_tpu.nn.conv.gatconv import GATConv

    gw, rng = build()
    x = jnp.asarray(rng.normal(size=(N, F)), jnp.float32)
    conv = GATConv(F, HID, HEADS, allow_zero_in_degree=True)
    params = conv.init(jax.random.PRNGKey(0), gw, x)

    @jax.jit
    def chain(params, x, g, k):
        def body(_, c):
            p, h = c

            def loss(p):
                return jnp.sum(conv.apply(p, g, h) ** 2) * 1e-6

            _, grads = jax.value_and_grad(loss)(p)
            return (jax.tree_util.tree_map(
                lambda a, b: a - 1e-9 * b, p, grads), h)

        p, _ = jax.lax.fori_loop(0, k, body, (params, x))
        return jnp.sum(p["params"]["fc"]["kernel"])

    dt = chain_timer(chain, (params, x, gw), iters=10)
    log(f"fused GAT layer fwd+bwd: {dt*1e3:8.2f} ms  "
        f"(round-3 shell path: 488 ms; verdict target <= 150 ms)")


def mode_op():
    from dgl_tpu.ops.fused_gat import fused_gat_attention

    gw, rng = build()
    plan = gw._relation(None).shell_plan
    el = jnp.asarray(rng.normal(size=(N, HEADS)), jnp.float32)
    er = jnp.asarray(rng.normal(size=(N, HEADS)), jnp.float32)
    h = jnp.asarray(rng.normal(size=(N, HEADS, HID)), jnp.float32)

    @jax.jit
    def fwd(el, er, h, plan, k):
        def body(_, c):
            return fused_gat_attention(0.2, plan, el, er, c) * 1e-3
        return jnp.sum(jax.lax.fori_loop(0, k, body, h))

    @jax.jit
    def fwdbwd(el, er, h, plan, k):
        def body(_, c):
            el2, er2, h2 = c

            def loss(el, er, h):
                return jnp.sum(
                    fused_gat_attention(0.2, plan, el, er, h) ** 2) * 1e-6

            gl, gr, gh = jax.grad(loss, argnums=(0, 1, 2))(el2, er2, h2)
            return (el2 - 1e-9 * gl, er2 - 1e-9 * gr, h2 - 1e-9 * gh)

        el2, er2, h2 = jax.lax.fori_loop(0, k, body, (el, er, h))
        return jnp.sum(h2[0])

    dt_f = chain_timer(fwd, (el, er, h, plan), iters=10)
    dt_fb = chain_timer(fwdbwd, (el, er, h, plan), iters=10)
    log(f"fused attention op: fwd {dt_f*1e3:8.2f} ms   "
        f"fwd+bwd {dt_fb*1e3:8.2f} ms")


def mode_umule():
    from dgl_tpu import ops

    gw, rng = build()
    feat = HEADS * HID  # 128 — equal shape for both ops
    u = jnp.asarray(rng.normal(size=(N, feat)), jnp.float32)
    e = jnp.asarray(rng.normal(size=(E, 1)), jnp.float32)

    @jax.jit
    def cu(u, g, k):
        def body(_, c):
            return ops.copy_u_sum(g, c) * 1e-3
        return jnp.sum(jax.lax.fori_loop(0, k, body, u))

    @jax.jit
    def ume(u, e, g, k):
        def body(_, c):
            return ops.u_mul_e_sum(g, c, e) * 1e-3
        return jnp.sum(jax.lax.fori_loop(0, k, body, u))

    dt_cu = chain_timer(cu, (u, gw), iters=10)
    dt_ume = chain_timer(ume, (u, e, gw), iters=10)
    log(f"copy_u_sum {dt_cu*1e3:8.2f} ms   u_mul_e_sum {dt_ume*1e3:8.2f} ms"
        f"   ratio {dt_ume/dt_cu:.2f} (target <= 2)")


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "layer"
    log("devices:", jax.devices())
    {"layer": mode_layer, "op": mode_op, "umule": mode_umule}[mode]()


if __name__ == "__main__":
    main()
