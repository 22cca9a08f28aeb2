"""Round-3 probe C: decompose the 7.1 ms arxiv-scale headline SpMM.

BENCH_r02 lands 191 GB/s (23% of roofline). Bottom-up accounting says the
parts should sum to ~3 ms: hub matmul reads (N,H) int8 = 347 MB (~0.65 ms
at the 538 GB/s streaming rate), cold shell gathers ~408k rows x 512 B
bf16 (~1.2 ms at the 2.9 ns/row issue floor), unrank + output writes
(~0.7 ms). This probe times each component standalone to find where the
other ~4 ms hides (per-shell op overhead? the bf16 cast? mask math?).

Modes (one process each): full hub shells unrank cast
  timeout 560 python benchmarks/probe_r3c.py full
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


N, E, F = 169_343, 1_166_243, 256


def setup():
    import dgl_tpu

    rng = np.random.default_rng(0)
    w = 1.0 / np.arange(1, N + 1)
    src = rng.choice(N, E, p=w / w.sum())
    dst = rng.integers(0, N, E)
    g = dgl_tpu.graph((src, dst), num_nodes=N)
    gp = g.with_spmm_plans(num_hubs=2048, precision="int8")
    x = jnp.asarray(rng.normal(size=(N, F)), jnp.float32)
    return gp, x


def chain(fn, x, iters=20):
    @jax.jit
    def run(x, kk):
        def body(i, c):
            return fn(c) * 1e-3 + c * 1e-6

        return jnp.sum(jax.lax.fori_loop(0, kk, body, x))

    def t(k):
        kk = jnp.int32(k)
        float(run(x, kk))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            float(run(x, kk))
            best = min(best, time.perf_counter() - t0)
        return best

    return (t(1 + iters) - t(1)) / iters


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "full"
    log("devices:", jax.devices())
    gp, x = setup()
    rel = gp._relation(None)
    plan = rel.hub_plan
    from dgl_tpu import ops
    from dgl_tpu.ops.hub_spmm import _mm, _shell_sum

    if mode == "full":
        dt = chain(lambda c: ops.copy_u_sum(gp, c), x)
        log(f"full gspmm: {dt*1e3:.3f} ms ({(E+N)*F*4/dt/1e9:.0f} GB/s)")
    elif mode == "hub":
        dt = chain(lambda c: _mm(plan.a_hub, c[plan.hub_ids],
                                 plan.precision), x)
        bytes_ = plan.a_hub.size
        log(f"hub matmul (incl hub gather): {dt*1e3:.3f} ms "
            f"(A_hub {bytes_/1e6:.0f} MB -> {bytes_/dt/1e9:.0f} GB/s)")
    elif mode == "shells":
        dt = chain(lambda c: _shell_sum(c, plan.shells, plan.res_dst,
                                        plan.unrank_dst, plan.num_dst,
                                        plan.cold), x)
        log(f"shell cold sum ({len(plan.shells)} shells, {plan.cold}): "
            f"{dt*1e3:.3f} ms")
    elif mode == "gathers":
        # shells' gathers+mask WITHOUT the accumulator slice-adds: each
        # shell reduced to a scalar (sum) so no DUS traffic
        def fn(c):
            xg = c.astype(jnp.bfloat16)
            tot = 0.0
            for idx, mask in plan.shells:
                rows = jnp.where(mask > 0, xg[idx].astype(jnp.float32), 0.0)
                tot = tot + rows.sum()
            return c[:1, :1] * 0 + tot

        dt = chain(fn, x)
        m = sum(int(i.shape[0]) for i, _ in plan.shells)
        log(f"shell gathers only ({m} rows): {dt*1e3:.3f} ms "
            f"= {dt/m*1e9:.2f} ns/row")
    elif mode == "dus":
        # the accumulator slice-adds WITHOUT gathers: add constant rows
        sizes = [int(i.shape[0]) for i, _ in plan.shells]
        n8 = max(sizes)

        def fn(c):
            acc = jnp.zeros((n8, c.shape[1]), jnp.float32)
            for m in sizes:
                acc = acc.at[:m].add(c[:m] * 1e-3)
            return acc

        dt = chain(fn, x)
        log(f"slice-adds only ({len(sizes)} shells, acc {n8} rows): "
            f"{dt*1e3:.3f} ms")
    elif mode == "unrank":
        unrank = plan.unrank_dst
        dt = chain(lambda c: jnp.take(c, unrank, axis=0), x)
        log(f"unrank gather (N={N} f32 rows): {dt*1e3:.3f} ms "
            f"= {dt/N*1e9:.2f} ns/row")
    elif mode == "cast":
        dt = chain(lambda c: c.astype(jnp.bfloat16).astype(jnp.float32), x)
        log(f"bf16 round-trip cast (N,F): {dt*1e3:.3f} ms")
    else:
        raise SystemExit(f"unknown mode {mode}")


if __name__ == "__main__":
    main()
