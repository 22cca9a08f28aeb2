#!/usr/bin/env python
"""Hub-cache Pallas SpMM vs the XLA gather path on a power-law graph.

Timing protocol as in bench.py (axon: block_until_ready is a no-op, so use
a chained fori_loop with dynamic trip count + scalar fetch, k2-vs-k1
differencing). Run under `timeout`; fresh Pallas compile — keep it the only
compile in flight (the remote compile service wedges under load).

Usage: python benchmarks/bench_hub.py [--hubs 1024] [--feat 256] [--cpu]
"""
import argparse
import sys
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--hubs", type=int, default=1024)
    ap.add_argument("--feat", type=int, default=256)
    ap.add_argument("--nodes", type=int, default=169343)
    ap.add_argument("--edges", type=int, default=1166243)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--dtype", default="float32")
    ap.add_argument("--precision", default="highest")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    import jax.numpy as jnp
    import numpy as np

    sys.path.insert(0, __file__.rsplit("/", 2)[0])
    import dgl_tpu
    from dgl_tpu import ops
    from dgl_tpu.ops.pallas_hub import HubPlan, hub_gather

    interpret = args.cpu
    N, E, F = args.nodes, args.edges, args.feat
    rng = np.random.default_rng(0)
    p = 1.0 / np.arange(1, N + 1)
    p /= p.sum()
    src = rng.choice(N, size=E, p=p)
    dst = rng.integers(0, N, E)
    g = dgl_tpu.graph((src, dst), num_nodes=N)
    rel = g._relation(None)
    plan = HubPlan.build(rel, args.hubs)
    print(f"hub coverage at H={plan.num_hubs}: {plan.coverage:.3f}",
          flush=True)
    dt = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    x = jnp.asarray(rng.normal(size=(N, F)), dt)

    Ep = plan.num_edges_padded

    def hub_step(x):
        hub_x = x[plan.hub_ids]
        msgs = hub_gather(hub_x, plan.slots, interpret=interpret,
                          precision=args.precision)
        out_hub = jax.ops.segment_sum(
            msgs[:Ep], rel.csc_dst, num_segments=rel.num_dst,
            indices_are_sorted=True,
        )
        cold = x[plan.cold_src]
        out_cold = jax.ops.segment_sum(
            cold, plan.cold_dst, num_segments=rel.num_dst,
            indices_are_sorted=True,
        )
        return out_hub + out_cold

    def xla_step(x):
        return ops.copy_u_sum(g, x)

    def timed(step, label):
        @jax.jit
        def loop(x, k):
            def body(i, x):
                out = step(x)
                # feed output back so XLA cannot hoist the op
                return x * (1 + out[0, 0].astype(x.dtype) * 1e-20)

            return jax.lax.fori_loop(0, k, body, x)

        # correctness first
        got = np.asarray(step(x), np.float32)
        want = np.asarray(xla_step(x), np.float32)
        err = float(np.max(np.abs(got - want))) / max(
            1e-9, float(np.max(np.abs(want)))
        )
        ks = (2, 12) if not args.cpu else (1, 3)
        t = {}
        for k in ks:
            float(loop(x, k)[0, 0])  # warm
            t0 = time.perf_counter()
            float(loop(x, k)[0, 0])
            t[k] = time.perf_counter() - t0
        ms = (t[ks[1]] - t[ks[0]]) / (ks[1] - ks[0]) * 1e3
        bw = (E * F * x.dtype.itemsize * 2 + N * F * x.dtype.itemsize) / (
            ms / 1e3
        ) / 1e9
        print(
            f"{label}: {ms:.3f} ms/iter, eff {bw:.1f} GB/s, relerr {err:.2e}",
            flush=True,
        )
        return ms

    ms_x = timed(xla_step, f"xla gather+segsum   (F={F} {args.dtype})")
    ms_h = timed(hub_step, f"hub H={plan.num_hubs} pallas+cold (F={F} {args.dtype} {args.precision})")
    print(f"speedup: {ms_x / ms_h:.3f}x", flush=True)


if __name__ == "__main__":
    main()
