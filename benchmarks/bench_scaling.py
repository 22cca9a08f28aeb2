"""Scaling-efficiency harness (the BASELINE north star: >=80% edges/s
scaling efficiency 1 -> N shards for partition-parallel training).

Measures the halo-exchange SpMM's edges/s on a 1-device "mesh" vs the full
mesh. On real multi-chip hardware this measures ICI overlap quality; on the
virtual CPU mesh it validates the harness itself. One JSON line per mesh
size.
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import argparse
import json
import time

import numpy as np


def per_iter_time(run, iters=5, reps=3):
    """Per-iteration time of ``run(k)`` (a k-chained jit program), robust
    to scheduler noise: median over ``reps`` timings of both the long and
    the short program, differenced to cancel the constant dispatch
    overhead (``block_until_ready`` is a no-op on the axon platform, so
    programs are timed by fetching their scalar result).

    The round-4 artifact serialized NEGATIVE per-iteration times because
    a single ``timed(1+iters) - timed(1)`` pair under host contention can
    invert; this helper takes medians and ASSERTS positivity — retrying
    with doubled reps, then raising rather than recording an absurd value.
    """
    import statistics

    run(1)          # compile the short program
    run(1 + iters)  # compile the long program
    for attempt in range(3):
        r = reps * (attempt + 1)
        longs, shorts = [], []
        for _ in range(r):
            t0 = time.perf_counter()
            run(1 + iters)
            longs.append(time.perf_counter() - t0)
            t0 = time.perf_counter()
            run(1)
            shorts.append(time.perf_counter() - t0)
        dt = (statistics.median(longs) - statistics.median(shorts)) / iters
        if dt > 0:
            return dt
    raise RuntimeError(
        f"non-positive per-iteration time ({dt * 1e3:.3f} ms) after "
        f"retries — host too contended to measure; rerun uncontended")


def bench_mesh(g, n_dev, feat_dim, iters=5):
    import jax
    import jax.numpy as jnp

    import dgl_tpu.distributed as dist
    from dgl_tpu.distributed.dist_spmm import shard_arrays
    from dgl_tpu.parallel import create_mesh

    devices = jax.devices()[:n_dev]
    mesh = create_mesh((n_dev,), ("gp",), devices=devices)
    parts = (
        dist.metis_partition_assignment(g, n_dev)
        if n_dev > 1
        else np.zeros(g.num_nodes(), np.int64)
    )
    shards = dist.build_shards(g, parts, n_dev)
    tables = shard_arrays(mesh, shards)
    rng = np.random.default_rng(0)
    x = shards.shard_features(
        rng.normal(size=(g.num_nodes(), feat_dim)).astype(np.float32)
    )

    @jax.jit
    def chained(x, k):
        def body(_, h):
            return dist.dist_copy_u_sum(mesh, shards, h, tables=tables) * 1e-3
        return jnp.sum(jax.lax.fori_loop(0, k, body, x))

    dt = per_iter_time(lambda k: float(chained(x, k)), iters=iters)
    return dt, shards


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--num-nodes", type=int, default=100_000)
    p.add_argument("--num-edges", type=int, default=1_000_000)
    p.add_argument("--feat", type=int, default=128)
    p.add_argument("--out", default=None, help="write JSON artifact")
    args = p.parse_args()

    import jax

    if _os.environ.get("DGL_TPU_FORCE_CPU"):
        jax.config.update("jax_platforms", "cpu")

    import dgl_tpu as dgl

    rng = np.random.default_rng(0)
    g = dgl.graph(
        (rng.integers(0, args.num_nodes, args.num_edges),
         rng.integers(0, args.num_nodes, args.num_edges)),
        num_nodes=args.num_nodes,
    )
    E = g.num_edges()
    n_avail = len(jax.devices())
    sizes = [n for n in (1, 2, 4, 8) if n <= n_avail]
    records = []
    base_dt = None
    for n_dev in sizes:
        dt, shards = bench_mesh(g, n_dev, args.feat)
        eps = E / dt
        if base_dt is None:
            base_dt = dt
            eff = 1.0
        else:
            eff = (base_dt / dt) / n_dev
        rec = {
            "bench": "dist_spmm_scaling",
            "n_devices": n_dev,
            "edges_per_s": round(eps),
            "edges_per_s_per_device": round(eps / n_dev),
            "ms_per_iter": round(dt * 1e3, 2),
            "scaling_efficiency": round(eff, 3),
            "h_max": shards.h_max,
        }
        records.append(rec)
        print(json.dumps(rec), flush=True)

    for n_dev in sizes:
        dt, edges = bench_minibatch_mesh(g, n_dev)
        rec = {
            "bench": "dist_minibatch_scaling",
            "n_devices": n_dev,
            "edges_per_s": round(edges / dt),
            "ms_per_step": round(dt * 1e3, 2),
        }
        if n_dev == 1:
            base = rec["edges_per_s"]
        rec["scaling_efficiency"] = round(
            rec["edges_per_s"] / (base * n_dev), 3)
        records.append(rec)
        print(json.dumps(rec), flush=True)

    if args.out:
        import platform

        with open(args.out, "w") as f:
            json.dump({
                "device": str(jax.devices()[0].device_kind),
                "virtual_mesh": jax.devices()[0].platform == "cpu",
                "graph": {"N": args.num_nodes, "E": E, "feat": args.feat},
                "records": records,
            }, f, indent=1)


def bench_minibatch_mesh(g, n_dev, iters=8):
    """Weak-scaling of the distributed minibatch step: the on-device
    sampler + DeviceSAGE train step with the seed batch sharded over the
    mesh (each device keeps a constant per-device batch of 128 — weak
    scaling), params replicated (grad psum crosses the mesh)."""
    import jax
    import jax.numpy as jnp
    import optax
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from dgl_tpu.models import DeviceSAGE
    from dgl_tpu.sampling import DeviceNeighborSampler

    B = 128 * n_dev
    mesh = Mesh(np.array(jax.devices()[:n_dev]).reshape(n_dev), ("dp",))
    rel = g._relation(None)
    indptr = rel.csc_indptr.astype(jnp.int32)
    indices = rel.csc_indices.astype(jnp.int32)
    n = g.num_nodes()
    rng = np.random.default_rng(0)
    feats = jnp.asarray(rng.normal(size=(n, 64)), jnp.float32)
    labels = jnp.asarray(rng.integers(0, 16, n), jnp.int32)
    sampler = DeviceNeighborSampler([5, 5])
    model = DeviceSAGE(64, 64, 16, num_layers=2)
    seeds0 = jnp.arange(B, dtype=jnp.int32)
    mfg0 = sampler.sample(jax.random.PRNGKey(0), indptr, indices, seeds0)
    params = model.init(jax.random.PRNGKey(1), mfg0,
                        feats[mfg0.input_nodes()])
    tx = optax.sgd(1e-3)
    opt0 = tx.init(params)
    rep = NamedSharding(mesh, P())
    shd = NamedSharding(mesh, P("dp"))
    params = jax.device_put(params, rep)
    opt0 = jax.device_put(opt0, rep)
    seeds_g = jax.device_put(seeds0, shd)

    @jax.jit
    def steps(params, opt, seeds, k):
        def body(i, carry):
            params, opt = carry
            mfg = sampler.sample(jax.random.fold_in(jax.random.PRNGKey(3), i),
                                 indptr, indices, seeds)

            def loss_fn(p):
                logits = model.apply(p, mfg, feats[mfg.input_nodes()])
                return optax.softmax_cross_entropy_with_integer_labels(
                    logits, labels[seeds]).mean()

            _, grads = jax.value_and_grad(loss_fn)(params)
            upd, opt = tx.update(grads, opt)
            return optax.apply_updates(params, upd), opt

        params, opt = jax.lax.fori_loop(0, k, body, (params, opt))
        return jnp.sum(params["params"]["sage1_bias"])

    dt = per_iter_time(
        lambda k: float(steps(params, opt0, seeds_g, jnp.int32(k))),
        iters=iters)
    edges_per_step = B * 5 + B * 6 * 5  # upper bound; constant across sizes
    return dt, edges_per_step


if __name__ == "__main__":
    main()
