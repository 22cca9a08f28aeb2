"""Giant-graph tier assembled END TO END at 100M edges (round-3 verdict
ask #5 / SURVEY §5.7): every piece that existed separately, used
together for the first time —

  zipf degree-corrected 10M-node / 100M-edge graph
    -> k-way partition (distributed/partition.py, cached)
    -> dst-owner PartitionedGraphCSC + host neighbor sampling
       (distributed/dist_minibatch.py, native C picks)
    -> features OUT OF CORE on disk (5.1 GB .npy, DiskBasedFeature
       io="pread" — csrc batched_pread, file never mapped)
    -> HBMFeatureCache hot tier (top-degree rows device-resident;
       reference GPUCache analog, python/dgl/cuda/gpu_cache.py:24)
    -> 8-virtual-device train step (vmapped mean-agg SAGE, psum grads)

Records per-stage StageTimer shares (sample / feature-fetch / h2d /
train), the feature-fetch share BEFORE vs AFTER the HBM tier, cache hit
rate, and bytes moved per step, into docs/giant_tier_100m_r04.json.

Run (CPU virtual mesh):
  XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      python benchmarks/giant_tier_100m.py [--steps 16]
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

N, E, K, F, C = 10_000_000, 100_000_000, 8, 128, 16
CACHE_ROWS = 1_000_000
PARTS_CACHE = "/tmp/giant100m_parts.npy"
FEAT_PATH = "/tmp/giant100m_feat.npy"
GRAPH_CACHE = "/tmp/giant100m_edges.npz"


def log(*a):
    print(*a, flush=True)


def build_graph():
    if os.path.exists(GRAPH_CACHE):
        z = np.load(GRAPH_CACHE)
        return z["src"], z["dst"]
    rng = np.random.default_rng(21)
    labels = rng.integers(0, K, N).astype(np.int32)
    wz = 1.0 / np.arange(1, N + 1)
    rng.shuffle(wz)
    cw = np.cumsum(wz)
    cw /= cw[-1]
    src = np.searchsorted(cw, rng.random(E)).astype(np.int64)
    order = np.argsort(labels, kind="stable")
    lo = np.searchsorted(labels[order], np.arange(K + 1))
    cum = np.cumsum(wz[order])
    seg = np.concatenate(([0.0], cum))
    r = rng.random(E)
    t = (seg[lo[:-1]][labels[src]]
         + r * (seg[lo[1:]][labels[src]] - seg[lo[:-1]][labels[src]]))
    intra_dst = order[np.searchsorted(cum, t)]
    glob_dst = np.searchsorted(cw, rng.random(E)).astype(np.int64)
    dst = np.where(rng.random(E) < 0.9, intra_dst, glob_dst)
    keep = src != dst
    src, dst = src[keep], dst[keep]
    np.savez(GRAPH_CACHE, src=src, dst=dst)
    return src, dst


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=16)
    ap.add_argument("--batch", type=int, default=512)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    import dgl_tpu as dgl
    from dgl_tpu.distributed.dist_minibatch import (
        DistNeighborSampler, DistNodeDataLoader, PartitionedGraphCSC)
    from dgl_tpu.distributed.partition import (
        edge_cut, metis_partition_assignment)
    from dgl_tpu.graph import Graph, Relation
    from dgl_tpu.graphbolt import DiskBasedFeature
    from dgl_tpu.graphbolt.impl.hbm_cache import HBMFeatureCache
    from dgl_tpu.profiler import StageTimer

    P_ = min(8, len(jax.devices()))
    t0 = time.time()
    src, dst = build_graph()
    Ereal = src.shape[0]
    log(f"graph: N={N:,} E={Ereal:,} ({time.time()-t0:.0f}s)")

    rel = Relation.from_coo(src, dst, N, N, formats=("coo",),
                            to_device=False)
    g = Graph({("_N", "_E", "_N"): rel}, {"_N": N})

    # --- partition (the real partitioner; cached across runs) ----------
    t0 = time.time()
    if os.path.exists(PARTS_CACHE):
        parts = np.load(PARTS_CACHE)
        log(f"partition: cached ({time.time()-t0:.0f}s load)")
    else:
        parts = metis_partition_assignment(g, P_)
        np.save(PARTS_CACHE, parts)
        log(f"partition: {time.time()-t0:.0f}s")
    cut = int(edge_cut(g, parts))
    counts = np.bincount(parts, minlength=P_)
    log(f"cut fraction {cut/Ereal:.4f} balance "
        f"{counts.max()/counts.mean():.4f}")

    # --- out-of-core features -----------------------------------------
    t0 = time.time()
    if not os.path.exists(FEAT_PATH):
        rng = np.random.default_rng(1)
        feat_mm = np.lib.format.open_memmap(
            FEAT_PATH, mode="w+", dtype=np.float32, shape=(N, F))
        for lo_ in range(0, N, 1_000_000):
            hi = min(N, lo_ + 1_000_000)
            feat_mm[lo_:hi] = rng.normal(
                size=(hi - lo_, F)).astype(np.float32)
        feat_mm.flush()
        del feat_mm
        log(f"feature file written: "
            f"{N*F*4/1e9:.1f} GB ({time.time()-t0:.0f}s)")
    disk_feat = DiskBasedFeature(FEAT_PATH, io="pread")

    # --- graph CSC + loader -------------------------------------------
    t0 = time.time()
    pg = PartitionedGraphCSC.build(g, parts, P_)
    # frontier occupancy is proportional to OUT-degree (a node appears in
    # frontiers once per out-edge); seeds add a uniform + in-degree term.
    # Hot-set selection uses total degree (measured: an in-degree-only hot
    # set scored a 5.6% hit rate - BELOW the 10% uniform baseline)
    deg_tot = (np.bincount(dst, minlength=N)
               + np.bincount(src, minlength=N))
    log(f"PartitionedGraphCSC built ({time.time()-t0:.0f}s)")
    sampler = DistNeighborSampler(pg, [10, 10], batch_size=args.batch,
                                  seed=0)
    loader = DistNodeDataLoader(pg, np.arange(N), sampler,
                                batch_size=args.batch, shuffle=True)

    # hot tier keyed by NEW (part-major) ids: translate degrees
    deg_new = deg_tot[pg.order]

    # train step: vmapped 2-layer mean-agg + psum'd grads
    import optax

    rngj = jax.random.PRNGKey(0)
    w1 = jax.random.normal(rngj, (F, 64)) * 0.05
    w2 = jax.random.normal(jax.random.PRNGKey(1), (64, C)) * 0.1
    params = {"w1": w1, "w2": w2}
    labels_all = np.random.default_rng(3).integers(
        0, C, N).astype(np.int32)

    @jax.jit
    def train_step(params, x, blocks, y, ymask):
        def loss_fn(p):
            def fwd(blks, xx):
                from dgl_tpu import ops

                h = xx * blks[0].srcdata["_mask"][:, None]
                h = jax.nn.relu(ops.copy_u_mean(blks[0], h) @ p["w1"])
                return ops.copy_u_mean(blks[1], h) @ p["w2"]

            logits = jax.vmap(fwd)(blocks, x)
            ls = optax.softmax_cross_entropy_with_integer_labels(
                logits[:, : y.shape[1]], y)
            return (ls * ymask).sum() / jnp.maximum(ymask.sum(), 1)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        return (jax.tree_util.tree_map(lambda a, b: a - 0.05 * b,
                                       params, grads), loss)

    def run_epoch_steps(fetch_fn, tag, steps):
        timer = StageTimer()
        it = iter(loader)
        h2d_bytes = 0
        for s in range(steps):
            with timer.stage("sample"):
                in_ids, out_ids, blocks = next(it)
                ids_flat = np.asarray(in_ids).reshape(-1)
                # dedup: padding slots collapse to one row and power-law
                # hubs repeat heavily across frontiers (fetch unique rows
                # once, scatter back by inverse)
                uniq, inv = np.unique(ids_flat, return_inverse=True)
            with timer.stage("feature_fetch"):
                rows_u = fetch_fn(uniq)
                rows = np.asarray(rows_u)[inv]
            with timer.stage("h2d"):
                x = jnp.asarray(rows, jnp.float32).reshape(
                    in_ids.shape[0], in_ids.shape[1], F)
                y_ids = np.asarray(out_ids)
                y = jnp.asarray(
                    labels_all[pg.order[np.clip(y_ids, 0, N - 1)]])
                ymask = jnp.asarray((y_ids >= 0).astype(np.float32))
                h2d_bytes += (rows_u.nbytes
                              if hasattr(rows_u, "nbytes") else 0)
            with timer.stage("train"):
                nonlocal_params = run_epoch_steps.params
                nonlocal_params, loss = train_step(
                    nonlocal_params, x, blocks, y, ymask)
                run_epoch_steps.params = nonlocal_params
                float(loss)
        summ = timer.summary()
        total = sum(v["total_s"] for v in summ.values())
        shares = {k: round(v["total_s"] / total, 3)
                  for k, v in summ.items()}
        per_step = total / steps
        log(f"[{tag}] {per_step*1e3:.0f} ms/step shares={shares}")
        return {
            "ms_per_step": round(per_step * 1e3, 1),
            "stage_shares": shares,
            "stage_detail": summ,
            "fetch_bytes_per_step": int(h2d_bytes / steps),
        }

    run_epoch_steps.params = params

    # warmup (compile + thread pools)
    run_epoch_steps(lambda ids: disk_feat.read(pg.order[ids]), "warmup", 2)

    # A: disk only (every row pread from the 5.1 GB file)
    rec_disk = run_epoch_steps(
        lambda ids: disk_feat.read(pg.order[ids]), "disk-only",
        args.steps)

    # B: HBM hot tier in front (top-degree rows resident)
    class _OldIdFallback:
        """HBMFeatureCache speaks NEW ids; disk file is OLD-id order."""

        def read(self, ids=None):
            if ids is None:
                return disk_feat.read()
            return disk_feat.read(pg.order[np.asarray(ids)])

        def size(self):
            return disk_feat.size()

        def count(self):
            return disk_feat.count()

    cache = HBMFeatureCache.from_degrees(_OldIdFallback(), deg_new,
                                         CACHE_ROWS)
    rec_cache = run_epoch_steps(lambda ids: cache.read_batch(ids),
                                "hbm-cache", args.steps)
    hit_rate = cache.hit_rate()
    log(f"cache hit rate {hit_rate:.3f}")

    steps_per_epoch = N // (args.batch * P_)
    out = {
        "artifact": "giant_tier_100m_r04",
        "graph": {"N": N, "E": Ereal, "kind": "zipf-dcsbm"},
        "partition": {"k": P_, "cut_fraction": round(cut / Ereal, 4),
                      "balance": round(
                          float(counts.max() / counts.mean()), 4)},
        "pipeline": "partition -> host sample (native picks) -> pread "
                    "disk features -> HBM hot tier -> 8-dev vmapped "
                    "train (virtual mesh)",
        "batch_per_rank": args.batch,
        "fanouts": [10, 10],
        "feature_file_gb": round(N * F * 4 / 1e9, 2),
        "hbm_cache_rows": CACHE_ROWS,
        "cache_hit_rate": round(hit_rate, 4),
        "disk_only": rec_disk,
        "hbm_cached": rec_cache,
        "feature_fetch_share_before": rec_disk["stage_shares"].get(
            "feature_fetch"),
        "feature_fetch_share_after": rec_cache["stage_shares"].get(
            "feature_fetch"),
        "steps_per_epoch": steps_per_epoch,
        "epoch_s_extrapolated_cached": round(
            rec_cache["ms_per_step"] * steps_per_epoch / 1e3, 1),
        "note": "virtual CPU mesh: absolute times are harness-bound "
                "(see docs/scaling_r04.json harness factor); the "
                "artifact demonstrates the ASSEMBLED tier + the "
                "fetch-share shift from the HBM cache",
    }
    print(json.dumps(out), flush=True)
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "docs", "giant_tier_100m_r04.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
        f.write("\n")
    log(f"wrote {path}")


if __name__ == "__main__":
    main()
