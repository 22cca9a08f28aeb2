#!/usr/bin/env python
"""papers100M-scale partition: 111M nodes / 1.6B directed edges, k=16.

The flagship's offline step (docs/papers100m_flagship.md §2) at its
REAL scale — planted 16-community SBM with papers100M's exact node and
edge counts through the checkpointed kway path:

  - DGL_TPU_KWAY_WORKDIR: resumable per-level checkpoints (a partial
    run still yields the measured-per-level budget);
  - FULL refinement (stride 1): the stride-2 shortcut FAILED its 100M
    quality gate (cut ratio 1.5252 vs 1.0000 full-chain,
    docs/partition_100m_r05.json) and is not used. Disk budget for all
    ~11 level graphs is ~200 GB f32 — spilled compressed (scipy
    save_npz) under DGL_TPU_KWAY_WORKDIR;
  - native OpenMP kway_gains refinement (csrc, 24x the numpy loop).

Records wall time / balance / cut-vs-planted into
``docs/partition_1600m_r05.json``; per-level timings stream to stdout.

Run (hours): nohup python benchmarks/partition_1600m.py > log 2>&1 &
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax

jax.config.update("jax_platforms", "cpu")

from dgl_tpu.distributed.partition import (  # noqa: E402
    _enforce_balance,
    _kway_multilevel,
    _sym_adj,
    edge_cut,
)
from dgl_tpu.graph import Graph, Relation  # noqa: E402


def main():
    os.environ.setdefault("DGL_TPU_PARTITION_VERBOSE", "1")
    # /root, not /tmp: the driver wipes /tmp between sessions and the
    # workdir is the whole point (resumable multi-session run)
    os.environ.setdefault("DGL_TPU_KWAY_WORKDIR", "/root/kway_1600m")
    rng = np.random.default_rng(9)
    # ogbn-papers100M's published node/edge counts
    n, e, k = 111_059_956, 1_615_685_872, 16
    print(f"building planted {k}-community SBM: n={n:,} e={e:,}",
          flush=True)
    t0 = time.time()
    labels = rng.integers(0, k, n).astype(np.int32)
    order = np.argsort(labels, kind="stable").astype(np.int32)
    cs = np.searchsorted(labels[order], np.arange(k + 1))
    # int32 ids + CHUNKED generation: the vectorized one-shot build
    # holds ~85 GB of int64/f64 temporaries at this scale
    src = np.empty(e, np.int32)
    dst = np.empty(e, np.int32)
    planted = 0
    CH = 100_000_000
    for c0 in range(0, e, CH):
        c1 = min(e, c0 + CH)
        m = c1 - c0
        s = rng.integers(0, n, m).astype(np.int32)
        lo = cs[labels[s]]
        width = cs[labels[s] + 1] - lo
        intra = order[(lo + (rng.random(m) * width).astype(np.int64))
                      .astype(np.int64)]
        d = np.where(rng.random(m) < 0.9, intra,
                     rng.integers(0, n, m).astype(np.int32)
                     ).astype(np.int32)
        planted += int((labels[s] != labels[d]).sum())
        src[c0:c1] = s
        dst[c0:c1] = d
        del s, d, lo, width, intra
    del labels
    rel = Relation.from_coo(src, dst, n, n, formats=("coo",),
                            to_device=False)
    g = Graph({("_N", "_E", "_N"): rel}, {"_N": n})
    del src, dst
    t_build = time.time() - t0
    print(f"built in {t_build:.0f}s; planted cut {planted:,}", flush=True)

    t0 = time.time()
    adj = _sym_adj(g)
    print(f"sym_adj {time.time()-t0:.0f}s nnz={adj.nnz:,}", flush=True)
    w = np.ones(n)
    parts = _kway_multilevel(adj, w, k)
    parts = _enforce_balance(adj, parts, w, k)
    t_part = time.time() - t0
    counts = np.bincount(parts, minlength=k)
    balance = float(counts.max() / counts.mean())
    cut = int(edge_cut(g, parts))
    out = {
        "artifact": "partition_1600m_r05",
        "n_nodes": n,
        "n_edges": e,
        "k": k,
        "partition_seconds": round(t_part, 1),
        "balance": round(balance, 4),
        "edge_cut": cut,
        "planted_cut": planted,
        "cut_ratio_vs_planted": round(cut / max(planted, 1), 4),
        "build_seconds": round(t_build, 1),
        "refine_stride": int(os.environ.get(
            "DGL_TPU_KWAY_REFINE_STRIDE", "1")),
        "host": "4-core CPU, OpenMP aggregate_csr + kway_gains",
    }
    print(json.dumps(out), flush=True)
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "docs", "partition_1600m_r05.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
        f.write("\n")
    print("wrote", path, flush=True)


if __name__ == "__main__":
    main()
