#!/usr/bin/env python
"""500M-edge partition artifact v2 (round-5: checkpointed + instrumented).

Planted 16-community SBM at 50M nodes / 500M edges through the
coarsen-once k-way path (OpenMP aggregate_csr coarsening). Records wall
time / balance / cut-vs-planted into ``docs/partition_500m_r05.json``.

Run (long; ~1-2 h):  nohup python benchmarks/partition_500m.py &
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
    os.environ.setdefault("DGL_TPU_KWAY_WORKDIR", "/tmp/kway_500m")
    rng = np.random.default_rng(9)
    n, e, k = 50_000_000, 500_000_000, 16
    print(f"building planted {k}-community SBM: n={n:,} e={e:,}", flush=True)
    t0 = time.time()
    labels = rng.integers(0, k, n).astype(np.int32)
    src = rng.integers(0, n, e)
    intra = rng.random(e) < 0.9
    order = np.argsort(labels, kind="stable")
    cs = np.searchsorted(labels[order], np.arange(k + 1))
    lo = cs[labels[src]]
    width = cs[labels[src] + 1] - lo
    dst = np.where(
        intra,
        order[lo + (rng.random(e) * width).astype(np.int64)],
        rng.integers(0, n, e),
    )
    planted = int((labels[src] != labels[dst]).sum())
    del intra, lo, width, order, cs
    rel = Relation.from_coo(src, dst, n, n, formats=("coo",),
                            to_device=False)
    g = Graph({("_N", "_E", "_N"): rel}, {"_N": n})
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
        "artifact": "partition_500m_r05",
        "n_nodes": n,
        "n_edges": e,
        "k": k,
        "partition_seconds": round(t_part, 1),
        "balance": round(balance, 4),
        "edge_cut": cut,
        "planted_cut": planted,
        "cut_ratio_vs_planted": round(cut / max(planted, 1), 4),
        "build_seconds": round(t_build, 1),
        "host": "4-core CPU, OpenMP aggregate_csr coarsening",
    }
    print(json.dumps(out), flush=True)
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "docs",
        "partition_500m_r05.json",
    )
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
        f.write("\n")
    print(f"wrote {path}", flush=True)


if __name__ == "__main__":
    main()
