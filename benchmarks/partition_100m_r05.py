#!/usr/bin/env python
"""100M-edge STRIDE-2 quality gate (round-5): the 1.6B recipe's chain
at a scale with a trusted full-chain baseline.

Same planted 8-community SBM as ``partition_100m.py`` (seed 7 — the
graph behind ``docs/partition_100m_r03.json``: full chain, 2239 s, cut
ratio 1.0000). This run flips on exactly the two round-5 scale levers
the 1.6B plan uses:

  - ``DGL_TPU_KWAY_REFINE_STRIDE=2`` (refine every other level, project
    through the rest — halves refinement wall AND the spill footprint);
  - native OpenMP ``kway_gains`` refinement (csrc).

If the stride-2 cut ratio stays ~1.0 here, the stride's 1M deep-chain
gate generalizes to the 100M class and the 500M/1.6B runs inherit a
quality-gated chain. Writes ``docs/partition_100m_r05.json``.

Run: python benchmarks/partition_100m_r05.py
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
    os.environ.setdefault("DGL_TPU_KWAY_REFINE_STRIDE", "2")
    os.environ.setdefault("DGL_TPU_KWAY_WORKDIR", "/root/kway_100m_r05")
    os.makedirs(os.environ["DGL_TPU_KWAY_WORKDIR"], exist_ok=True)
    rng = np.random.default_rng(7)
    n, e, k = 10_000_000, 100_000_000, 8
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
        "artifact": "partition_100m_r05",
        "chain": "refine-stride 2 + native OpenMP kway_gains "
                 "(the 500M/1.6B recipe)",
        "n_nodes": n,
        "n_edges": e,
        "k": k,
        "partition_seconds": round(t_part, 1),
        "balance": round(balance, 4),
        "edge_cut": cut,
        "planted_cut": planted,
        "cut_ratio_vs_planted": round(cut / max(planted, 1), 4),
        "build_seconds": round(t_build, 1),
        "baseline_full_chain": {
            "artifact": "docs/partition_100m_r03.json",
            "partition_seconds": 2239.2,
            "cut_ratio_vs_planted": 1.0,
            "note": "same graph, stride 1, numpy refinement",
        },
        "host": "4-core CPU; a SIGSTOPped 500M job held RAM but no CPU",
    }
    print(json.dumps(out), flush=True)
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "docs",
        "partition_100m_r05.json",
    )
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
        f.write("\n")
    print(f"wrote {path}", flush=True)


if __name__ == "__main__":
    main()
