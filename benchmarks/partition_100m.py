#!/usr/bin/env python
"""100M-edge partition artifact (VERDICT r2 #4 close-out).

Builds a planted 8-community SBM with 100M edges (the planted partition
is the METIS stand-in: METIS recovers planted cuts at this signal level,
see tests/test_distributed.py::test_metis_planted_cut_1m_edges), runs the
native multilevel k-way partitioner (reference counterpart:
``src/graph/metis_partition.cc`` + ``tools/distpartitioning``), and
records wall time / balance / cut-vs-planted into
``docs/partition_100m_r03.json``.

Run:  nice -n 10 python benchmarks/partition_100m.py
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax

jax.config.update("jax_platforms", "cpu")

import dgl_tpu as dgl
from dgl_tpu.distributed.partition import (
    edge_cut,
    metis_partition_assignment,
)


def main():
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
    from dgl_tpu.graph import Graph, Relation

    rel = Relation.from_coo(
        src, dst, n, n, formats=("coo",), to_device=False
    )
    g = Graph({("_N", "_E", "_N"): rel}, {"_N": n})
    t_build = time.time() - t0
    print(f"built in {t_build:.0f}s; planted cut {planted:,}", flush=True)

    t0 = time.time()
    parts = metis_partition_assignment(g, k)
    t_part = time.time() - t0
    counts = np.bincount(parts, minlength=k)
    balance = float(counts.max() / counts.mean())
    cut = int(edge_cut(g, parts))
    out = {
        "artifact": "partition_100m_r03",
        "n_nodes": n,
        "n_edges": e,
        "k": k,
        "partition_seconds": round(t_part, 1),
        "balance": round(balance, 4),
        "edge_cut": cut,
        "planted_cut": planted,
        "cut_ratio_vs_planted": round(cut / max(planted, 1), 4),
        "build_seconds": round(t_build, 1),
        "host": "4-core CPU, single-thread partitioner",
    }
    print(json.dumps(out), flush=True)
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "docs",
        "partition_100m_r03.json",
    )
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {path}", flush=True)


if __name__ == "__main__":
    main()
