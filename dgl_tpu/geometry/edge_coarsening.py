"""Neighbor matching / edge coarsening (reference
``python/dgl/geometry/edge_coarsening.py:9``, C++ ``src/geometry/``):
greedy maximal matching for graclus-style pooling."""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

__all__ = ["neighbor_matching"]


def neighbor_matching(graph, e_weights=None, relabel_idx: bool = True):
    """Greedy heavy-edge matching; returns per-node cluster ids.

    Host-side (sequential greedy is inherently serial; the reference's C++
    does the same single-threaded pass).
    """
    rel = graph._relation(None)
    n = graph.num_nodes()
    src = np.asarray(rel.src)[: rel.num_edges]
    dst = np.asarray(rel.dst)[: rel.num_edges]
    if e_weights is not None:
        w = np.asarray(e_weights)
        order = np.argsort(-w)
    else:
        order = np.arange(src.shape[0])
    matched = np.full(n, -1, dtype=np.int64)
    for e in order:
        u, v = int(src[e]), int(dst[e])
        if u == v or matched[u] >= 0 or matched[v] >= 0:
            continue
        matched[u] = u
        matched[v] = u
    unmatched = matched < 0
    matched[unmatched] = np.nonzero(unmatched)[0]
    if relabel_idx:
        _, relabeled = np.unique(matched, return_inverse=True)
        return jnp.asarray(relabeled)
    return jnp.asarray(matched)
