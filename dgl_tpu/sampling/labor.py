"""LABOR sampling (reference ``python/dgl/sampling/labor.py:32``,
C++ ``src/array/cpu/labor_pick.h``, arXiv:2210.13339).

LABOR-0: neighbor u of seed t is kept iff ``r_u <= c_t`` where ``r_u`` is a
per-*source-node* uniform random (shared across all seeds in the layer —
this is the variance-reduction trick: overlapping neighborhoods pick the
same sources, maximizing dedup) and ``c_t = fanout / degree(t)`` so the
expected pick count is the fanout.
"""
from __future__ import annotations

from typing import Optional

import numpy as np

from ..base import DGLError, EID
from ..graph import Graph

__all__ = ["sample_labors"]


def sample_labors(
    g: Graph,
    nodes,
    fanout,
    edge_dir: str = "in",
    prob: Optional[str] = None,
    importance_sampling: int = 0,
    random_seed: Optional[int] = None,
    copy_ndata: bool = True,
    copy_edata: bool = True,
):
    """Layer-dependent neighbor sampling. Returns (subgraph, importances).

    Reference API ``labor.py:32``; the returned edge subgraph keeps the
    original node space like ``sample_neighbors``.
    """
    from ..subgraph import edge_subgraph

    if edge_dir != "in":
        raise NotImplementedError("labor sampling supports edge_dir='in'")
    if not isinstance(nodes, dict):
        if len(g.ntypes) != 1:
            raise DGLError("node dict required for heterographs")
        nodes = {g.ntypes[0]: nodes}
    rng = np.random.default_rng(random_seed)
    edges = {}
    importances = []
    for cet in g.canonical_etypes:
        st, _, dt = cet
        rel = g._relations[cet]
        f = fanout[cet] if isinstance(fanout, dict) else fanout
        seeds = np.atleast_1d(np.asarray(nodes.get(dt, []))).astype(np.int64)
        indptr = np.asarray(rel.csc_indptr)
        indices = np.asarray(rel.csc_indices)
        eids = np.asarray(rel.csc_eids)
        # one uniform per source node, shared across seeds (the LABOR trick)
        r = rng.random(rel.num_src)
        picked = []
        imp = []
        w_all = None
        if prob is not None:
            frame = g._edge_frames.get(cet, {})
            if prob in frame:
                w_all = np.asarray(frame[prob]).astype(np.float64)
        for t in seeds:
            lo, hi = int(indptr[t]), int(indptr[t + 1])
            deg = hi - lo
            if deg == 0:
                continue
            row_src = indices[lo:hi]
            row_eid = eids[lo:hi]
            if f < 0 or deg <= f:
                picked.append(row_eid)
                imp.append(np.ones(deg))
                continue
            if w_all is not None:
                w = w_all[row_eid]
                w = w / w.sum()
                # c solves sum min(1, c*w_u*deg_factor) = f; bisect
                lo_c, hi_c = 0.0, 1e18
                for _ in range(64):
                    mid = 0.5 * (lo_c + hi_c)
                    if np.minimum(1.0, mid * w).sum() < f:
                        lo_c = mid
                    else:
                        hi_c = mid
                pi = np.minimum(1.0, hi_c * w)
            else:
                pi = np.full(deg, f / deg)
            keep = r[row_src] <= pi
            picked.append(row_eid[keep])
            imp.append(1.0 / np.maximum(pi[keep], 1e-12))
        edges[cet] = (
            np.concatenate(picked) if picked else np.zeros(0, np.int64)
        )
        importances.append(
            np.concatenate(imp) if imp else np.zeros(0)
        )
    sub = edge_subgraph(g, edges, relabel_nodes=False, store_ids=True)
    if not copy_ndata:
        for nt in sub.ntypes:
            sub._node_frames[nt] = {}
    if not copy_edata:
        for cet in sub.canonical_etypes:
            sub._edge_frames[cet] = {EID: sub._edge_frames[cet][EID]}
    return sub, importances
