"""Random walks (reference ``python/dgl/sampling/randomwalks.py:11``,
C++ ``src/graph/sampling/randomwalks/``).

Walks are naturally fixed-shape — (num_seeds, length+1) — so they map
cleanly to the padded-array regime; -1 marks early termination like the
reference.
"""
from __future__ import annotations

from typing import Optional, Sequence

import numpy as np

from ..base import DGLError
from ..graph import Graph

__all__ = ["random_walk", "node2vec_random_walk", "pack_traces"]


def _np(x):
    return np.asarray(x)


def random_walk(
    g: Graph,
    nodes,
    *,
    metapath: Optional[Sequence] = None,
    length: Optional[int] = None,
    prob: Optional[str] = None,
    restart_prob: Optional[float] = None,
    return_eids: bool = False,
    seed: Optional[int] = None,
):
    """Metapath-based random walk (reference ``randomwalks.py:11``).

    Returns ``(traces, types)`` (+ ``eids`` if requested): traces is
    (num_seeds, len(metapath)+1) with -1 after termination; types is the
    node-type id sequence.
    """
    rng = np.random.default_rng(seed)
    nodes = np.atleast_1d(_np(nodes)).astype(np.int64)
    # native fast path: homogeneous uniform walks without restart/prob
    if (
        metapath is None
        and length is not None
        and prob is None
        and restart_prob is None
        and not return_eids
        and len(g.canonical_etypes) == 1
    ):
        from .. import _native

        rel = g._relation(None)
        res = _native.random_walk_uniform(
            *rel.host_arrays("csr_indptr", "csr_indices"), nodes, length,
            np.random.default_rng(seed).integers(2**63),
        )
        if res is not None:
            ntype_ids = {nt: i for i, nt in enumerate(g.ntypes)}
            types = np.zeros(length + 1, dtype=np.int64)
            return res, types

    if metapath is None:
        if len(g.canonical_etypes) > 1:
            raise DGLError("metapath required for heterographs")
        if length is None:
            raise DGLError("length required when metapath is None")
        metapath = [g.canonical_etypes[0]] * length
    cets = [g.to_canonical_etype(et) for et in metapath]
    # validate chain
    for a, b in zip(cets[:-1], cets[1:]):
        if a[2] != b[0]:
            raise DGLError(f"metapath discontinuity: {a} -> {b}")
    ntype_order = [cets[0][0]] + [c[2] for c in cets]
    ntype_ids = {nt: i for i, nt in enumerate(g.ntypes)}
    types = np.array([ntype_ids[nt] for nt in ntype_order], dtype=np.int64)

    L = len(cets)
    n = nodes.shape[0]
    traces = np.full((n, L + 1), -1, dtype=np.int64)
    eids = np.full((n, L), -1, dtype=np.int64)
    traces[:, 0] = nodes
    csr = {}
    for cet in set(cets):
        rel = g._relations[cet]
        csr[cet] = (
            rel.host_arrays("csr_indptr", "csr_indices", "csr_eids")
        )
    probs = {}
    if prob is not None:
        for cet in set(cets):
            frame = g._edge_frames.get(cet, {})
            if prob in frame:
                probs[cet] = _np(frame[prob]).astype(np.float64)
    for i in range(n):
        cur = int(nodes[i])
        for step, cet in enumerate(cets):
            if restart_prob is not None and rng.random() < restart_prob:
                break
            indptr, indices, es = csr[cet]
            lo, hi = int(indptr[cur]), int(indptr[cur + 1])
            deg = hi - lo
            if deg == 0:
                break
            if cet in probs:
                p = probs[cet][es[lo:hi]]
                tot = p.sum()
                if tot <= 0:
                    break
                j = rng.choice(deg, p=p / tot)
            else:
                j = rng.integers(0, deg)
            cur = int(indices[lo + j])
            traces[i, step + 1] = cur
            eids[i, step] = es[lo + j]
    if return_eids:
        return traces, types, eids
    return traces, types


def node2vec_random_walk(
    g: Graph, nodes, p: float, q: float, walk_length: int,
    prob: Optional[str] = None, seed: Optional[int] = None,
):
    """node2vec biased 2nd-order walk (reference
    ``node2vec_randomwalk.py:11``): return-param p, in-out-param q."""
    rng = np.random.default_rng(seed)
    nodes = np.atleast_1d(_np(nodes)).astype(np.int64)
    rel = g._relation(None)
    indptr, indices = rel.host_arrays("csr_indptr", "csr_indices")
    n = nodes.shape[0]
    traces = np.full((n, walk_length + 1), -1, dtype=np.int64)
    traces[:, 0] = nodes

    def neighbors(v):
        return indices[indptr[v] : indptr[v + 1]]

    for i in range(n):
        cur = int(nodes[i])
        prev = -1
        for step in range(walk_length):
            nbrs = neighbors(cur)
            if nbrs.size == 0:
                break
            if prev < 0:
                nxt = int(nbrs[rng.integers(0, nbrs.size)])
            else:
                prev_nbrs = set(map(int, neighbors(prev)))
                w = np.empty(nbrs.size, np.float64)
                for k, x in enumerate(nbrs):
                    xi = int(x)
                    if xi == prev:
                        w[k] = 1.0 / p
                    elif xi in prev_nbrs:
                        w[k] = 1.0
                    else:
                        w[k] = 1.0 / q
                w /= w.sum()
                nxt = int(nbrs[rng.choice(nbrs.size, p=w)])
            traces[i, step + 1] = nxt
            prev, cur = cur, nxt
    return traces


def pack_traces(traces, types):
    """Compact -1-padded traces (reference ``randomwalks.py`` ``pack_traces``).

    Returns (concat_vids, concat_types, lengths, offsets).
    """
    traces = _np(traces)
    types = _np(types)
    lengths = (traces >= 0).sum(axis=1).astype(np.int64)
    vids = []
    tps = []
    offsets = np.zeros(traces.shape[0], dtype=np.int64)
    off = 0
    for i in range(traces.shape[0]):
        L = int(lengths[i])
        offsets[i] = off
        vids.append(traces[i, :L])
        tps.append(types[:L])
        off += L
    return (
        np.concatenate(vids) if vids else np.zeros(0, np.int64),
        np.concatenate(tps) if tps else np.zeros(0, np.int64),
        lengths,
        offsets,
    )
