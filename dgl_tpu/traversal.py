"""Graph traversal frontiers (reference ``python/dgl/traversal.py``,
C++ ``src/graph/traversal.cc``, ``src/array/cpu/traversal.h``).

Host-side (numpy) by design: traversal orders are data-dependent ragged
structures used to *schedule* propagation (``prop_nodes_bfs`` etc.), so they
are computed once on host and the resulting per-frontier index arrays feed
fixed-shape device steps.
"""
from __future__ import annotations

from typing import List

import numpy as np

from .base import DGLError

__all__ = [
    "bfs_nodes_generator",
    "bfs_edges_generator",
    "topological_nodes_generator",
    "dfs_edges_generator",
    "dfs_labeled_edges_generator",
]


def _csr(g, reverse: bool):
    rel = g._relation(None)
    if reverse:
        indptr = np.asarray(rel.csc_indptr)
        indices = np.asarray(rel.csc_indices)
        eids = np.asarray(rel.csc_eids)
    else:
        indptr = np.asarray(rel.csr_indptr)
        indices = np.asarray(rel.csr_indices)
        eids = np.asarray(rel.csr_eids)
    return indptr, indices, eids


def bfs_nodes_generator(graph, source, reversed=False) -> List[np.ndarray]:
    """Node frontiers of a BFS (reference ``traversal.py:12``)."""
    indptr, indices, _ = _csr(graph, reversed)
    n = indptr.shape[0] - 1
    visited = np.zeros(n, dtype=bool)
    frontier = np.atleast_1d(np.asarray(source, dtype=np.int64))
    visited[frontier] = True
    layers = []
    while frontier.size:
        layers.append(frontier)
        nxt = []
        for u in frontier:
            for v in indices[indptr[u] : indptr[u + 1]]:
                if not visited[v]:
                    visited[v] = True
                    nxt.append(v)
        frontier = np.array(sorted(set(nxt)), dtype=np.int64)
    return layers


def bfs_edges_generator(graph, source, reversed=False) -> List[np.ndarray]:
    """Edge frontiers of a BFS (reference ``traversal.py:54``)."""
    indptr, indices, eids = _csr(graph, reversed)
    n = indptr.shape[0] - 1
    visited = np.zeros(n, dtype=bool)
    frontier = np.atleast_1d(np.asarray(source, dtype=np.int64))
    visited[frontier] = True
    layers = []
    while frontier.size:
        nxt, edges = [], []
        for u in frontier:
            for off in range(indptr[u], indptr[u + 1]):
                v = indices[off]
                if not visited[v]:
                    visited[v] = True
                    nxt.append(v)
                    edges.append(eids[off])
        if edges:
            layers.append(np.array(edges, dtype=np.int64))
        frontier = np.array(nxt, dtype=np.int64)
    return layers


def topological_nodes_generator(graph, reversed=False) -> List[np.ndarray]:
    """Topological frontiers (reference ``traversal.py:97``)."""
    indptr, indices, _ = _csr(graph, reversed)
    n = indptr.shape[0] - 1
    indeg = np.zeros(n, dtype=np.int64)
    for u in range(n):
        for v in indices[indptr[u] : indptr[u + 1]]:
            indeg[v] += 1
    frontier = np.nonzero(indeg == 0)[0]
    layers = []
    seen = 0
    while frontier.size:
        layers.append(frontier)
        seen += frontier.size
        nxt = []
        for u in frontier:
            for v in indices[indptr[u] : indptr[u + 1]]:
                indeg[v] -= 1
                if indeg[v] == 0:
                    nxt.append(v)
        frontier = np.array(nxt, dtype=np.int64)
    if seen != n:
        raise DGLError("Graph has cycles; topological traversal undefined")
    return layers


def dfs_edges_generator(graph, source, reversed=False) -> List[np.ndarray]:
    """DFS edge frontiers, one edge per step (reference ``traversal.py:146``)."""
    indptr, indices, eids = _csr(graph, reversed)
    n = indptr.shape[0] - 1
    visited = np.zeros(n, dtype=bool)
    out = []
    for s in np.atleast_1d(np.asarray(source, dtype=np.int64)):
        if visited[s]:
            continue
        visited[s] = True
        stack = [(int(s), int(indptr[s]))]
        while stack:
            u, off = stack[-1]
            if off >= indptr[u + 1]:
                stack.pop()
                continue
            stack[-1] = (u, off + 1)
            v = indices[off]
            if not visited[v]:
                visited[v] = True
                out.append(eids[off])
                stack.append((int(v), int(indptr[v])))
    return [np.array([e], dtype=np.int64) for e in out]


def dfs_labeled_edges_generator(
    graph, source, reversed=False, has_reverse_edge=False, has_nontree_edge=False
):
    """DFS with FORWARD/REVERSE/NONTREE labels (reference ``traversal.py:181``)."""
    FORWARD, REVERSE, NONTREE = 0, 1, 2
    indptr, indices, eids = _csr(graph, reversed)
    visited = np.zeros(indptr.shape[0] - 1, dtype=bool)
    edges, labels = [], []
    for s in np.atleast_1d(np.asarray(source, dtype=np.int64)):
        if visited[s]:
            continue
        visited[s] = True
        stack = [(int(s), int(indptr[s]), -1)]
        while stack:
            u, off, ein = stack[-1]
            if off >= indptr[u + 1]:
                if has_reverse_edge and ein >= 0:
                    edges.append(ein)
                    labels.append(REVERSE)
                stack.pop()
                continue
            stack[-1] = (u, off + 1, ein)
            v = indices[off]
            if not visited[v]:
                visited[v] = True
                edges.append(eids[off])
                labels.append(FORWARD)
                stack.append((int(v), int(indptr[v]), int(eids[off])))
            elif has_nontree_edge:
                edges.append(eids[off])
                labels.append(NONTREE)
    return (
        [np.array([e], dtype=np.int64) for e in edges],
        [np.array([l], dtype=np.int64) for l in labels],
    )
