"""Homophily measures (reference ``python/dgl/homophily.py``) and label
informativeness (reference ``python/dgl/label_informativeness.py``)."""
from __future__ import annotations

import numpy as np

from .graph import Graph

__all__ = [
    "node_homophily",
    "edge_homophily",
    "linkx_homophily",
    "adjusted_homophily",
    "edge_label_informativeness",
    "node_label_informativeness",
]


def _edges(g: Graph):
    rel = g._relation(None)
    E = rel.num_edges
    return (
        np.asarray(rel.src)[:E],
        np.asarray(rel.dst)[:E],
    )


def node_homophily(graph: Graph, y) -> float:
    """Mean over nodes of the same-label fraction of in-neighbors
    (reference ``homophily.py:34``)."""
    y = np.asarray(y)
    src, dst = _edges(graph)
    n = graph.num_nodes()
    same = (y[src] == y[dst]).astype(np.float64)
    num = np.zeros(n)
    den = np.zeros(n)
    np.add.at(num, dst, same)
    np.add.at(den, dst, 1.0)
    has = den > 0
    return float((num[has] / den[has]).sum() / n)


def edge_homophily(graph: Graph, y) -> float:
    """Fraction of edges connecting same-label nodes (reference
    ``homophily.py:86``)."""
    y = np.asarray(y)
    src, dst = _edges(graph)
    if src.size == 0:
        return 0.0
    return float((y[src] == y[dst]).mean())


def linkx_homophily(graph: Graph, y) -> float:
    """LINKX class-adjusted homophily (reference ``homophily.py:131``):
    mean over classes of max(0, h_k - |C_k|/n)."""
    y = np.asarray(y)
    src, dst = _edges(graph)
    n = graph.num_nodes()
    C = int(y.max()) + 1
    deg = np.zeros(n)
    same = np.zeros(n)
    np.add.at(deg, dst, 1.0)
    np.add.at(same, dst, (y[src] == y[dst]).astype(np.float64))
    val = 0.0
    for k in range(C):
        mask = (y == k) & (deg > 0)
        if mask.sum() == 0:
            continue
        hk = (same[mask] / deg[mask]).mean()
        val += max(0.0, hk - mask.sum() / n)
    return float(val / C)


def adjusted_homophily(graph: Graph, y) -> float:
    """Degree-corrected homophily (reference ``homophily.py:197``)."""
    y = np.asarray(y)
    src, dst = _edges(graph)
    E = src.size
    if E == 0:
        return 0.0
    h_edge = float((y[src] == y[dst]).mean())
    C = int(y.max()) + 1
    deg = np.zeros(graph.num_nodes())
    np.add.at(deg, dst, 1.0)
    np.add.at(deg, src, 1.0)
    dk = np.array([deg[y == k].sum() for k in range(C)])
    p2 = float(((dk / (2 * E)) ** 2).sum())
    if p2 >= 1.0:
        return 0.0
    return (h_edge - p2) / (1 - p2)


def _mutual_information(graph: Graph, y, per_node: bool):
    """Shared core of edge/node label informativeness (reference
    ``label_informativeness.py``): LI = I(y_u, y_v) / H(y)."""
    y = np.asarray(y)
    src, dst = _edges(graph)
    C = int(y.max()) + 1
    if per_node:
        # weight each edge by 1/deg(dst): every node contributes equally
        deg = np.zeros(graph.num_nodes())
        np.add.at(deg, dst, 1.0)
        w = 1.0 / np.maximum(deg[dst], 1.0)
    else:
        w = np.ones(src.size)
    w = w / w.sum()
    joint = np.zeros((C, C))
    np.add.at(joint, (y[src], y[dst]), w)
    pu = joint.sum(1)
    pv = joint.sum(0)
    nz = joint > 0
    mi = (joint[nz] * np.log(joint[nz] / np.outer(pu, pv)[nz])).sum()
    hy = -(pv[pv > 0] * np.log(pv[pv > 0])).sum()
    if hy == 0:
        return 0.0
    return float(mi / hy)


def edge_label_informativeness(graph: Graph, y) -> float:
    return _mutual_information(graph, y, per_node=False)


def node_label_informativeness(graph: Graph, y) -> float:
    return _mutual_information(graph, y, per_node=True)


def get_long_edges(graph):
    """(src, dst) as host int64 arrays (reference ``homophily.py:28``;
    device arrays stay int32 unless x64 is enabled, so the widened ids
    are returned as numpy)."""
    import numpy as np

    src, dst = graph.edges()
    return np.asarray(src, np.int64), np.asarray(dst, np.int64)
