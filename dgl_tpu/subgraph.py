"""Subgraph extraction (reference ``python/dgl/subgraph.py``,
C++ ``src/graph/subgraph.cc``, ``src/graph/transform/compact.cc``).

Host-side by design: subgraph extraction changes structure (a new static
shape), so it happens on host numpy between jitted steps, exactly where the
reference crosses into C++. Induced node/edge ids are stored in
``ndata[NID]`` / ``edata[EID]`` like the reference.
"""
from __future__ import annotations

from typing import Dict, Mapping, Sequence

import jax.numpy as jnp
import numpy as np

from .base import DGLError, EID, NID
from .graph import Graph, Relation

__all__ = [
    "node_subgraph",
    "edge_subgraph",
    "in_subgraph",
    "out_subgraph",
    "khop_in_subgraph",
    "khop_out_subgraph",
    "node_type_subgraph",
    "edge_type_subgraph",
]


def _np(x):
    return np.asarray(x)


def _nodes_dict(g: Graph, nodes) -> Dict[str, np.ndarray]:
    """Normalize a nodes argument to {ntype: int array} (bool masks allowed)."""
    if not isinstance(nodes, Mapping):
        if len(g.ntypes) != 1:
            raise DGLError("node dict required for graphs with multiple ntypes")
        nodes = {g.ntypes[0]: nodes}
    out = {}
    for nt, v in nodes.items():
        v = _np(v)
        if v.dtype == bool:
            v = np.nonzero(v)[0]
        out[nt] = v.astype(np.int64)
    return out


def _idtype_np(g: Graph):
    return np.int32 if g.idtype == jnp.int32 else np.int64


def _gather_frames(frames: Dict[str, Dict], key, ids, id_field):
    """Slice a frame dict by ids and record the induced-id mapping."""
    sliced = {k: jnp.asarray(_np(v)[ids]) for k, v in frames.get(key, {}).items()}
    sliced[id_field] = jnp.asarray(ids)
    return sliced


def node_subgraph(g: Graph, nodes, *, relabel_nodes: bool = True, store_ids: bool = True) -> Graph:
    """Node-induced subgraph (reference ``subgraph.py:23`` ``dgl.node_subgraph``)."""
    nodes = _nodes_dict(g, nodes)
    np_id = _idtype_np(g)
    # old -> new id maps per ntype
    maps = {}
    counts = {}
    for nt in g.ntypes:
        keep = nodes.get(nt, np.zeros(0, dtype=np.int64))
        m = np.full(g.num_nodes(nt), -1, dtype=np.int64)
        m[keep] = np.arange(keep.size)
        maps[nt] = m
        counts[nt] = int(keep.size)
    rels = {}
    eids_per = {}
    for cet in g.canonical_etypes:
        st, _, dt = cet
        rel = g._relations[cet]
        src = _np(rel.src)[: rel.num_edges]
        dst = _np(rel.dst)[: rel.num_edges]
        mask = (maps[st][src] >= 0) & (maps[dt][dst] >= 0)
        eids = np.nonzero(mask)[0]
        new_src = maps[st][src[eids]]
        new_dst = maps[dt][dst[eids]]
        rels[cet] = Relation.from_coo(
            new_src, new_dst, counts[st], counts[dt], idtype=g.idtype
        )
        eids_per[cet] = eids.astype(np_id)
    sub = Graph(rels, {nt: counts[nt] for nt in g.ntypes})
    for nt in g.ntypes:
        sub._node_frames[nt] = _gather_frames(g._node_frames, nt, nodes.get(nt, np.zeros(0, np.int64)), NID)
        if not store_ids:
            sub._node_frames[nt].pop(NID, None)
    for cet in g.canonical_etypes:
        sub._edge_frames[cet] = _gather_frames(g._edge_frames, cet, eids_per[cet], EID)
        if not store_ids:
            sub._edge_frames[cet].pop(EID, None)
    return sub


def edge_subgraph(
    g: Graph, edges, *, relabel_nodes: bool = True, store_ids: bool = True
) -> Graph:
    """Edge-induced subgraph (reference ``subgraph.py:248``)."""
    if not isinstance(edges, Mapping):
        if len(g.canonical_etypes) != 1:
            raise DGLError("edge dict required for graphs with multiple etypes")
        edges = {g.canonical_etypes[0]: edges}
    edges = {
        g.to_canonical_etype(k): (
            np.nonzero(_np(v))[0] if _np(v).dtype == bool else _np(v).astype(np.int64)
        )
        for k, v in edges.items()
    }
    np_id = _idtype_np(g)
    if not relabel_nodes:
        rels = {}
        for cet in g.canonical_etypes:
            st, _, dt = cet
            rel = g._relations[cet]
            eids = edges.get(cet, np.zeros(0, np.int64))
            rels[cet] = Relation.from_coo(
                _np(rel.src)[eids], _np(rel.dst)[eids],
                g.num_nodes(st), g.num_nodes(dt), idtype=g.idtype,
            )
        sub = Graph(rels, {nt: g.num_nodes(nt) for nt in g.ntypes})
        for nt in g.ntypes:
            sub._node_frames[nt] = dict(g._node_frames.get(nt, {}))
        for cet in g.canonical_etypes:
            eids = edges.get(cet, np.zeros(0, np.int64))
            sub._edge_frames[cet] = _gather_frames(g._edge_frames, cet, eids, EID)
            if not store_ids:
                sub._edge_frames[cet].pop(EID, None)
        return sub
    # relabel: induced nodes = endpoints in order of first appearance per
    # type — one vectorized first-occurrence unique per ntype (the
    # reference's C++ compaction role)
    from .graphbolt.base import _unique_first_occurrence_inverse

    per_edge = {}
    streams: Dict[str, list] = {nt: [] for nt in g.ntypes}
    for cet in g.canonical_etypes:
        st, _, dt = cet
        rel = g._relations[cet]
        eids = edges.get(cet, np.zeros(0, np.int64))
        s, d = _np(rel.src)[eids], _np(rel.dst)[eids]
        per_edge[cet] = (eids, s, d)
        streams[st].append(np.asarray(s, np.int64))
        streams[dt].append(np.asarray(d, np.int64))
    node_ids = {}
    maps = {}
    for nt in g.ntypes:
        stream = (
            np.concatenate(streams[nt]) if streams[nt]
            else np.zeros(0, np.int64)
        )
        ids, _ = _unique_first_occurrence_inverse(stream)
        node_ids[nt] = ids
        m = np.full(g.num_nodes(nt), -1, dtype=np.int64)
        m[ids] = np.arange(ids.size)
        maps[nt] = (m, ids)
    rels = {}
    for cet, (eids, s, d) in per_edge.items():
        st, _, dt = cet
        rels[cet] = Relation.from_coo(
            maps[st][0][s], maps[dt][0][d],
            node_ids[st].shape[0], node_ids[dt].shape[0], idtype=g.idtype,
        )
    sub = Graph(rels, {nt: node_ids[nt].shape[0] for nt in g.ntypes})
    for nt in g.ntypes:
        ids = maps[nt][1]
        sub._node_frames[nt] = _gather_frames(g._node_frames, nt, ids, NID)
        if not store_ids:
            sub._node_frames[nt].pop(NID, None)
    for cet, (eids, _, _) in per_edge.items():
        sub._edge_frames[cet] = _gather_frames(g._edge_frames, cet, eids.astype(np_id), EID)
        if not store_ids:
            sub._edge_frames[cet].pop(EID, None)
    return sub


def _ragged_gather(indptr, eids, seeds):
    """All per-seed CSC/CSR ranges as one flat array (vectorized; the
    per-seed slice loop is quadratic-constant at scale)."""
    if seeds.size == 0:
        return np.zeros(0, np.int64)
    starts = indptr[seeds]
    lens = indptr[seeds + 1] - starts
    total = int(lens.sum())
    if total == 0:
        return np.zeros(0, np.int64)
    reps = np.repeat(
        starts - np.concatenate([[0], np.cumsum(lens)[:-1]]), lens
    )
    return np.asarray(eids)[np.arange(total) + reps]


def in_subgraph(g: Graph, nodes, *, relabel_nodes: bool = False, store_ids: bool = True) -> Graph:
    """Subgraph of all in-edges of ``nodes`` (reference ``subgraph.py:428``,
    C++ ``src/graph/sampling/neighbor/neighbor.cc`` InSubgraph)."""
    nodes = _nodes_dict(g, nodes)
    edges = {}
    for cet in g.canonical_etypes:
        _, _, dt = cet
        rel = g._relations[cet]
        seeds = nodes.get(dt, np.zeros(0, np.int64))
        indptr = _np(rel.csc_indptr)
        eids = _np(rel.csc_eids)
        edges[cet] = _ragged_gather(indptr, eids, seeds)
    return edge_subgraph(g, edges, relabel_nodes=relabel_nodes, store_ids=store_ids)


def out_subgraph(g: Graph, nodes, *, relabel_nodes: bool = False, store_ids: bool = True) -> Graph:
    """Subgraph of all out-edges of ``nodes`` (reference ``subgraph.py:524``)."""
    nodes = _nodes_dict(g, nodes)
    edges = {}
    for cet in g.canonical_etypes:
        st, _, _ = cet
        rel = g._relations[cet]
        seeds = nodes.get(st, np.zeros(0, np.int64))
        indptr = _np(rel.csr_indptr)
        eids = _np(rel.csr_eids)
        edges[cet] = _ragged_gather(indptr, eids, seeds)
    return edge_subgraph(g, edges, relabel_nodes=relabel_nodes, store_ids=store_ids)


def _khop_subgraph(g: Graph, nodes, k: int, inbound: bool):
    nodes = _nodes_dict(g, nodes)
    frontier = {nt: set(map(int, v)) for nt, v in nodes.items()}
    visited = {nt: set(s) for nt, s in frontier.items()}
    for nt in g.ntypes:
        frontier.setdefault(nt, set())
        visited.setdefault(nt, set())
    for _ in range(k):
        nxt = {nt: set() for nt in g.ntypes}
        for cet in g.canonical_etypes:
            st, _, dt = cet
            rel = g._relations[cet]
            if inbound:
                indptr, indices = _np(rel.csc_indptr), _np(rel.csc_indices)
                seeds, tgt = frontier.get(dt, set()), st
            else:
                indptr, indices = _np(rel.csr_indptr), _np(rel.csr_indices)
                seeds, tgt = frontier.get(st, set()), dt
            for v in seeds:
                nxt[tgt].update(map(int, indices[indptr[v] : indptr[v + 1]]))
        frontier = {
            nt: s - visited[nt] for nt, s in nxt.items()
        }
        for nt, s in frontier.items():
            visited[nt].update(s)
    keep = {nt: np.array(sorted(s), dtype=np.int64) for nt, s in visited.items()}
    sub = node_subgraph(g, keep)
    # inverse indices: positions of the seed nodes in the subgraph
    inv = {}
    for nt, v in nodes.items():
        order = keep[nt]
        pos = np.searchsorted(order, np.fromiter((int(x) for x in v), dtype=np.int64))
        inv[nt] = jnp.asarray(pos)
    if len(g.ntypes) == 1:
        inv = inv[g.ntypes[0]]
    return sub, inv


def khop_in_subgraph(g: Graph, nodes, k: int, *, relabel_nodes: bool = True, store_ids: bool = True):
    """k-hop inbound subgraph + seed positions (reference ``subgraph.py:620``)."""
    return _khop_subgraph(g, nodes, k, inbound=True)


def khop_out_subgraph(g: Graph, nodes, k: int, *, relabel_nodes: bool = True, store_ids: bool = True):
    """k-hop outbound subgraph + seed positions (reference ``subgraph.py:738``)."""
    return _khop_subgraph(g, nodes, k, inbound=False)


def node_type_subgraph(g: Graph, ntypes: Sequence[str]) -> Graph:
    """Subgraph keeping the given node types (reference ``subgraph.py:860``)."""
    keep = set(ntypes)
    rels = {
        cet: rel
        for cet, rel in g._relations.items()
        if cet[0] in keep and cet[2] in keep
    }
    sub = Graph(rels, {nt: g.num_nodes(nt) for nt in ntypes})
    for nt in ntypes:
        sub._node_frames[nt] = dict(g._node_frames.get(nt, {}))
    for cet in rels:
        sub._edge_frames[cet] = dict(g._edge_frames.get(cet, {}))
    return sub


def edge_type_subgraph(g: Graph, etypes: Sequence) -> Graph:
    """Subgraph keeping the given edge types (reference ``subgraph.py:920``)."""
    cets = [g.to_canonical_etype(et) for et in etypes]
    ntypes = []
    for st, _, dt in cets:
        if st not in ntypes:
            ntypes.append(st)
        if dt not in ntypes:
            ntypes.append(dt)
    rels = {cet: g._relations[cet] for cet in cets}
    sub = Graph(rels, {nt: g.num_nodes(nt) for nt in ntypes})
    for nt in ntypes:
        sub._node_frames[nt] = dict(g._node_frames.get(nt, {}))
    for cet in cets:
        sub._edge_frames[cet] = dict(g._edge_frames.get(cet, {}))
    return sub
