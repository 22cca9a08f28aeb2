"""Graph merging (reference ``python/dgl/merge.py:11`` ``dgl.merge``):
union of edges of graphs over the same node space."""
from __future__ import annotations

from typing import List

import numpy as np

from .base import DGLError
from .graph import Graph, Relation

__all__ = ["merge"]


def merge(graphs: List[Graph]) -> Graph:
    if not graphs:
        raise DGLError("merge requires at least one graph")
    g0 = graphs[0]
    rels = {}
    for cet in g0.canonical_etypes:
        srcs, dsts = [], []
        for g in graphs:
            rel = g._relations[cet]
            srcs.append(np.asarray(rel.src)[: rel.num_edges])
            dsts.append(np.asarray(rel.dst)[: rel.num_edges])
        rels[cet] = Relation.from_coo(
            np.concatenate(srcs),
            np.concatenate(dsts),
            max(g.num_src_nodes(cet[0]) for g in graphs),
            max(g.num_dst_nodes(cet[2]) for g in graphs),
            idtype=g0.idtype,
        )
    nsrc = {
        nt: max(g.num_nodes(nt) for g in graphs if nt in g.ntypes)
        for nt in g0.ntypes
    }
    out = Graph(rels, nsrc)
    # node features from the first graph that has them (reference keeps g0's)
    for nt in g0.ntypes:
        out._node_frames[nt] = dict(g0._node_frames.get(nt, {}))
    return out
