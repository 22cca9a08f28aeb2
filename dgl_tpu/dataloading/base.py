"""Sampler bases and edge-prediction wrappers (reference
``python/dgl/dataloading/base.py:195`` BlockSampler, ``:386,500``
edge-prediction with eid exclusion)."""
from __future__ import annotations


import numpy as np

from ..base import DGLError, NID

__all__ = [
    "Sampler",
    "BlockSampler",
    "find_exclude_eids",
    "as_edge_prediction_sampler",
    "EdgePredictionSampler",
]


class Sampler:
    """Abstract sampler: ``sample(g, seeds) -> minibatch`` (reference
    ``dataloading/base.py:162``)."""

    def sample(self, g, indices):
        raise NotImplementedError


class BlockSampler(Sampler):
    """Base for samplers producing lists of MFG blocks (reference
    ``dataloading/base.py:195``).

    Subclasses implement ``sample_blocks(g, seed_nodes) ->
    (input_nodes, output_nodes, blocks)``.
    """

    def __init__(self, prefetch_node_feats=None, prefetch_labels=None,
                 prefetch_edge_feats=None, output_device=None):
        self.prefetch_node_feats = prefetch_node_feats or []
        self.prefetch_labels = prefetch_labels or []
        self.prefetch_edge_feats = prefetch_edge_feats or []
        self.output_device = output_device

    def sample_blocks(self, g, seed_nodes, exclude_eids=None):
        raise NotImplementedError

    def sample(self, g, seed_nodes, exclude_eids=None):
        return self.sample_blocks(g, seed_nodes, exclude_eids=exclude_eids)


def find_exclude_eids(g, seed_edges, exclude, reverse_eids=None,
                      reverse_etypes=None):
    """Edge ids to exclude from sampled neighborhoods (reference
    ``dataloading/base.py:286``): None | 'self' | 'reverse_id' |
    'reverse_types'."""
    if not isinstance(seed_edges, dict):
        seed_edges = np.asarray(seed_edges)
    if exclude is None:
        return None
    if exclude == "self":
        return seed_edges
    if exclude == "reverse_id":
        if reverse_eids is None:
            raise DGLError("reverse_eids required for exclude='reverse_id'")
        return np.concatenate(
            [seed_edges, np.asarray(reverse_eids)[seed_edges]]
        )
    if exclude == "reverse_types":
        # hetero: reverse edge i of etype A is edge i of reverse_etypes[A]
        # (reference ``dataloading/base.py:286`` _find_exclude_eids_with_
        # reverse_types)
        if reverse_etypes is None:
            raise DGLError(
                "reverse_etypes required for exclude='reverse_types'"
            )
        if not isinstance(seed_edges, dict):
            if len(g.canonical_etypes) != 1:
                raise DGLError("hetero graphs need {etype: eids} seeds")
            seed_edges = {g.canonical_etypes[0][1]: seed_edges}
        out = {}
        for et, eids in seed_edges.items():
            cet = g.to_canonical_etype(et)
            eids = np.asarray(eids)
            out[cet] = np.concatenate([out.get(cet, eids[:0]), eids])
            rev = reverse_etypes.get(et, reverse_etypes.get(cet))
            if rev is not None:
                rcet = g.to_canonical_etype(rev)
                out[rcet] = np.concatenate([out.get(rcet, eids[:0]), eids])
        return out
    if callable(exclude):
        return np.asarray(exclude(seed_edges))
    raise DGLError(f"Unknown exclude mode {exclude!r}")


class EdgePredictionSampler(Sampler):
    """Wrap a node-wise sampler for edge prediction (reference
    ``dataloading/base.py:500`` ``as_edge_prediction_sampler``).

    ``sample(g, seed_edges)`` returns (input_nodes, pair_graph,
    [negative_pair_graph,] blocks).
    """

    def __init__(self, sampler, exclude=None, reverse_eids=None,
                 reverse_etypes=None, negative_sampler=None):
        self.sampler = sampler
        self.exclude = exclude
        self.reverse_eids = reverse_eids
        self.reverse_etypes = reverse_etypes
        self.negative_sampler = negative_sampler

    def sample(self, g, seed_edges):
        from ..subgraph import edge_subgraph
        from ..transforms.functional import compact_graphs
        from .. import convert

        seed_edges = np.asarray(seed_edges)
        pair_graph = edge_subgraph(g, seed_edges, relabel_nodes=False)
        exclude_eids = find_exclude_eids(
            g, seed_edges, self.exclude, self.reverse_eids, self.reverse_etypes
        )
        neg_graph = None
        if self.negative_sampler is not None:
            neg_src, neg_dst = self.negative_sampler(g, seed_edges)
            neg_graph = convert.graph(
                (np.asarray(neg_src), np.asarray(neg_dst)),
                num_nodes=g.num_nodes(),
            )
            pair_graph, neg_graph = compact_graphs([pair_graph, neg_graph])
        else:
            pair_graph = compact_graphs(pair_graph)
        seed_nodes = np.asarray(pair_graph.ndata[NID])
        input_nodes, _, blocks = self.sampler.sample_blocks(
            g, seed_nodes, exclude_eids=exclude_eids
        )
        if neg_graph is not None:
            return input_nodes, pair_graph, neg_graph, blocks
        return input_nodes, pair_graph, blocks


def as_edge_prediction_sampler(sampler, exclude=None, reverse_eids=None,
                               reverse_etypes=None, negative_sampler=None):
    return EdgePredictionSampler(
        sampler, exclude, reverse_eids, reverse_etypes, negative_sampler
    )
