"""Subgraph-based minibatch samplers (reference
``python/dgl/dataloading/cluster_gcn.py``, ``saint.py``, ``shadow.py``)."""
from __future__ import annotations

from typing import Sequence

import numpy as np

from ..base import DGLError
from .base import Sampler

__all__ = ["ClusterGCNSampler", "SAINTSampler", "ShaDowKHopSampler"]


class ClusterGCNSampler(Sampler):
    """Cluster-GCN (reference ``cluster_gcn.py``): pre-partition the graph;
    each minibatch is the node-induced subgraph of k sampled clusters.

    ``sample(g, cluster_ids)`` — iterate cluster ids with a DataLoader.
    """

    def __init__(self, g, k: int, balance_ntypes=None, cache_path=None,
                 seed=None):
        from ..distributed.partition import metis_partition_assignment

        self.k = k
        parts = metis_partition_assignment(g, k)
        self.part_nodes = [
            np.nonzero(parts == p)[0] for p in range(k)
        ]

    def sample(self, g, cluster_ids):
        from ..subgraph import node_subgraph

        cluster_ids = np.atleast_1d(np.asarray(cluster_ids))
        nodes = np.concatenate([self.part_nodes[int(c)] for c in cluster_ids])
        sg = node_subgraph(g, nodes)
        return sg


class SAINTSampler(Sampler):
    """GraphSAINT (reference ``saint.py``): node / edge / random-walk
    induced subgraphs with a fixed budget."""

    def __init__(self, mode: str, budget, cache=True, seed=None):
        if mode not in ("node", "edge", "walk"):
            raise DGLError("mode must be node|edge|walk")
        self.mode = mode
        self.budget = budget
        self._rng = np.random.default_rng(seed)

    def sample(self, g, indices=None):
        from ..subgraph import edge_subgraph, node_subgraph

        if self.mode == "node":
            # sample nodes proportional to in-degree+1
            deg = np.asarray(g.in_degrees()).astype(np.float64) + 1
            p = deg / deg.sum()
            nodes = np.unique(
                self._rng.choice(g.num_nodes(), self.budget, p=p)
            )
            return node_subgraph(g, nodes)
        if self.mode == "edge":
            E = g.num_edges()
            eids = self._rng.choice(E, min(self.budget, E), replace=False)
            return edge_subgraph(g, eids)
        # walk: budget = (num_roots, walk_length)
        from ..sampling import random_walk

        num_roots, length = self.budget
        roots = self._rng.integers(0, g.num_nodes(), num_roots)
        traces, _ = random_walk(
            g, roots, length=length, seed=int(self._rng.integers(2**31))
        )
        nodes = np.unique(traces[traces >= 0])
        return node_subgraph(g, nodes)


class ShaDowKHopSampler(Sampler):
    """ShaDow-GNN (reference ``shadow.py``): the MFG is replaced by the
    sampled k-hop subgraph around each seed batch; model runs full-graph
    style on the small subgraph, readout at seed positions."""

    def __init__(self, fanouts: Sequence[int], replace=False, prob=None,
                 seed=None):
        self.fanouts = list(fanouts)
        self.replace = replace
        self.prob = prob
        self._rng = np.random.default_rng(seed)

    def sample(self, g, seed_nodes, exclude_eids=None):
        from ..sampling import sample_neighbors
        from ..subgraph import node_subgraph

        seed_nodes = np.atleast_1d(np.asarray(seed_nodes))
        all_nodes = [seed_nodes]
        cur = seed_nodes
        for fanout in reversed(self.fanouts):
            frontier = sample_neighbors(
                g, cur, fanout, replace=self.replace, prob=self.prob,
                exclude_edges=exclude_eids,
                seed=int(self._rng.integers(2**31)),
            )
            rel = frontier._relation(None)
            cur = np.unique(np.asarray(rel.src)[: rel.num_edges])
            all_nodes.append(cur)
        nodes = np.unique(np.concatenate(all_nodes))
        # seeds first (reference relabels with seeds leading)
        rest = np.setdiff1d(nodes, seed_nodes)
        order = np.concatenate([seed_nodes, rest])
        sg = node_subgraph(g, order)
        return order, seed_nodes, sg
