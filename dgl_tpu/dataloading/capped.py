"""Capped-frontier subgraph sampler (reference
``python/dgl/dataloading/capped_neighbor_sampler.py:11``): per layer the
frontier is subsampled down to ``fixed_k`` nodes (optionally upsampling
rare node types by sqrt-scaled probabilities), and the result is the
node-induced subgraph over everything reached — a ShaDow-style output with
a hard cap on layer width."""
from __future__ import annotations

from typing import Mapping, Optional

import numpy as np

from .base import Sampler

__all__ = ["CappedNeighborSampler"]


class CappedNeighborSampler(Sampler):
    def __init__(self, fanouts, fixed_k: int, upsample_rare_types: bool,
                 replace: bool = False, prob: Optional[str] = None,
                 prefetch_node_feats=None, prefetch_edge_feats=None,
                 output_device=None, seed: Optional[int] = None):
        super().__init__()
        self.fanouts = fanouts
        self.fixed_k = int(fixed_k)
        self.upsample_rare_types = upsample_rare_types
        self.replace = replace
        self.prob = prob
        self.prefetch_node_feats = prefetch_node_feats
        self.prefetch_edge_feats = prefetch_edge_feats
        self.output_device = output_device
        self._rng = np.random.default_rng(seed)

    def sample(self, g, indices, exclude_eids=None):
        from ..sampling import sample_neighbors
        from ..sampling.utils import EidExcluder
        from ..subgraph import node_subgraph

        if not isinstance(indices, Mapping):
            indices = {g.ntypes[0]: np.asarray(indices)}
        else:
            indices = {nt: np.asarray(v) for nt, v in indices.items()}
        output_nodes = indices
        all_reached = [indices]

        for fanout in reversed(list(self.fanouts)):
            frontier = sample_neighbors(
                g, indices, fanout, replace=self.replace, prob=self.prob,
                exclude_edges=exclude_eids,
                seed=int(self._rng.integers(2**63)),
            )
            reached = {}
            for cet in frontier.canonical_etypes:
                src_type = cet[0]
                src, _ = frontier.edges(etype=cet)
                src = np.asarray(src)
                reached.setdefault(src_type, []).append(src)
            reached = {
                nt: np.unique(np.concatenate(srcs))
                for nt, srcs in reached.items() if srcs
            }
            if not reached:
                break
            total = sum(ids.shape[0] for ids in reached.values())
            probs = {
                nt: ids.shape[0] / total for nt, ids in reached.items()
            }
            if self.upsample_rare_types:
                dist = np.sqrt(np.asarray(list(probs.values())))
                dist = dist / dist.sum()
                probs = {nt: dist[i] for i, nt in enumerate(probs)}
            n_per = {
                nt: int(self.fixed_k * p) for nt, p in probs.items()
            }
            remainder = self.fixed_k - sum(n_per.values())
            types = list(probs.keys())
            pvals = np.asarray([probs[t] for t in types])
            for _ in range(remainder):
                n_per[types[self._rng.choice(len(types), p=pvals)]] += 1
            capped = {}
            for nt, ids in reached.items():
                k = min(ids.shape[0], n_per[nt])
                sel = self._rng.permutation(ids.shape[0])[:k]
                capped[nt] = ids[sel]
            indices = capped
            all_reached.append(capped)

        merged = {}
        for nt in g.ntypes:
            parts = [r[nt] for r in all_reached if nt in r]
            if parts:
                merged[nt] = np.unique(np.concatenate(parts))
        subg = node_subgraph(g, merged)
        if exclude_eids is not None:
            subg = EidExcluder(exclude_eids)(subg)
        # input_nodes = the parent ids backing the subgraph, in the
        # subgraph's node order — feat[input_nodes] aligns with subg rows
        # (the contract our ShaDowKHopSampler also follows; the reference
        # returns the last capped frontier, which does NOT line up with
        # the subgraph it returns)
        from ..base import NID

        if len(g.ntypes) == 1:
            nt = g.ntypes[0]
            return np.asarray(subg.ndata[NID]), output_nodes[nt], subg
        input_nodes = {
            nt: np.asarray(subg.nodes[nt].data[NID]) for nt in subg.ntypes
        }
        return input_nodes, output_nodes, subg
