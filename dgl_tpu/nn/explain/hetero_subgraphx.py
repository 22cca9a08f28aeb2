"""HeteroSubgraphX (reference
``python/dgl/nn/pytorch/explain/heterosubgraphx.py``): Monte-Carlo tree
search over connected hetero subgraphs scored by a Shapley approximation.

Nodes are addressed as ``(ntype, local_id)``; pruning masks a node's
feature row to zero. ``model_fn(graph, feat_dict) -> logits``.
"""
from __future__ import annotations

import math
from typing import Callable, Dict, Optional

import jax.numpy as jnp
import numpy as np

from .subgraphx import _MCTSNode

__all__ = ["HeteroSubgraphX"]


class HeteroSubgraphX:
    """(reference ``heterosubgraphx.py:10``)."""

    def __init__(self, model_fn: Callable, num_hops: int = 2,
                 coef: float = 10.0, high2low: bool = True,
                 num_rollouts: int = 20, node_min: int = 3,
                 shapley_steps: int = 20, seed: int = 0):
        self.model_fn = model_fn
        self.coef = coef
        self.high2low = high2low
        self.num_rollouts = num_rollouts
        self.node_min = node_min
        self.shapley_steps = shapley_steps
        self._rng = np.random.default_rng(seed)

    # -- hetero plumbing -----------------------------------------------------

    def _index(self, g):
        """Global ids: per-ntype offsets; adjacency over every etype."""
        offs, base = {}, 0
        for nt in g.ntypes:
            offs[nt] = base
            base += g.num_nodes(nt)
        adj = [[] for _ in range(base)]
        for cet in g.canonical_etypes:
            st, _, dt = cet
            rel = g._relations[cet]
            E = rel.num_edges
            for u, v in zip(np.asarray(rel.src)[:E], np.asarray(rel.dst)[:E]):
                gu, gv = offs[st] + int(u), offs[dt] + int(v)
                adj[gu].append(gv)
                adj[gv].append(gu)
        return offs, base, adj

    def _masked_logit(self, g, feat: Dict, keep, offs, target):
        masked = {}
        for nt, x in feat.items():
            m = np.zeros(x.shape[0], np.float32)
            for gid in keep:
                lid = gid - offs[nt]
                if 0 <= lid < x.shape[0] and _owner(offs, g, gid) == nt:
                    m[lid] = 1.0
            masked[nt] = x * jnp.asarray(m)[:, None]
        out = jnp.atleast_2d(self.model_fn(g, masked))
        return float(out[0, target])

    def _shapley(self, g, feat, subset, offs, adj, target):
        sub = set(subset)
        nbrs = set()
        for u in sub:
            nbrs.update(adj[u])
        region = sorted(nbrs - sub)
        total = 0.0
        for _ in range(self.shapley_steps):
            coal = [x for x in region if self._rng.random() < 0.5]
            with_s = self._masked_logit(g, feat, sub | set(coal), offs, target)
            without = self._masked_logit(g, feat, set(coal), offs, target)
            total += with_s - without
        return total / self.shapley_steps

    def explain_graph(self, graph, feat: Dict, target: Optional[int] = None,
                      node_max: int = 8):
        """Returns ({ntype: kept local ids}, score) (reference
        ``heterosubgraphx.py:132``)."""
        offs, total_nodes, adj = self._index(graph)
        out = jnp.atleast_2d(self.model_fn(graph, feat))
        if target is None:
            target = int(jnp.argmax(out[0]))
        deg = np.array([len(a) for a in adj])
        root = _MCTSNode(frozenset(range(total_nodes)))
        best_nodes, best_score = None, -math.inf

        def prune(nodes):
            cand = sorted(nodes, key=lambda v: deg[v],
                          reverse=self.high2low)
            out_ = []
            for v in cand[: max(4, len(cand) // 2)]:
                rest = frozenset(nodes - {v})
                if rest:
                    out_.append(rest)
            return out_

        def rollout(node):
            nonlocal best_nodes, best_score
            if len(node.nodes) <= node_max:
                score = self._shapley(graph, feat, node.nodes, offs, adj,
                                      target)
                if len(node.nodes) >= self.node_min and score > best_score:
                    best_score = score
                    best_nodes = node.nodes
                node.N += 1
                node.W += score
                return score
            if node.children is None:
                node.children = [_MCTSNode(c) for c in prune(node.nodes)]
            if not node.children:
                node.N += 1
                return 0.0
            total_n = max(1, sum(c.N for c in node.children))

            def ucb(c):
                q = c.W / c.N if c.N else 0.0
                return q + self.coef * c.P + math.sqrt(total_n) / (1 + c.N)

            chosen = max(node.children, key=ucb)
            score = rollout(chosen)
            node.N += 1
            node.W += score
            return score

        for _ in range(self.num_rollouts):
            rollout(root)
        if best_nodes is None:
            best_nodes = root.nodes
            best_score = 0.0
        result: Dict[str, np.ndarray] = {}
        for nt in graph.ntypes:
            lo = offs[nt]
            hi = lo + graph.num_nodes(nt)
            ids = sorted(v - lo for v in best_nodes if lo <= v < hi)
            if ids:
                result[nt] = np.array(ids)
        return result, best_score


def _owner(offs, g, gid):
    owner = None
    for nt in g.ntypes:
        if gid >= offs[nt]:
            owner = nt
        else:
            break
    return owner
