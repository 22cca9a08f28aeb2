"""SubgraphX explainer (reference
``python/dgl/nn/pytorch/explain/subgraphx.py``): Monte-Carlo tree search
over connected subgraphs scored by a Shapley-value approximation."""
from __future__ import annotations

import math
from typing import Callable, Optional

import jax.numpy as jnp
import numpy as np



class MCTSNode:
    __slots__ = ("nodes", "W", "N", "P", "children")

    def __init__(self, nodes, P=0.0):
        self.nodes = nodes          # frozenset of kept node ids
        self.W = 0.0
        self.N = 0
        self.P = P
        self.children = None


class SubgraphX:
    """(reference ``subgraphx.py:14``).

    ``model_fn(graph, feat) -> logits`` (graph-level). ``explain_graph``
    returns the node ids of the best connected subgraph of size <=
    ``node_max``.
    """

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

    # -- scoring -------------------------------------------------------------

    def _masked_logit(self, g, feat, keep, target):
        mask = np.zeros(g.num_nodes(), np.float32)
        mask[list(keep)] = 1.0
        out = self.model_fn(g, feat * jnp.asarray(mask)[:, None])
        out = jnp.atleast_2d(out)
        return float(out[0, target])

    def _shapley(self, g, feat, subset, target):
        """Monte-Carlo Shapley value of the subset vs its neighborhood."""
        rel = g._relation(None)
        src = np.asarray(rel.src)[: rel.num_edges]
        dst = np.asarray(rel.dst)[: rel.num_edges]
        nbrs = set()
        sub = set(subset)
        for u, v in zip(src, dst):
            if u in sub:
                nbrs.add(int(v))
            if v in sub:
                nbrs.add(int(u))
        region = sorted(nbrs - sub)
        total = 0.0
        for _ in range(self.shapley_steps):
            coal = [x for x in region if self._rng.random() < 0.5]
            with_s = self._masked_logit(g, feat, sub | set(coal), target)
            without = self._masked_logit(g, feat, set(coal), target)
            total += with_s - without
        return total / self.shapley_steps

    # -- search --------------------------------------------------------------

    def _prune_candidates(self, g, nodes):
        """Children: remove one node (keeping the rest), high/low degree
        first; subgraph must stay connected enough (non-empty)."""
        deg = np.asarray(g.in_degrees()) + np.asarray(g.out_degrees())
        cand = sorted(nodes, key=lambda v: deg[v], reverse=self.high2low)
        out = []
        for v in cand[: max(4, len(cand) // 2)]:
            rest = frozenset(nodes - {v})
            if rest:
                out.append(rest)
        return out

    def explain_graph(self, graph, feat, target: Optional[int] = None,
                      node_max: int = 8):
        out = jnp.atleast_2d(self.model_fn(graph, feat))
        if target is None:
            target = int(jnp.argmax(out[0]))
        root = MCTSNode(frozenset(range(graph.num_nodes())))
        best_nodes, best_score = None, -math.inf

        def rollout(node):
            nonlocal best_nodes, best_score
            if len(node.nodes) <= node_max:
                score = self._shapley(graph, feat, node.nodes, target)
                if len(node.nodes) >= self.node_min and score > best_score:
                    best_score = score
                    best_nodes = node.nodes
                node.N += 1
                node.W += score
                return score
            if node.children is None:
                node.children = [
                    MCTSNode(c) for c in self._prune_candidates(graph, node.nodes)
                ]
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
        return np.array(sorted(best_nodes)), best_score


# backwards-compatible private alias
_MCTSNode = MCTSNode
