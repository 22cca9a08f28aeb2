"""GNNExplainer (reference
``python/dgl/nn/pytorch/explain/gnnexplainer.py``): learn soft edge and
feature masks maximizing label mutual information, with size/entropy
regularizers.

The model must be a callable ``model_fn(graph, feat, eweight) -> logits``
(the reference requires the same ``eweight`` hook in ``forward``).
"""
from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np
import optax


class GNNExplainer:
    """(reference ``gnnexplainer.py:14``)."""

    def __init__(
        self,
        model_fn: Callable,
        num_hops: int,
        lr: float = 0.01,
        num_epochs: int = 100,
        alpha1: float = 0.005,
        alpha2: float = 1.0,
        beta1: float = 1.0,
        beta2: float = 0.1,
        log: bool = False,
        seed: int = 0,
    ):
        self.model_fn = model_fn
        self.num_hops = num_hops
        self.lr = lr
        self.num_epochs = num_epochs
        self.alpha1 = alpha1
        self.alpha2 = alpha2
        self.beta1 = beta1
        self.beta2 = beta2
        self.log = log
        self.seed = seed

    def _loss(self, masks, graph, feat, target):
        edge_mask, feat_mask = masks
        em = jax.nn.sigmoid(edge_mask)
        fm = jax.nn.sigmoid(feat_mask)
        logits = self.model_fn(graph, feat * fm[None, :], em)
        logp = jax.nn.log_softmax(logits, axis=-1)
        if logp.ndim == 2:
            pred_loss = -jnp.take_along_axis(
                logp, target[:, None], axis=-1
            ).mean()
        else:
            pred_loss = -logp[target]
        size_loss = self.alpha1 * em.sum() + self.alpha2 * fm.sum() / fm.shape[0]
        ent = lambda m: (-m * jnp.log(m + 1e-15)
                         - (1 - m) * jnp.log(1 - m + 1e-15)).mean()
        ent_loss = self.beta1 * ent(em) + self.beta2 * ent(fm)
        return pred_loss + size_loss + ent_loss

    def _optimize(self, graph, feat, target):
        rng = np.random.default_rng(self.seed)
        E = graph._relation(None).num_edges_padded
        F = feat.shape[-1]
        std = 0.1
        masks = (
            jnp.asarray(rng.normal(0, std, E), dtype=jnp.float32),
            jnp.asarray(rng.normal(0, std, F), dtype=jnp.float32),
        )
        tx = optax.adam(self.lr)
        opt_state = tx.init(masks)

        @jax.jit
        def step(masks, opt_state):
            loss, grads = jax.value_and_grad(self._loss)(
                masks, graph, feat, target
            )
            updates, opt_state = tx.update(grads, opt_state)
            return optax.apply_updates(masks, updates), opt_state, loss

        for _ in range(self.num_epochs):
            masks, opt_state, loss = step(masks, opt_state)
        return (
            jax.nn.sigmoid(masks[1]),  # feat mask
            jax.nn.sigmoid(masks[0]),  # edge mask
        )

    def explain_node(self, node_id, graph, feat, **kwargs):
        """Returns (new_node_id, subgraph, feat_mask, edge_mask)
        (reference ``gnnexplainer.py:175``)."""
        from ...subgraph import khop_in_subgraph

        sg, inv = khop_in_subgraph(graph, [int(node_id)], self.num_hops)
        sub_feat = feat[np.asarray(sg.ndata["_ID"])]
        logits = self.model_fn(
            sg, sub_feat, jnp.ones(sg._relation(None).num_edges_padded)
        )
        target = jnp.argmax(logits, axis=-1)
        feat_mask, edge_mask = self._optimize(sg, sub_feat, target)
        return int(inv[0]), sg, feat_mask, edge_mask

    def explain_graph(self, graph, feat, **kwargs):
        """Returns (feat_mask, edge_mask) for a graph-level prediction
        (reference ``gnnexplainer.py:327``)."""
        logits = self.model_fn(
            graph, feat, jnp.ones(graph._relation(None).num_edges_padded)
        )
        target = jnp.argmax(logits, axis=-1)
        if target.ndim == 0:
            target = target[None]
        return self._optimize(graph, feat, target)
