"""HeteroGNNExplainer (reference
``python/dgl/nn/pytorch/explain/heterognnexplainer.py``): GNNExplainer
with per-node-type feature masks and per-etype edge masks.

The model must be callable as
``model_fn(graph, feat_dict, eweight_dict) -> logits``.
"""
from __future__ import annotations

from typing import Callable, Dict

import jax
import jax.numpy as jnp
import numpy as np
import optax

__all__ = ["HeteroGNNExplainer"]


class HeteroGNNExplainer:
    """(reference ``heterognnexplainer.py:13``)."""

    def __init__(self, model_fn: Callable, num_hops: int, lr: float = 0.01,
                 num_epochs: int = 100, alpha1: float = 0.005,
                 alpha2: float = 1.0, beta1: float = 1.0, beta2: float = 0.1,
                 seed: int = 0):
        self.model_fn = model_fn
        self.num_hops = num_hops
        self.lr = lr
        self.num_epochs = num_epochs
        self.alpha1 = alpha1
        self.alpha2 = alpha2
        self.beta1 = beta1
        self.beta2 = beta2
        self.seed = seed

    def _loss(self, masks, graph, feat, target, target_ntype=None,
              target_row=None):
        emasks, fmasks = masks
        em = {k: jax.nn.sigmoid(v) for k, v in emasks.items()}
        fm = {k: jax.nn.sigmoid(v) for k, v in fmasks.items()}
        masked_feat = {nt: feat[nt] * fm[nt][None, :] for nt in feat}
        logits = self.model_fn(graph, masked_feat, em)
        if target_row is not None:
            logits = logits[target_row]
        logp = jax.nn.log_softmax(logits, axis=-1)
        if logp.ndim == 2:
            pred_loss = -jnp.take_along_axis(
                logp, target[:, None], axis=-1
            ).mean()
        else:
            pred_loss = -logp[target]
        size_loss = sum(self.alpha1 * v.sum() for v in em.values())
        size_loss += sum(
            self.alpha2 * v.sum() / v.shape[0] for v in fm.values()
        )
        ent = lambda m: (-m * jnp.log(m + 1e-15)  # noqa: E731
                         - (1 - m) * jnp.log(1 - m + 1e-15)).mean()
        ent_loss = sum(self.beta1 * ent(v) for v in em.values())
        ent_loss += sum(self.beta2 * ent(v) for v in fm.values())
        return pred_loss + size_loss + ent_loss

    def _optimize(self, graph, feat: Dict, target, target_row=None):
        rng = np.random.default_rng(self.seed)
        emasks = {
            cet: jnp.asarray(
                rng.normal(0, 0.1, graph._relations[cet].num_edges_padded),
                jnp.float32,
            )
            for cet in graph.canonical_etypes
        }
        fmasks = {
            nt: jnp.asarray(rng.normal(0, 0.1, feat[nt].shape[-1]),
                            jnp.float32)
            for nt in feat
        }
        masks = (emasks, fmasks)
        tx = optax.adam(self.lr)
        opt_state = tx.init(masks)

        @jax.jit
        def step(masks, opt_state):
            loss, grads = jax.value_and_grad(self._loss)(
                masks, graph, feat, target, target_row=target_row
            )
            updates, opt_state = tx.update(grads, opt_state)
            return optax.apply_updates(masks, updates), opt_state, loss

        for _ in range(self.num_epochs):
            masks, opt_state, _ = step(masks, opt_state)
        return (
            {nt: jax.nn.sigmoid(v) for nt, v in masks[1].items()},
            {cet: jax.nn.sigmoid(v) for cet, v in masks[0].items()},
        )

    def _ones_eweight(self, g):
        return {
            cet: jnp.ones(g._relations[cet].num_edges_padded)
            for cet in g.canonical_etypes
        }

    def explain_node(self, ntype, node_id, graph, feat: Dict, **kwargs):
        """Returns (new_node_id, subgraph, feat_mask_dict, edge_mask_dict)
        (reference ``heterognnexplainer.py:83``)."""
        from ...subgraph import khop_in_subgraph

        sg, inv = khop_in_subgraph(
            graph, {ntype: [int(node_id)]}, self.num_hops
        )
        sub_feat = {
            nt: feat[nt][np.asarray(sg._node_frames[nt]["_ID"])]
            for nt in feat if nt in sg.ntypes and sg.num_nodes(nt) > 0
        }
        logits = self.model_fn(sg, sub_feat, self._ones_eweight(sg))
        new_id = int(np.asarray(inv[ntype])[0]) if isinstance(inv, dict) \
            else int(inv[0])
        target = jnp.argmax(logits[new_id])
        fm, em = self._optimize(sg, sub_feat, target, target_row=new_id)
        return new_id, sg, fm, em

    def explain_graph(self, graph, feat: Dict, **kwargs):
        """Returns (feat_mask_dict, edge_mask_dict) (reference
        ``heterognnexplainer.py:216``)."""
        logits = self.model_fn(graph, feat, self._ones_eweight(graph))
        target = jnp.argmax(logits, axis=-1)
        if target.ndim == 0:
            target = target[None]
        return self._optimize(graph, feat, target)
