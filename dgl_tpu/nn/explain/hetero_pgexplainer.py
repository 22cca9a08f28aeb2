"""HeteroPGExplainer (reference
``python/dgl/nn/pytorch/explain/heteropgexplainer.py``): the parameterized
explainer over heterographs — one shared MLP scores every edge from the
concatenated endpoint embeddings, per canonical etype.

``model_fn(graph, feat_dict, eweight_dict) -> (logits, node_emb_dict)``.
"""
from __future__ import annotations

from typing import Callable, Dict

import jax
import jax.numpy as jnp
import optax

from .pgexplainer import _ExplainNet

__all__ = ["HeteroPGExplainer"]


class HeteroPGExplainer:
    """(reference ``heteropgexplainer.py:14``)."""

    def __init__(self, model_fn: Callable, num_features: int,
                 coff_budget: float = 0.01, coff_connect: float = 5e-4,
                 lr: float = 0.01, epochs: int = 20, seed: int = 0):
        self.model_fn = model_fn
        self.coff_budget = coff_budget
        self.coff_connect = coff_connect
        self.lr = lr
        self.epochs = epochs
        self.seed = seed
        self.net = _ExplainNet()
        self.params = None

    def _ones(self, g):
        return {cet: jnp.ones(g._relations[cet].num_edges_padded)
                for cet in g.canonical_etypes}

    def _edge_emb(self, graph, node_emb: Dict):
        out = {}
        for cet in graph.canonical_etypes:
            st, _, dt = cet
            rel = graph._relations[cet]
            out[cet] = jnp.concatenate(
                [node_emb[st][rel.src], node_emb[dt][rel.dst]], axis=-1
            )
        return out

    def _masks(self, params, eemb, key, temperature, training):
        masks = {}
        for cet, emb in eemb.items():
            logits = self.net.apply(params, emb)
            if training:
                key, sub = jax.random.split(key)
                u = jax.random.uniform(sub, logits.shape, minval=1e-6,
                                       maxval=1 - 1e-6)
                logits = logits + jnp.log(u) - jnp.log(1 - u)
            masks[cet] = jax.nn.sigmoid(logits / temperature
                                        if training else logits)
        return masks

    def train_step(self, graph, feat: Dict, temperature: float = 1.0):
        key = jax.random.PRNGKey(self.seed)
        logits0, emb = self.model_fn(graph, feat, self._ones(graph))
        pred_label = jnp.argmax(logits0, axis=-1)
        eemb = self._edge_emb(graph, emb)
        if self.params is None:
            any_emb = next(iter(eemb.values()))
            self.params = self.net.init(key, any_emb)
        tx = optax.adam(self.lr)
        opt_state = tx.init(self.params)

        def loss_fn(params, key):
            masks = self._masks(params, eemb, key, temperature, True)
            logits, _ = self.model_fn(graph, feat, masks)
            logp = jax.nn.log_softmax(logits, axis=-1)
            ce = -jnp.take_along_axis(
                jnp.atleast_2d(logp), jnp.atleast_1d(pred_label)[:, None], -1
            ).mean()
            flat = jnp.concatenate([m.ravel() for m in masks.values()])
            budget = self.coff_budget * jnp.mean(flat)
            m = jnp.clip(flat, 1e-6, 1 - 1e-6)
            ent = self.coff_connect * jnp.mean(
                -m * jnp.log(m) - (1 - m) * jnp.log(1 - m)
            )
            return ce + budget + ent

        @jax.jit
        def step(params, opt_state, key):
            key, sub = jax.random.split(key)
            loss, grads = jax.value_and_grad(loss_fn)(params, sub)
            updates, opt_state = tx.update(grads, opt_state)
            return optax.apply_updates(params, updates), opt_state, key, loss

        params, key_, loss = self.params, key, None
        for _ in range(self.epochs):
            params, opt_state, key_, loss = step(params, opt_state, key_)
        self.params = params
        return float(loss)

    def explain_graph(self, graph, feat: Dict):
        """Returns (probs, {etype: edge_weight}) (reference
        ``heteropgexplainer.py:201``)."""
        _, emb = self.model_fn(graph, feat, self._ones(graph))
        eemb = self._edge_emb(graph, emb)
        masks = {
            cet: jax.nn.sigmoid(self.net.apply(self.params, e))
            for cet, e in eemb.items()
        }
        logits, _ = self.model_fn(graph, feat, masks)
        return jax.nn.softmax(logits, axis=-1), masks
