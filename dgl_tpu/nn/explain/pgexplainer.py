"""Parameterized Explainer (reference
``python/dgl/nn/pytorch/explain/pgexplainer.py``): an MLP over concatenated
edge-endpoint embeddings predicts edge importance; trained once, explains
any instance."""
from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import optax
from flax import linen as nn


class _ExplainNet(nn.Module):
    hidden: int = 64

    @nn.compact
    def __call__(self, edge_emb):
        h = nn.Dense(self.hidden, name="fc0")(edge_emb)
        h = jax.nn.relu(h)
        return nn.Dense(1, name="fc1")(h)[..., 0]


class PGExplainer:
    """(reference ``pgexplainer.py:17``).

    ``model_fn(graph, feat, eweight) -> (logits, node_emb)``.
    """

    def __init__(self, model_fn: Callable, num_features: int,
                 num_hops: int = 1, coff_budget: float = 0.01,
                 coff_connect: float = 5e-4, sample_bias: float = 0.0,
                 lr: float = 0.01, epochs: int = 20, seed: int = 0):
        self.model_fn = model_fn
        self.num_hops = num_hops
        self.coff_budget = coff_budget
        self.coff_connect = coff_connect
        self.lr = lr
        self.epochs = epochs
        self.seed = seed
        self.net = _ExplainNet()
        self.params = None

    def _edge_emb(self, graph, node_emb):
        rel = graph._relation(None)
        return jnp.concatenate(
            [node_emb[rel.src], node_emb[rel.dst]], axis=-1
        )

    def _sample_mask(self, logits, key, temperature, training):
        if training:
            u = jax.random.uniform(key, logits.shape, minval=1e-6,
                                   maxval=1 - 1e-6)
            gumbel = jnp.log(u) - jnp.log(1 - u)
            return jax.nn.sigmoid((logits + gumbel) / temperature)
        return jax.nn.sigmoid(logits)

    def train_step(self, graph, feat, temperature=1.0):
        """One training pass over the (single) graph instance set."""
        key = jax.random.PRNGKey(self.seed)
        logits0, emb = self.model_fn(
            graph, feat, jnp.ones(graph._relation(None).num_edges_padded)
        )
        pred_label = jnp.argmax(logits0, axis=-1)
        eemb = self._edge_emb(graph, emb)
        if self.params is None:
            self.params = self.net.init(key, eemb)
        tx = optax.adam(self.lr)
        opt_state = tx.init(self.params)

        def loss_fn(params, key):
            elogits = self.net.apply(params, eemb)
            mask = self._sample_mask(elogits, key, temperature, True)
            logits, _ = self.model_fn(graph, feat, mask)
            logp = jax.nn.log_softmax(logits, axis=-1)
            ce = -jnp.take_along_axis(
                jnp.atleast_2d(logp), jnp.atleast_1d(pred_label)[:, None], -1
            ).mean()
            budget = self.coff_budget * jnp.mean(mask)
            m = jnp.clip(mask, 1e-6, 1 - 1e-6)
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

    def explain_graph(self, graph, feat):
        """Returns (probs, edge_weight) (reference ``pgexplainer.py:252``)."""
        _, emb = self.model_fn(
            graph, feat, jnp.ones(graph._relation(None).num_edges_padded)
        )
        eemb = self._edge_emb(graph, emb)
        elogits = self.net.apply(self.params, eemb)
        mask = jax.nn.sigmoid(elogits)
        logits, _ = self.model_fn(graph, feat, mask)
        return jax.nn.softmax(logits, axis=-1), mask
