"""Trainable node embeddings with sparse-style optimizers (reference
``python/dgl/nn/pytorch/sparse_emb.py`` NodeEmbedding +
``python/dgl/optim/pytorch/sparse_optim.py`` SparseAdam/SparseAdagrad).

TPU design: the table is a plain jax.Array (shardable over a mesh axis for
the DistEmbedding analog); per-step updates touch only the gathered rows via
segment-sum of gradients — functionally identical to the reference's sparse
optimizers but expressed as pure array ops under jit.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["NodeEmbedding", "SparseAdagradState", "sparse_adagrad_update",
           "SparseAdamState", "sparse_adam_update"]


class NodeEmbedding:
    """(reference ``sparse_emb.py:14``). A host-side handle on an embedding
    table; ``__call__`` gathers rows."""

    def __init__(self, num_embeddings, embedding_dim, name="emb",
                 init_func=None, seed=0):
        self.num_embeddings = num_embeddings
        self.embedding_dim = embedding_dim
        self.name = name
        if init_func is not None:
            self.weight = init_func(
                jnp.zeros((num_embeddings, embedding_dim), jnp.float32)
            )
        else:
            rng = np.random.default_rng(seed)
            self.weight = jnp.asarray(
                rng.uniform(-1, 1, (num_embeddings, embedding_dim)),
                dtype=jnp.float32,
            )

    def __call__(self, node_ids, device=None):
        return self.weight[node_ids]


class SparseAdagradState(NamedTuple):
    sum_sq: jnp.ndarray  # (N, 1) per-row accumulator (reference keeps scalar per row)


def sparse_adagrad_init(table):
    return SparseAdagradState(jnp.zeros((table.shape[0], 1), table.dtype))


def sparse_adagrad_update(table, state, ids, grads, lr=0.01, eps=1e-10):
    """Row-sparse Adagrad (reference ``sparse_optim.py:465`` SparseAdagrad:
    per-row mean-square accumulator). ``ids`` (B,), ``grads`` (B, D) —
    duplicate ids are summed first like the reference's unique+sum."""
    n = table.shape[0]
    g = jax.ops.segment_sum(grads, ids, num_segments=n)
    touched = jax.ops.segment_sum(
        jnp.ones((ids.shape[0], 1), table.dtype), ids, num_segments=n
    )
    gsq = (g * g).mean(axis=1, keepdims=True)
    sum_sq = state.sum_sq + gsq
    std = jnp.sqrt(sum_sq) + eps
    update = -lr * g / std
    table = table + jnp.where(touched > 0, update, 0.0)
    return table, SparseAdagradState(sum_sq)


class SparseAdamState(NamedTuple):
    m: jnp.ndarray
    v: jnp.ndarray
    t: jnp.ndarray  # (N, 1) per-row step counts (reference's per-row state_step)


def sparse_adam_init(table):
    return SparseAdamState(
        jnp.zeros_like(table),
        jnp.zeros_like(table),
        jnp.zeros((table.shape[0], 1), table.dtype),
    )


def sparse_adam_update(table, state, ids, grads, lr=0.01, beta1=0.9,
                       beta2=0.999, eps=1e-8):
    """Row-sparse Adam with per-row step counts (reference
    ``sparse_optim.py:647`` SparseAdam: only touched rows advance)."""
    n = table.shape[0]
    g = jax.ops.segment_sum(grads, ids, num_segments=n)
    touched = (
        jax.ops.segment_sum(
            jnp.ones((ids.shape[0], 1), table.dtype), ids, num_segments=n
        )
        > 0
    )
    t = state.t + touched
    m = jnp.where(touched, beta1 * state.m + (1 - beta1) * g, state.m)
    v = jnp.where(touched, beta2 * state.v + (1 - beta2) * g * g, state.v)
    t_safe = jnp.maximum(t, 1.0)
    mhat = m / (1 - beta1 ** t_safe)
    vhat = v / (1 - beta2 ** t_safe)
    update = -lr * mhat / (jnp.sqrt(vhat) + eps)
    table = table + jnp.where(touched, update, 0.0)
    return table, SparseAdamState(m, v, t)
