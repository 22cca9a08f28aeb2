"""Distributed sparse-embedding optimizers (reference
``python/dgl/distributed/optim/pytorch/sparse_optim.py:24,465,509,647``).

The reference pushes sparse gradients into the KVStore over RPC; here the
embedding table is a mesh-sharded ``DistEmbedding`` and the row-sparse
update runs under jit — XLA inserts the same owner-directed sparse
all-to-all the NCCL path hand-codes (``cuda/nccl.py:98``).
"""
from __future__ import annotations

from typing import List

import jax.numpy as jnp
import numpy as np

from ..nn.sparse_emb import (
    sparse_adagrad_init,
    sparse_adagrad_update,
    sparse_adam_init,
    sparse_adam_update,
)
from .dist_tensor import DistEmbedding

__all__ = ["DistSparseGradOptimizer", "SparseAdagrad", "SparseAdam"]


class DistSparseGradOptimizer:
    """Abstract base (reference ``sparse_optim.py:24``): holds the
    DistEmbedding list; ``step(grads_per_emb)`` applies row-sparse
    updates; only touched rows move."""

    def __init__(self, params: List[DistEmbedding], lr: float):
        self.params = list(params)
        self.lr = lr
        for p in self.params:
            if not isinstance(p, DistEmbedding):
                raise TypeError(
                    "DistSparseGradOptimizer expects DistEmbedding params"
                )

    def step(self, grads_per_emb):
        raise NotImplementedError

    def zero_grad(self):
        """Functional grads — nothing to clear (API parity)."""


class SparseAdagrad(DistSparseGradOptimizer):
    """(reference ``sparse_optim.py:465``)."""

    def __init__(self, params, lr: float = 0.01, eps: float = 1e-10):
        super().__init__(params, lr)
        self.eps = eps
        self._state = [sparse_adagrad_init(p.data) for p in self.params]

    def step(self, grads_per_emb):
        for i, (emb, (ids, grads)) in enumerate(
            zip(self.params, grads_per_emb)
        ):
            new_table, self._state[i] = sparse_adagrad_update(
                emb.data, self._state[i], jnp.asarray(ids),
                jnp.asarray(grads), lr=self.lr, eps=self.eps,
            )
            emb._data = new_table


class SparseAdam(DistSparseGradOptimizer):
    """(reference ``sparse_optim.py:647``)."""

    def __init__(self, params, lr: float = 0.001, betas=(0.9, 0.999),
                 eps: float = 1e-8):
        super().__init__(params, lr)
        self.betas = betas
        self.eps = eps
        self._state = [sparse_adam_init(p.data) for p in self.params]

    def step(self, grads_per_emb):
        for i, (emb, (ids, grads)) in enumerate(
            zip(self.params, grads_per_emb)
        ):
            new_table, self._state[i] = sparse_adam_update(
                emb.data, self._state[i], jnp.asarray(ids),
                jnp.asarray(grads), lr=self.lr, beta1=self.betas[0],
                beta2=self.betas[1], eps=self.eps,
            )
            emb._data = new_table
