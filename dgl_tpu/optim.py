"""Sparse-embedding optimizers namespace (reference ``python/dgl/optim/``)."""
from .nn.sparse_emb import (
    SparseAdagradState,
    SparseAdamState,
    sparse_adagrad_init,
    sparse_adagrad_update,
    sparse_adam_init,
    sparse_adam_update,
)

__all__ = [
    "SparseAdagradState",
    "SparseAdamState",
    "sparse_adagrad_init",
    "sparse_adagrad_update",
    "sparse_adam_init",
    "sparse_adam_update",
]


class SparseGradOptimizer:
    """Abstract base of the row-sparse optimizers (reference
    ``optim/pytorch/sparse_optim.py:24`` SparseGradOptimizer): holds the
    embedding list and defines the ``step(grads_per_emb)`` contract."""

    def __init__(self, params, lr: float):
        self.params = list(params)
        self.lr = lr

    def step(self, grads_per_emb):
        raise NotImplementedError

    def zero_grad(self):
        """No-op: gradients are functional (passed into ``step``), not
        accumulated on parameters."""


class SparseAdagrad(SparseGradOptimizer):
    """Class form matching the reference trainer loop (reference
    ``optim/pytorch/sparse_optim.py:509``): holds per-embedding Adagrad
    state and applies row-sparse updates via ``step``."""

    def __init__(self, params, lr: float = 0.01, eps: float = 1e-10):
        super().__init__(params, lr)
        self.eps = eps
        self._state = [sparse_adagrad_init(p.weight) for p in self.params]

    def step(self, grads_per_emb):
        """``grads_per_emb``: list of (ids, grads) per embedding (order of
        construction); embeddings are updated in place."""
        for i, (emb, (ids, grads)) in enumerate(
            zip(self.params, grads_per_emb)
        ):
            emb.weight, self._state[i] = sparse_adagrad_update(
                emb.weight, self._state[i], ids, grads, lr=self.lr,
                eps=self.eps,
            )


class SparseAdam(SparseGradOptimizer):
    """(reference ``optim/pytorch/sparse_optim.py:647``)."""

    def __init__(self, params, lr: float = 0.001, betas=(0.9, 0.999),
                 eps: float = 1e-8):
        super().__init__(params, lr)
        self.betas = betas
        self.eps = eps
        self._state = [sparse_adam_init(p.weight) for p in self.params]

    def step(self, grads_per_emb):
        for i, (emb, (ids, grads)) in enumerate(
            zip(self.params, grads_per_emb)
        ):
            emb.weight, self._state[i] = sparse_adam_update(
                emb.weight, self._state[i], ids, grads, lr=self.lr,
                beta1=self.betas[0], beta2=self.betas[1], eps=self.eps,
            )


__all__ += ["SparseGradOptimizer", "SparseAdagrad", "SparseAdam"]
