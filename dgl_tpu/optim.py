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
