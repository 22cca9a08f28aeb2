"""Module-level elementwise ops on SparseMatrix (reference
``python/dgl/sparse/elementwise_op.py:11-167`` and ``unary_op.py:5,29``).

The operator forms (``A + B``, ``A * 2``) live on the class; these are the
functional aliases the reference also exports.
"""
from __future__ import annotations

import jax.numpy as jnp

from .sparse_matrix import SparseMatrix, diag, val_like

from .unary import neg

__all__ = ["add", "sub", "mul", "div", "power", "neg", "inv"]


def add(A: SparseMatrix, B: SparseMatrix) -> SparseMatrix:
    return A + B


def sub(A: SparseMatrix, B: SparseMatrix) -> SparseMatrix:
    return A - B


def mul(A: SparseMatrix, B) -> SparseMatrix:
    return A * B


def div(A: SparseMatrix, B) -> SparseMatrix:
    return A / B


def power(A: SparseMatrix, scalar) -> SparseMatrix:
    return A ** scalar


def inv(A: SparseMatrix) -> SparseMatrix:
    """Inverse of a DIAGONAL sparse matrix (reference ``unary_op.py:29``:
    only diagonal matrices are invertible in O(nnz))."""
    if A.shape[0] != A.shape[1] or not A.is_diag():
        raise ValueError("inv only supports square diagonal matrices")
    n = A.shape[0]
    if A.nnz != n:
        raise ValueError("diagonal contains explicit zeros; not invertible")
    # row order may be arbitrary; rebuild in index order
    order = jnp.argsort(A.row)
    return diag(1.0 / A.val[order], A.shape)
