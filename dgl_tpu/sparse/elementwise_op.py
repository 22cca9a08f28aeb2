"""Module-level elementwise ops on SparseMatrix (reference
``python/dgl/sparse/elementwise_op.py:11-167`` and ``unary_op.py:5,29``).

The operator forms (``A + B``, ``A * 2``) live on the class; these are the
functional aliases the reference also exports.
"""
from __future__ import annotations

import jax.numpy as jnp

from .sparse_matrix import SparseMatrix, diag, val_like

from .unary import neg

__all__ = [
    "add", "sub", "mul", "div", "power", "neg", "inv",
    "sp_add", "sp_sub", "sp_mul", "sp_div", "sp_power",
    "spsp_add", "spsp_mul", "spsp_div",
]


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


# sparse∘sparse / sparse∘scalar aliases (reference
# ``python/dgl/sparse/elementwise_op_sp.py:10-40,183``)
def sp_add(A: SparseMatrix, B: SparseMatrix) -> SparseMatrix:
    return A + B


def sp_sub(A: SparseMatrix, B: SparseMatrix) -> SparseMatrix:
    return A - B


def sp_mul(A: SparseMatrix, B) -> SparseMatrix:
    return A * B


def sp_div(A: SparseMatrix, B) -> SparseMatrix:
    return A / B


def sp_power(A: SparseMatrix, scalar) -> SparseMatrix:
    return A ** scalar


def spsp_add(A: SparseMatrix, B: SparseMatrix) -> SparseMatrix:
    return A + B


def spsp_mul(A: SparseMatrix, B: SparseMatrix) -> SparseMatrix:
    """Elementwise sparse×sparse product (reference
    ``elementwise_op_sp.py:17``; intersection of sparsity patterns)."""
    import numpy as np

    from .sparse_matrix import from_coo

    if A.shape != B.shape:
        raise ValueError("shape mismatch")
    try:
        return A * B  # identical-pattern fast path
    except Exception:
        pass
    ra, ca = np.asarray(A.row), np.asarray(A.col)
    rb, cb = np.asarray(B.row), np.asarray(B.col)
    key_a = ra.astype(np.int64) * A.shape[1] + ca
    key_b = rb.astype(np.int64) * B.shape[1] + cb
    common, ia, ib = np.intersect1d(key_a, key_b, return_indices=True)
    val = A.val[jnp.asarray(ia)] * B.val[jnp.asarray(ib)]
    return from_coo(
        jnp.asarray(common // A.shape[1]),
        jnp.asarray(common % A.shape[1]),
        val,
        A.shape,
    )


def spsp_div(A: SparseMatrix, B: SparseMatrix) -> SparseMatrix:
    """Elementwise sparse/sparse (reference ``elementwise_op_sp.py:24``:
    defined only when both operands share a sparsity pattern)."""
    return A / B


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
