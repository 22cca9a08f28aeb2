"""Sparse matmuls (reference ``python/dgl/sparse/matmul.py:12,50,88``)."""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..base import DGLError
from ..ops import gspmm
from .sparse_matrix import SparseMatrix, from_coo

__all__ = ["spmm", "bspmm", "spspmm", "matmul"]


def spmm(A: SparseMatrix, X):
    """Dense = Sparse @ Dense (reference ``matmul.py:12``).

    A (n, m) with scalar values, X (m, f) -> (n, f). Lowered to the g-SpMM
    kernel on the reverse relation (rows aggregate over their columns).
    """
    if A.val.ndim != 1:
        raise DGLError("spmm requires scalar nnz values; use bspmm")
    # out[r] = sum_c A[r,c] X[c]: aggregate into ROW ids -> SpMM over
    # reversed relation (src=col, dst=row)
    rel = A._rel.reverse()
    return gspmm(rel, "mul", "sum", X, A.val)


def bspmm(A: SparseMatrix, X):
    """Batched spmm for vector-valued nnz (reference ``matmul.py:50``):
    A (n, m, h), X (m, f, h) -> (n, f, h)."""
    if A.val.ndim != 2:
        raise DGLError("bspmm requires (nnz, h) values")
    rel = A._rel.reverse()
    # per-head: message = X[c] * a_e ; X (m, f, h), val (nnz, h)
    out = gspmm(rel, "mul", "sum", X, A.val[:, None, :])
    return out


def spspmm(A: SparseMatrix, B: SparseMatrix) -> SparseMatrix:
    """Sparse @ Sparse -> Sparse (reference ``matmul.py:88``, C++ CSRMM).

    Host scipy-class implementation (rarely hot; matches the reference's
    CPU SpGEMM role).
    """
    import scipy.sparse as sp

    if A.val.ndim != 1 or B.val.ndim != 1:
        raise DGLError("spspmm requires scalar values")
    n, k = A.shape
    k2, m = B.shape
    if k != k2:
        raise DGLError(f"shape mismatch {A.shape} @ {B.shape}")
    sa = sp.csr_matrix(
        (np.asarray(A.val), (np.asarray(A.row), np.asarray(A.col))),
        shape=(n, k),
    )
    sb = sp.csr_matrix(
        (np.asarray(B.val), (np.asarray(B.row), np.asarray(B.col))),
        shape=(k, m),
    )
    c = (sa @ sb).tocoo()
    return from_coo(
        jnp.asarray(c.row.astype(np.int64)),
        jnp.asarray(c.col.astype(np.int64)),
        jnp.asarray(c.data.astype(np.asarray(A.val).dtype)),
        (n, m),
    )


def matmul(A, B):
    """Dispatch like the reference ``matmul.py`` ``matmul``."""
    if isinstance(A, SparseMatrix) and isinstance(B, SparseMatrix):
        return spspmm(A, B)
    if isinstance(A, SparseMatrix):
        B = jnp.asarray(B)
        if A.val.ndim == 2 and B.ndim == 3:
            return bspmm(A, B)
        return spmm(A, B)
    raise DGLError("matmul requires a SparseMatrix left operand")
