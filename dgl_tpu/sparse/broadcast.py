"""Row/col broadcast ops (reference ``python/dgl/sparse/broadcast.py``)."""
from __future__ import annotations

import jax.numpy as jnp

from ..base import DGLError
from .sparse_matrix import SparseMatrix, val_like

__all__ = [
    "sp_broadcast_v", "sp_add_v", "sp_sub_v", "sp_mul_v", "sp_div_v",
]


def sp_broadcast_v(A: SparseMatrix, v, op: str) -> SparseMatrix:
    """Broadcast a dense vector along a sparse dim: v (n, 1)/(n,) row-wise or
    (1, m) col-wise, applying op in {add, sub, mul, truediv}."""
    v = jnp.asarray(v)
    if v.ndim == 1:
        v = v[:, None]
    n, m = A.shape
    if v.shape[0] == n and v.shape[1] in (1, *(A.val.shape[1:] or (1,))):
        per_nnz = v[A.row]
        if v.shape[1] == 1 and A.val.ndim == 1:
            per_nnz = per_nnz[:, 0]
    elif v.shape[0] == 1:
        per_nnz = v[0][A.col] if v.shape[1] == m else None
        if per_nnz is None:
            raise DGLError("bad broadcast shape")
    else:
        raise DGLError(f"cannot broadcast {v.shape} to {A.shape}")
    if op == "add":
        return val_like(A, A.val + per_nnz)
    if op == "sub":
        return val_like(A, A.val - per_nnz)
    if op == "mul":
        return val_like(A, A.val * per_nnz)
    if op == "truediv":
        return val_like(A, A.val / per_nnz)
    raise DGLError(op)


def sp_add_v(A: SparseMatrix, v) -> SparseMatrix:
    """Reference ``python/dgl/sparse/broadcast.py:104``."""
    return sp_broadcast_v(A, v, "add")


def sp_sub_v(A: SparseMatrix, v) -> SparseMatrix:
    """Reference ``python/dgl/sparse/broadcast.py:112``."""
    return sp_broadcast_v(A, v, "sub")


def sp_mul_v(A: SparseMatrix, v) -> SparseMatrix:
    """Reference ``python/dgl/sparse/broadcast.py:120``."""
    return sp_broadcast_v(A, v, "mul")


def sp_div_v(A: SparseMatrix, v) -> SparseMatrix:
    """Reference ``python/dgl/sparse/broadcast.py:128``."""
    return sp_broadcast_v(A, v, "truediv")
