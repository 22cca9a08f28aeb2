"""Reductions over sparse dims (reference ``python/dgl/sparse/reduction.py``)."""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..base import DGLError
from .sparse_matrix import SparseMatrix

__all__ = ["reduce", "sum", "smax", "smin", "smean", "sprod"]


def reduce(A: SparseMatrix, op: str = "sum", dim=None):
    """op in {sum, smax, smin, smean, sprod}; dim None = all nnz, 0 = over
    rows (result per column), 1 = over columns (result per row)."""
    v = A.val
    if dim is None:
        if op == "sum":
            return v.sum(axis=0)
        if op == "smax":
            return v.max(axis=0)
        if op == "smin":
            return v.min(axis=0)
        if op == "smean":
            return v.mean(axis=0)
        if op == "sprod":
            return v.prod(axis=0)
        raise DGLError(op)
    seg = A.col if dim == 0 else A.row
    n = A.shape[1] if dim == 0 else A.shape[0]
    if op == "sum":
        return jax.ops.segment_sum(v, seg, num_segments=n)
    if op == "smax":
        out = jax.ops.segment_max(v, seg, num_segments=n)
        return jnp.where(jnp.isfinite(out), out, 0)
    if op == "smin":
        out = jax.ops.segment_min(v, seg, num_segments=n)
        return jnp.where(jnp.isfinite(out), out, 0)
    if op == "smean":
        s = jax.ops.segment_sum(v, seg, num_segments=n)
        c = jax.ops.segment_sum(
            jnp.ones(seg.shape[:1] + (1,) * (v.ndim - 1), v.dtype),
            seg, num_segments=n,
        )
        return s / jnp.maximum(c, 1)
    if op == "sprod":
        out = jnp.ones((n,) + v.shape[1:], v.dtype).at[seg].multiply(v)
        # rows/cols with no nnz reduce to 0, matching the reference
        # (``python/dgl/sparse/reduction.py:321`` sprod of empty = 0)
        has = jax.ops.segment_sum(jnp.ones_like(seg), seg, num_segments=n) > 0
        return jnp.where(has.reshape((n,) + (1,) * (v.ndim - 1)), out, 0)
    raise DGLError(op)


def sum(A: SparseMatrix, dim=None):  # noqa: A001 - reference name
    """Reference ``python/dgl/sparse/reduction.py:85``."""
    return reduce(A, "sum", dim)


def smax(A: SparseMatrix, dim=None):
    """Reference ``python/dgl/sparse/reduction.py:139``."""
    return reduce(A, "smax", dim)


def smin(A: SparseMatrix, dim=None):
    """Reference ``python/dgl/sparse/reduction.py:197``."""
    return reduce(A, "smin", dim)


def smean(A: SparseMatrix, dim=None):
    """Reference ``python/dgl/sparse/reduction.py:259``."""
    return reduce(A, "smean", dim)


def sprod(A: SparseMatrix, dim=None):
    """Reference ``python/dgl/sparse/reduction.py:321``."""
    return reduce(A, "sprod", dim)
