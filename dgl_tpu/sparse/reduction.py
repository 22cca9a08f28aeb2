"""Reductions over sparse dims (reference ``python/dgl/sparse/reduction.py``)."""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..base import DGLError
from .sparse_matrix import SparseMatrix

__all__ = ["reduce"]


def reduce(A: SparseMatrix, op: str = "sum", dim=None):
    """op in {sum, smax, smin, smean}; dim None = all nnz, 0 = over rows
    (result per column), 1 = over columns (result per row)."""
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
    raise DGLError(op)
