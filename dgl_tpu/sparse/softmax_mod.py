"""Sparse softmax (reference ``python/dgl/sparse/softmax.py``): softmax of
nnz values along a sparse dimension (1 = over each row's entries)."""
from __future__ import annotations

import jax
import jax.numpy as jnp

from .sparse_matrix import SparseMatrix, val_like

__all__ = ["softmax"]


def _segment_softmax(val, seg, num_segments):
    m = jax.ops.segment_max(val, seg, num_segments=num_segments)
    m = jnp.where(jnp.isfinite(m), m, 0.0)
    shifted = val - m[seg]
    e = jnp.exp(shifted)
    s = jax.ops.segment_sum(e, seg, num_segments=num_segments)
    return e / jnp.maximum(s[seg], 1e-38)


def softmax(A: SparseMatrix, dim: int = 1) -> SparseMatrix:
    """dim=1: softmax over each row; dim=0: over each column."""
    seg = A.row if dim == 1 else A.col
    n = A.shape[0] if dim == 1 else A.shape[1]
    v = A.val
    if v.ndim == 1:
        out = _segment_softmax(v, seg, n)
    else:
        out = jax.vmap(
            lambda col: _segment_softmax(col, seg, n), in_axes=1, out_axes=1
        )(v)
    return val_like(A, out)
