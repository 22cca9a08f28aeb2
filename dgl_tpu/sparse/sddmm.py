"""SDDMM (reference ``python/dgl/sparse/sddmm.py:10``): sampled dense-dense
matmul — out nnz (r, c) = <X1[r], X2[:, c]> (* A's values if vector)."""
from __future__ import annotations

import jax.numpy as jnp

from ..ops import gsddmm
from .sparse_matrix import SparseMatrix, val_like

__all__ = ["sddmm", "bsddmm"]


def sddmm(A: SparseMatrix, X1, X2) -> SparseMatrix:
    """(reference ``sddmm.py:10``). X1 (n, d), X2 (d, m)."""
    X2t = jnp.asarray(X2).T  # (m, d)
    vals = gsddmm(A._rel, "dot", jnp.asarray(X1), X2t,
                  lhs_target="u", rhs_target="v")
    vals = vals[..., 0] if vals.ndim > 1 and vals.shape[-1] == 1 else vals
    if A.val.ndim == 1:
        vals = vals * A.val if not _is_ones(A.val) else vals
    return val_like(A, vals)


def bsddmm(A: SparseMatrix, X1, X2) -> SparseMatrix:
    """Batched sddmm (reference ``sddmm.py:69``): X1 (n, d, h), X2 (d, m, h)."""
    X1 = jnp.asarray(X1)
    X2 = jnp.asarray(X2)
    h = X1.shape[-1]
    outs = []
    for i in range(h):
        vals = gsddmm(A._rel, "dot", X1[..., i], X2[..., i].T,
                      lhs_target="u", rhs_target="v")
        vals = vals[..., 0] if vals.ndim > 1 and vals.shape[-1] == 1 else vals
        outs.append(vals)
    return val_like(A, jnp.stack(outs, axis=-1))


def _is_ones(v):
    return False  # conservatively always multiply
