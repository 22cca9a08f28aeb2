"""Interop with jax.experimental.sparse BCOO and scipy (the TPU-side
analog of the reference's torch-sparse converters,
``python/dgl/sparse/sparse_matrix.py:1284-1443``)."""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from .sparse_matrix import SparseMatrix, from_coo

__all__ = ["from_bcoo", "to_bcoo", "from_scipy", "to_scipy"]


def from_bcoo(mat) -> SparseMatrix:
    """Build from a ``jax.experimental.sparse.BCOO`` (2-D, unbatched)."""
    if mat.ndim != 2:
        raise ValueError("only 2-D BCOO supported")
    idx = mat.indices
    return from_coo(idx[:, 0], idx[:, 1], mat.data, tuple(mat.shape))


def to_bcoo(A: SparseMatrix):
    from jax.experimental import sparse as jsparse

    idx = jnp.stack([A.row, A.col], axis=1)
    return jsparse.BCOO((A.val, idx), shape=A.shape)


def from_scipy(mat) -> SparseMatrix:
    coo = mat.tocoo()
    return from_coo(
        np.asarray(coo.row), np.asarray(coo.col),
        jnp.asarray(coo.data), tuple(coo.shape),
    )


def to_scipy(A: SparseMatrix):
    import scipy.sparse as sp

    return sp.coo_matrix(
        (np.asarray(A.val), (np.asarray(A.row), np.asarray(A.col))),
        shape=A.shape,
    )
