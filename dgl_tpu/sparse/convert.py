"""Interop with jax.experimental.sparse BCOO and scipy (the TPU-side
analog of the reference's torch-sparse converters,
``python/dgl/sparse/sparse_matrix.py:1284-1443``)."""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from .sparse_matrix import SparseMatrix, from_coo

__all__ = [
    "from_bcoo", "to_bcoo", "from_scipy", "to_scipy",
    "from_torch_sparse", "to_torch_sparse_coo", "to_torch_sparse_csr",
    "to_torch_sparse_csc",
]


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


# -- torch interop (reference ``sparse_matrix.py:1284-1443``; torch-cpu is
# available in this image, so these are real conversions, not stubs) ---------


def from_torch_sparse(t) -> SparseMatrix:
    """Build from a torch sparse COO/CSR/CSC tensor
    (reference ``python/dgl/sparse/sparse_matrix.py:1284``)."""
    layout = str(t.layout)
    if layout == "torch.sparse_coo":
        t = t.coalesce()
        idx = t.indices().cpu().numpy()
        return from_coo(
            idx[0], idx[1], jnp.asarray(t.values().cpu().numpy()),
            tuple(t.shape),
        )
    if layout in ("torch.sparse_csr", "torch.sparse_csc"):
        t = t.to_sparse_coo().coalesce()
        return from_torch_sparse(t)
    raise ValueError(f"unsupported torch sparse layout {layout}")


def to_torch_sparse_coo(A: SparseMatrix):
    """Reference ``python/dgl/sparse/sparse_matrix.py:1342``."""
    import torch

    idx = torch.from_numpy(
        np.stack([np.asarray(A.row), np.asarray(A.col)]).astype(np.int64)
    )
    return torch.sparse_coo_tensor(
        idx, torch.from_numpy(np.asarray(A.val)), size=A.shape
    )


def to_torch_sparse_csr(A: SparseMatrix):
    """Reference ``python/dgl/sparse/sparse_matrix.py:1373``."""
    return to_torch_sparse_coo(A).coalesce().to_sparse_csr()


def to_torch_sparse_csc(A: SparseMatrix):
    """Reference ``python/dgl/sparse/sparse_matrix.py:1411``."""
    return to_torch_sparse_coo(A).coalesce().to_sparse_csc()
