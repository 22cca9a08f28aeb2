"""SparseMatrix class (reference ``python/dgl/sparse/sparse_matrix.py:8``)."""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..base import DGLError
from ..graph import Relation

__all__ = [
    "SparseMatrix", "spmatrix", "from_coo", "from_csr", "from_csc",
    "val_like", "diag", "identity",
]


class SparseMatrix:
    """COO-backed sparse matrix with cached CSR/CSC (via Relation).

    ``val`` is (nnz,) or (nnz, d) like the reference (vector-valued nnz for
    multi-head attention matrices).
    """

    def __init__(self, rel: Relation, val):
        self._rel = rel
        self.val = val

    # -- basic properties ----------------------------------------------------

    @property
    def shape(self) -> Tuple[int, int]:
        return (self._rel.num_src, self._rel.num_dst)

    @property
    def nnz(self) -> int:
        return self._rel.num_edges

    @property
    def dtype(self):
        return self.val.dtype

    @property
    def row(self):
        return self._rel.src

    @property
    def col(self):
        return self._rel.dst

    def coo(self):
        return self.row, self.col

    def csr(self):
        r = self._rel
        return r.csr_indptr, r.csr_indices, r.csr_eids

    def csc(self):
        r = self._rel
        return r.csc_indptr, r.csc_indices, r.csc_eids

    def indices(self):
        return jnp.stack([self.row, self.col])

    # -- conversion ----------------------------------------------------------

    def to_dense(self):
        n, m = self.shape
        v = self.val
        out_shape = (n, m) + v.shape[1:]
        dense = jnp.zeros(out_shape, v.dtype)
        return dense.at[self.row, self.col].add(v)

    def t(self) -> "SparseMatrix":
        return SparseMatrix(self._rel.reverse(), self.val)

    @property
    def T(self):
        return self.t()

    def transpose(self):
        return self.t()

    # -- elementwise ---------------------------------------------------------

    def _ew(self, other, op):
        if isinstance(other, SparseMatrix):
            if self.shape != other.shape:
                raise DGLError("shape mismatch")
            # same sparsity fast path
            if self._rel is other._rel or (
                self.nnz == other.nnz
                and bool(jnp.all(self.row == other.row))
                and bool(jnp.all(self.col == other.col))
            ):
                return SparseMatrix(self._rel, op(self.val, other.val))
            if op in (_add, _sub):
                # merge sparsity patterns on host
                return _merge(self, other, op)
            raise DGLError(
                "elementwise mul/div require identical sparsity patterns"
            )
        return SparseMatrix(self._rel, op(self.val, other))

    def __add__(self, other):
        return self._ew(other, _add)

    def __sub__(self, other):
        return self._ew(other, _sub)

    def __mul__(self, other):
        return self._ew(other, _mul)

    def __rmul__(self, other):
        return self._ew(other, _mul)

    def __truediv__(self, other):
        return self._ew(other, _div)

    def __pow__(self, p):
        return SparseMatrix(self._rel, self.val ** p)

    def __neg__(self):
        return SparseMatrix(self._rel, -self.val)

    def __matmul__(self, other):
        from .matmul import matmul

        return matmul(self, other)

    # -- reductions ----------------------------------------------------------

    def reduce(self, op: str = "sum", dim: Optional[int] = None):
        from .reduction import reduce as _reduce

        return _reduce(self, op, dim)

    def sum(self, dim: Optional[int] = None):
        return self.reduce("sum", dim)

    def smax(self, dim: Optional[int] = None):
        return self.reduce("smax", dim)

    def smin(self, dim: Optional[int] = None):
        return self.reduce("smin", dim)

    def smean(self, dim: Optional[int] = None):
        return self.reduce("smean", dim)

    def sprod(self, dim: Optional[int] = None):
        return self.reduce("sprod", dim)

    def softmax(self, dim: int = 1):
        from .softmax_mod import softmax as _softmax

        return _softmax(self, dim)

    def coalesce(self) -> "SparseMatrix":
        """Merge duplicate (row, col) entries (reference ``coalesce``)."""
        r, c = np.asarray(self.row), np.asarray(self.col)
        pairs = np.stack([r, c], 1)
        uniq, inv = np.unique(pairs, axis=0, return_inverse=True)
        val = jax.ops.segment_sum(
            self.val, jnp.asarray(inv), num_segments=uniq.shape[0]
        )
        return from_coo(
            jnp.asarray(uniq[:, 0]), jnp.asarray(uniq[:, 1]), val, self.shape
        )

    def has_duplicate(self) -> bool:
        r, c = np.asarray(self.row), np.asarray(self.col)
        return len(np.unique(np.stack([r, c], 1), axis=0)) < self.nnz

    def is_diag(self) -> bool:
        return bool(jnp.all(self.row == self.col))

    def __repr__(self):
        return (
            f"SparseMatrix(indices={self.indices().shape}, "
            f"values={self.val.shape}, shape={self.shape}, nnz={self.nnz})"
        )


def _add(a, b):
    return a + b


def _sub(a, b):
    return a - b


def _mul(a, b):
    return a * b


def _div(a, b):
    return a / b


def _merge(a: SparseMatrix, b: SparseMatrix, op):
    """Union-of-patterns add/sub (host path, reference CSRSum)."""
    ra, ca = np.asarray(a.row), np.asarray(a.col)
    rb, cb = np.asarray(b.row), np.asarray(b.col)
    rows = np.concatenate([ra, rb])
    cols = np.concatenate([ca, cb])
    sign = 1.0 if op is _add else -1.0
    vals = jnp.concatenate([a.val, sign * b.val])
    pairs = np.stack([rows, cols], 1)
    uniq, inv = np.unique(pairs, axis=0, return_inverse=True)
    val = jax.ops.segment_sum(
        vals, jnp.asarray(inv), num_segments=uniq.shape[0]
    )
    return from_coo(
        jnp.asarray(uniq[:, 0]), jnp.asarray(uniq[:, 1]), val, a.shape
    )


# -- constructors ------------------------------------------------------------


def from_coo(row, col, val=None, shape=None) -> SparseMatrix:
    """(reference ``sparse_matrix.py`` ``from_coo``)."""
    row = jnp.asarray(row)
    col = jnp.asarray(col)
    if shape is None:
        shape = (int(row.max()) + 1 if row.size else 0,
                 int(col.max()) + 1 if col.size else 0)
    if val is None:
        val = jnp.ones((row.shape[0],), jnp.float32)
    rel = Relation.from_coo(
        np.asarray(row), np.asarray(col), shape[0], shape[1]
    )
    return SparseMatrix(rel, jnp.asarray(val))


spmatrix = from_coo


def from_csr(indptr, indices, val=None, shape=None) -> SparseMatrix:
    indptr = np.asarray(indptr)
    indices = np.asarray(indices)
    n = indptr.shape[0] - 1
    m = shape[1] if shape is not None else (int(indices.max()) + 1 if indices.size else 0)
    row = np.repeat(np.arange(n), np.diff(indptr))
    return from_coo(row, indices, val, (n, m))


def from_csc(indptr, indices, val=None, shape=None) -> SparseMatrix:
    indptr = np.asarray(indptr)
    indices = np.asarray(indices)
    m = indptr.shape[0] - 1
    n = shape[0] if shape is not None else (int(indices.max()) + 1 if indices.size else 0)
    col = np.repeat(np.arange(m), np.diff(indptr))
    return from_coo(indices, col, val, (n, m))


def val_like(mat: SparseMatrix, val) -> SparseMatrix:
    """Same sparsity, new values (reference ``val_like``)."""
    return SparseMatrix(mat._rel, jnp.asarray(val))


def diag(val, shape=None) -> SparseMatrix:
    val = jnp.asarray(val)
    n = val.shape[0]
    shape = shape or (n, n)
    idx = jnp.arange(n)
    return from_coo(idx, idx, val, shape)


def identity(shape, d=None, dtype=jnp.float32) -> SparseMatrix:
    n = min(shape)
    val = jnp.ones((n,) if d is None else (n, d), dtype)
    return diag(val, shape)
