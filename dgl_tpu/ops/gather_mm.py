"""gather_mm: per-row dense matmul with a per-row selected weight matrix.

Reference: ``python/dgl/ops/gather_mm.py`` -> ``GatherMM``
(``src/array/cuda/gather_mm.cu``, ``src/array/kernel.cc:501-541``), the kernel
behind ``TypedLinear`` / R-GCN typed message projection.

TPU-native design: instead of per-row gathered GEMMs (a scatter/gather
pattern the MXU can't pipeline), contract through a one-hot relation
selector with ``einsum`` — XLA maps it onto the MXU as a single batched
matmul. FLOPs scale with num_rel, so for many relations prefer
``segment_mm`` on relation-sorted rows (static per-relation counts).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["gather_mm"]


def gather_mm(a, b, idx_b):
    """out[i] = a[i] @ b[idx_b[i]] (reference ``ops/gather_mm.py:8``).

    a: (N, K); b: (R, K, M); idx_b: (N,) int. Returns (N, M).
    """
    onehot = jax.nn.one_hot(idx_b, b.shape[0], dtype=a.dtype)  # (N, R)
    return jnp.einsum(
        "nk,rkm,nr->nm", a, b, onehot, preferred_element_type=jnp.float32
    ).astype(a.dtype)
