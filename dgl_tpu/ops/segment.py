"""Segment ops over contiguous segments (reference ``python/dgl/ops/segment.py``).

``segment_reduce`` takes **segment lengths** (like the reference's
``_CAPI_DGLKernelSegmentReduce``, ``src/array/kernel.cc:658``); segment ids
are expanded with a static total length so everything stays jit-friendly.
``segment_mm`` is the sorted per-relation dense matmul used by TypedLinear /
R-GCN (reference ``src/array/cuda/gather_mm.cu`` SegmentMM).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..base import DGLError

__all__ = ["segment_reduce", "segment_softmax", "segment_mm"]


def _seg_ids(seglen, total):
    n = seglen.shape[0]
    return jnp.repeat(
        jnp.arange(n, dtype=jnp.int32), seglen, total_repeat_length=total
    )


def segment_reduce(seglen, value, reducer="sum"):
    """Reduce contiguous segments of ``value`` (reference ``segment.py:8``).

    ``seglen``: (N,) lengths summing to value.shape[0] (static total).
    """
    n = seglen.shape[0]
    ids = _seg_ids(seglen, value.shape[0])
    if reducer in ("sum", "mean"):
        out = jax.ops.segment_sum(
            value, ids, num_segments=n, indices_are_sorted=True
        )
        if reducer == "mean":
            deg = jnp.maximum(seglen, 1).astype(out.dtype)
            deg = deg.reshape((n,) + (1,) * (out.ndim - 1))
            out = out / deg
        return out
    if reducer in ("max", "min"):
        seg = jax.ops.segment_max if reducer == "max" else jax.ops.segment_min
        out = seg(value, ids, num_segments=n, indices_are_sorted=True)
        mask = (seglen > 0).reshape((n,) + (1,) * (out.ndim - 1))
        return jnp.where(mask, out, jnp.zeros_like(out))
    raise DGLError(f"Unknown reducer {reducer!r}")


def segment_softmax(seglen, value):
    """Softmax within each contiguous segment (reference ``segment.py:56``)."""
    n = seglen.shape[0]
    ids = _seg_ids(seglen, value.shape[0])
    smax = jax.ops.segment_max(value, ids, num_segments=n, indices_are_sorted=True)
    smax = jnp.where(jnp.isfinite(smax), smax, 0.0)
    z = jnp.exp(value - smax[ids])
    ssum = jax.ops.segment_sum(z, ids, num_segments=n, indices_are_sorted=True)
    return z / jnp.maximum(ssum, 1e-38)[ids]


def segment_mm(a, b, seglen_a):
    """Per-segment dense matmul: segment i of ``a`` @ ``b[i]``.

    Reference: ``dgl.ops.segment_mm`` -> ``SegmentMM``
    (``src/array/kernel.cc:94-150``). TPU-native formulation: one-hot select
    of the per-row weight, contracted on the MXU via einsum — no dynamic
    shapes, all FLOPs land on the systolic array. For few segments (R-GCN's
    per-etype weights) this is near-optimal; for static seglens a Python loop
    of slices would also work but produces R kernels instead of one.
    """
    total = a.shape[0]
    ids = _seg_ids(seglen_a, total)
    onehot = jax.nn.one_hot(ids, b.shape[0], dtype=a.dtype)  # (E, R)
    # out[e] = a[e] @ b[ids[e]] == einsum over one-hot relation selector
    return jnp.einsum(
        "ek,rkn,er->en", a, b, onehot, preferred_element_type=jnp.float32
    ).astype(a.dtype)
