"""Generalized SpMM (g-SpMM): fused message + reduce over the graph.

TPU-native equivalent of the reference kernel stack
``python/dgl/ops/spmm.py:39`` -> ``_CAPI_DGLKernelSpMM``
(``src/array/kernel.cc:473``) -> ``SpMMCsr`` (CPU ``src/array/cpu/spmm.h:47``,
CUDA ``src/array/cuda/spmm.cuh:30``).

Design: edges are consumed in CSC (dst-sorted) order so the reduction is a
*sorted* segment reduction — the layout XLA lowers best on TPU; padded edges
carry ``dst == num_dst`` which ``jax.ops.segment_*`` drops (out-of-range ids
are discarded), so padded graphs need no masking on this path.

The custom VJP mirrors the hand-derived backward rules of the reference's
``GSpMM`` autograd function (``python/dgl/backend/pytorch/sparse.py:162-248``):

- dX (lhs grad) = g-SpMM on the **reverse** graph (we use the CSR side, whose
  per-edge ``csr_src`` ids are sorted, again a sorted segment sum);
- dY (rhs grad) = g-SDDMM-style per-edge product in eid order;
- gradients are summed over broadcast dims like ``_reduce_grad``
  (``backend/pytorch/sparse.py:43``).

Saving only (u, e) and re-gathering in the backward avoids materializing the
(E, feat) message tensor as an autodiff residual — the same memory win the
reference gets from its fused CUDA kernels.
"""
from __future__ import annotations

import sys
from functools import partial

import jax
import jax.numpy as jnp

from ..base import DGLError
from ..graph import Graph, Relation

__all__ = ["gspmm", "copy_u_sum"]  # extended by _register below


def _reduce_grad(grad, shape):
    """Sum gradient over broadcast dims (reference ``sparse.py:43``)."""
    grad_shape = grad.shape[1:]
    in_shape = tuple(shape[1:])
    if grad_shape == in_shape:
        return grad
    num_to_squeeze = len(grad_shape) - len(in_shape)
    in_shape_pad = (1,) * num_to_squeeze + in_shape
    axes = tuple(
        i + 1
        for i, (g, s) in enumerate(zip(grad_shape, in_shape_pad))
        if s == 1 and g > 1
    )
    if axes:
        grad = grad.sum(axis=axes, keepdims=True)
    if num_to_squeeze:
        grad = grad.reshape(grad.shape[:1] + in_shape)
    return grad


def _expand(x, ndim):
    """Right-pad feature dims so a 1-D array broadcasts like DGL ops do."""
    while x.ndim < ndim:
        x = x[..., None]
    return x


def _binary(op, lhs, rhs):
    if op == "add":
        return lhs + rhs
    if op == "sub":
        return lhs - rhs
    if op == "mul":
        return lhs * rhs
    if op == "div":
        return lhs / rhs
    if op == "copy_lhs":
        return lhs
    if op == "copy_rhs":
        return rhs
    raise DGLError(f"Unknown spmm binary op {op!r}")


def _gather_messages_csc(rel: Relation, op, u, e):
    """Per-edge messages in CSC (dst-sorted) order."""
    ul = u[rel.csc_indices] if op != "copy_rhs" else None
    el = e[rel.csc_eids] if op != "copy_lhs" else None
    if ul is not None and el is not None:
        nd = max(ul.ndim, el.ndim)
        ul, el = _expand(ul, nd), _expand(el, nd)
    return _binary(op, ul, el)


# ---------------------------------------------------------------------------
# sum reducer with custom VJP
# ---------------------------------------------------------------------------


@partial(jax.custom_vjp, nondiff_argnums=(0,))
def _gspmm_sum(op, rel: Relation, u, e):
    m = _gather_messages_csc(rel, op, u, e)
    return jax.ops.segment_sum(
        m, rel.csc_dst, num_segments=rel.num_dst, indices_are_sorted=True
    )


def _gspmm_sum_fwd(op, rel, u, e):
    return _gspmm_sum(op, rel, u, e), (rel, u, e)


def _gspmm_sum_bwd(op, res, dz):
    rel, u, e = res
    du = de = None
    padded = rel.num_edges != rel.num_edges_padded

    if op != "copy_rhs" and u is not None:
        # dU via the reverse (CSR-side) sorted segment sum.
        dz_e = dz[rel.csr_indices]  # per-edge dZ at dst, CSR order
        if op in ("copy_lhs", "add", "sub"):
            dm = dz_e
        elif op == "mul":
            dm = dz_e * _expand(e[rel.csr_eids], dz_e.ndim)
        elif op == "div":
            dm = dz_e / _expand(e[rel.csr_eids], dz_e.ndim)
        else:
            raise DGLError(op)
        du = jax.ops.segment_sum(
            dm, rel.csr_src, num_segments=rel.num_src, indices_are_sorted=True
        )
        du = _reduce_grad(du, u.shape).astype(u.dtype)

    if op != "copy_lhs" and e is not None:
        dz_d = dz[rel.dst]  # eid order
        if op in ("copy_rhs", "add"):
            de = dz_d
        elif op == "sub":
            de = -dz_d
        elif op == "mul":
            de = dz_d * _expand(u[rel.src], dz_d.ndim)
        elif op == "div":
            eu = _expand(u[rel.src], dz_d.ndim)
            ee = _expand(e, dz_d.ndim)
            de = -dz_d * eu / (ee * ee)
        else:
            raise DGLError(op)
        if padded:
            mask = _expand(rel.edge_mask(), de.ndim)
            de = jnp.where(mask, de, 0)
        de = _reduce_grad(de, e.shape).astype(e.dtype)

    return (None, du, de)


_gspmm_sum.defvjp(_gspmm_sum_fwd, _gspmm_sum_bwd)


# ---------------------------------------------------------------------------
# uniform-stride reducer (fixed-shape MFG blocks): edge position d*f+j
# belongs to dst d or the padding sink, so the segment reduction is a
# masked reshape+reduce — gather + dense ops only, no scatter (the measured
# scatter lowering costs ~14 ns/edge on v5e; see docs/performance.md)
# ---------------------------------------------------------------------------


def _gspmm_uniform(op, reduce_op, rel: Relation, u, e):
    f = rel.uniform_stride
    B = rel.num_dst
    E = B * f
    src = rel.src[:E]
    dst = rel.dst[:E]
    stripe = jnp.repeat(jnp.arange(B, dtype=dst.dtype), f)
    valid = dst == stripe
    ul = u[src] if op != "copy_rhs" else None
    el = e[:E] if op != "copy_lhs" else None
    if ul is not None and el is not None:
        nd = max(ul.ndim, el.ndim)
        ul, el = _expand(ul, nd), _expand(el, nd)
    m = _binary(op, ul, el)
    v = valid.reshape((E,) + (1,) * (m.ndim - 1))
    feat = m.shape[1:]
    if reduce_op in ("sum", "mean"):
        out = jnp.where(v, m, 0).reshape((B, f) + feat).sum(axis=1)
        if reduce_op == "mean":
            deg = jnp.maximum(rel.in_degrees(), 1).astype(out.dtype)
            out = out / _expand(deg, out.ndim)
        return out
    big = jnp.asarray(jnp.inf, m.dtype)
    fill = -big if reduce_op == "max" else big
    red = jnp.max if reduce_op == "max" else jnp.min
    out = red(jnp.where(v, m, fill).reshape((B, f) + feat), axis=1)
    count = valid.reshape(B, f).sum(axis=1)
    has = _expand(count > 0, out.ndim)
    return jnp.where(has, out, jnp.zeros_like(out))


# ---------------------------------------------------------------------------
# min/max reducers (plain JAX AD through segment_min/max; grads flow to the
# argmin/argmax positions exactly like the reference's BwdSegmentCmp scatter,
# reference ``src/array/cpu/segment_reduce.h`` / ``kernel.cc:658-707``)
# ---------------------------------------------------------------------------


def _gspmm_cmp(op, reduce_op, rel: Relation, u, e):
    m = _gather_messages_csc(rel, op, u, e)
    seg = jax.ops.segment_max if reduce_op == "max" else jax.ops.segment_min
    out = seg(m, rel.csc_dst, num_segments=rel.num_dst, indices_are_sorted=True)
    # Zero-degree rows: the reference replaces +-inf with 0
    # (``python/dgl/heterograph.py:5117-5123``).
    deg = rel.in_degrees()
    mask = _expand(deg > 0, out.ndim)
    return jnp.where(mask, out, jnp.zeros_like(out))


# ---------------------------------------------------------------------------
# public API
# ---------------------------------------------------------------------------


def gspmm(g, op, reduce_op, lhs_data, rhs_data, etype=None):
    """Fused message+reduce (reference ``python/dgl/ops/spmm.py:39``).

    Parameters mirror the reference: ``op`` in {add, sub, mul, div, copy_lhs,
    copy_rhs}; ``reduce_op`` in {sum, max, min, mean}. ``lhs_data`` are source
    node features, ``rhs_data`` edge features (either may be None for copy
    ops). Returns destination-node features.
    """
    rel = g._relation(etype) if isinstance(g, Graph) else g
    u, e = lhs_data, rhs_data
    if op not in ("copy_lhs", "copy_rhs"):
        if u is None or e is None:
            raise DGLError(f"Binary op {op} needs both operands")
        nd = max(u.ndim, e.ndim)
        u, e = _expand(u, nd), _expand(e, nd)

    # uniform-stride fast path (fixed-shape MFG blocks): masked
    # reshape+reduce, no scatter
    if (
        rel.uniform_stride > 0
        and reduce_op in ("sum", "mean", "max", "min")
        and rel.num_dst * rel.uniform_stride <= rel.src.shape[0]
    ):
        return _gspmm_uniform(op, reduce_op, rel, u, e)

    # packed-bitmap dense fast path (ops/bitmap_spmm.py): adjacency
    # streamed as bits through the MXU — the high-degree (Reddit-class)
    # path, cost independent of E and degree skew
    if (
        rel.bitmap_plan is not None
        and op == "copy_lhs"
        and reduce_op in ("sum", "mean")
        and u is not None
        and u.ndim == 2
    ):
        from .bitmap_spmm import bitmap_copy_u_sum

        out = bitmap_copy_u_sum(rel.bitmap_plan, u)
        if reduce_op == "mean":
            deg = jnp.maximum(rel.in_degrees(), 1).astype(out.dtype)
            out = out / _expand(deg, out.ndim)
        return out

    # dense-hub fast path (ops/hub_spmm.py): MXU matmul for hub edges,
    # sorted-segment for the cold tail; attached via Graph.with_spmm_plans
    if (
        rel.hub_plan is not None
        and op == "copy_lhs"
        and reduce_op in ("sum", "mean")
    ):
        from .hub_spmm import hub_copy_u_sum

        out = hub_copy_u_sum(rel.hub_plan, u)
        if reduce_op == "mean":
            deg = jnp.maximum(rel.in_degrees(), 1).astype(out.dtype)
            out = out / _expand(deg, out.ndim)
        return out

    # full-edge shell fast path (ops/shell_spmm.py): weighted ops with the
    # sum/mean reducer; attached via Graph.with_spmm_plans(weighted=True)
    if rel.shell_plan is not None and reduce_op in ("sum", "mean"):
        from .shell_spmm import shell_gspmm_sum

        out = shell_gspmm_sum(op, rel.shell_plan, u, e)
        if reduce_op == "mean":
            deg = jnp.maximum(rel.in_degrees(), 1).astype(out.dtype)
            out = out / _expand(deg, out.ndim)
        return out

    if reduce_op in ("sum", "mean"):
        out = _gspmm_sum(op, rel, u, e)
        if reduce_op == "mean":
            # mean = sum / in-degree (reference ``ops/spmm.py:109``)
            deg = jnp.maximum(rel.in_degrees(), 1).astype(out.dtype)
            out = out / _expand(deg, out.ndim)
        return out
    if reduce_op in ("max", "min"):
        if rel.shell_plan is not None:
            from .shell_spmm import shell_gspmm_cmp

            return shell_gspmm_cmp(op, reduce_op, rel.shell_plan, u, e,
                                   rel.in_degrees())
        return _gspmm_cmp(op, reduce_op, rel, u, e)
    raise DGLError(f"Unknown reduce op {reduce_op!r}")


def _gen_spmm_func(binary_op, reduce_op):
    name = f"{binary_op}_{reduce_op}" if "_" in binary_op else f"u_{binary_op}_e_{reduce_op}"

    def func(g, x, y, etype=None):
        return gspmm(g, binary_op, reduce_op, x, y, etype=etype)

    func.__name__ = name
    func.__doc__ = (
        f"gspmm with message u {binary_op} e and {reduce_op} reducer "
        f"(generated like reference ``ops/spmm.py:224-241``)."
    )
    return func


def _gen_copy_spmm_func(target, reduce_op):
    name = f"copy_{target}_{reduce_op}"

    def func(g, x, etype=None):
        if target == "u":
            return gspmm(g, "copy_lhs", reduce_op, x, None, etype=etype)
        return gspmm(g, "copy_rhs", reduce_op, None, x, etype=etype)

    func.__name__ = name
    func.__doc__ = f"gspmm copy_{target} with {reduce_op} reducer."
    return func


def _register():
    mod = sys.modules[__name__]
    for binary_op in ["add", "sub", "mul", "div"]:
        for reduce_op in ["sum", "max", "min", "mean"]:
            func = _gen_spmm_func(binary_op, reduce_op)
            fname = f"u_{binary_op}_e_{reduce_op}"
            func.__name__ = fname
            setattr(mod, fname, func)
            __all__.append(fname)
    for target in ["u", "e"]:
        for reduce_op in ["sum", "max", "min", "mean"]:
            func = _gen_copy_spmm_func(target, reduce_op)
            setattr(mod, func.__name__, func)
            if func.__name__ not in __all__:
                __all__.append(func.__name__)


_register()
