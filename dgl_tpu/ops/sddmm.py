"""Generalized SDDMM (g-SDDMM): per-edge binary ops between node/edge data.

TPU-native equivalent of ``python/dgl/ops/sddmm.py`` ->
``_CAPI_DGLKernelSDDMM`` (``src/array/kernel.cc:603``) -> ``SDDMMCsr/Coo``
(``src/array/cpu/sddmm.h``, ``src/array/cuda/sddmm.cuh``).

Edges are produced in eid (COO) order via plain gathers from src/dst rows;
XLA fuses gather + elementwise + (for ``dot``) the lane reduction. The custom
VJP mirrors ``GSDDMM.backward`` (``python/dgl/backend/pytorch/sparse.py:443``):
node-target grads are sorted segment sums over the matching CSR/CSC side.
"""
from __future__ import annotations

import sys
from functools import partial

import jax
import jax.numpy as jnp

from ..base import DGLError
from ..graph import Graph, Relation
from .spmm import _reduce_grad, _expand

__all__ = ["gsddmm"]


def _gather_target(rel: Relation, target, data):
    """Bring node/edge data into eid order for the given target."""
    if target == "u":
        return data[rel.src]
    if target == "v":
        return data[rel.dst]
    if target == "e":
        return data
    raise DGLError(f"Unknown sddmm target {target!r}")


def _scatter_target(rel: Relation, target, grad_eid_order):
    """Transpose of ``_gather_target``: sorted segment-sum back to the target."""
    if target == "u":
        dm = grad_eid_order[rel.csr_eids]
        return jax.ops.segment_sum(
            dm, rel.csr_src, num_segments=rel.num_src, indices_are_sorted=True
        )
    if target == "v":
        dm = grad_eid_order[rel.csc_eids]
        return jax.ops.segment_sum(
            dm, rel.csc_dst, num_segments=rel.num_dst, indices_are_sorted=True
        )
    if target == "e":
        return grad_eid_order
    raise DGLError(target)


def _mask_pad(rel: Relation, x):
    if rel.num_edges == rel.num_edges_padded:
        return x
    return jnp.where(_expand(rel.edge_mask(), x.ndim), x, 0)


@partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2))
def _gsddmm(op, lhs_target, rhs_target, rel: Relation, lhs, rhs):
    L = _gather_target(rel, lhs_target, lhs) if lhs is not None else None
    R = _gather_target(rel, rhs_target, rhs) if rhs is not None else None
    if L is not None and R is not None:
        nd = max(L.ndim, R.ndim)
        L, R = _expand(L, nd), _expand(R, nd)
    if op == "add":
        out = L + R
    elif op == "sub":
        out = L - R
    elif op == "mul":
        out = L * R
    elif op == "div":
        out = L / R
    elif op == "dot":
        out = (L * R).sum(axis=-1, keepdims=True)
    elif op == "copy_lhs":
        out = L
    elif op == "copy_rhs":
        out = R
    else:
        raise DGLError(f"Unknown sddmm op {op!r}")
    return out


def _gsddmm_fwd(op, lhs_target, rhs_target, rel, lhs, rhs):
    return _gsddmm(op, lhs_target, rhs_target, rel, lhs, rhs), (rel, lhs, rhs)


def _gsddmm_bwd(op, lhs_target, rhs_target, res, dz):
    rel, lhs, rhs = res
    dz = _mask_pad(rel, dz)
    dlhs = drhs = None
    if lhs is not None and op != "copy_rhs":
        if op in ("copy_lhs", "add"):
            dL = dz
        elif op == "sub":
            dL = dz
        elif op == "mul":
            dL = dz * _expand(_gather_target(rel, rhs_target, rhs), dz.ndim)
        elif op == "div":
            dL = dz / _expand(_gather_target(rel, rhs_target, rhs), dz.ndim)
        elif op == "dot":
            dL = dz * _gather_target(rel, rhs_target, rhs)  # dz broadcasts over lanes
        else:
            raise DGLError(op)
        dlhs = _scatter_target(rel, lhs_target, dL)
        dlhs = _reduce_grad(dlhs, lhs.shape).astype(lhs.dtype)
    if rhs is not None and op != "copy_lhs":
        Lg = None if lhs is None else _gather_target(rel, lhs_target, lhs)
        if op in ("copy_rhs", "add"):
            dR = dz
        elif op == "sub":
            dR = -dz
        elif op == "mul":
            dR = dz * _expand(Lg, dz.ndim)
        elif op == "div":
            Rg = _gather_target(rel, rhs_target, rhs)
            nd = max(dz.ndim, Rg.ndim)
            Rg = _expand(Rg, nd)
            dR = -dz * _expand(Lg, nd) / (Rg * Rg)
        elif op == "dot":
            dR = dz * Lg
        else:
            raise DGLError(op)
        drhs = _scatter_target(rel, rhs_target, dR)
        drhs = _reduce_grad(drhs, rhs.shape).astype(rhs.dtype)
    return (None, dlhs, drhs)


_gsddmm.defvjp(_gsddmm_fwd, _gsddmm_bwd)


def gsddmm(g, op, lhs_data, rhs_data, lhs_target="u", rhs_target="v", etype=None):
    """Per-edge op between node/edge data (reference ``ops/sddmm.py:13``)."""
    rel = g._relation(etype) if isinstance(g, Graph) else g
    lhs, rhs = lhs_data, rhs_data
    if op not in ("copy_lhs", "copy_rhs") and lhs is not None and rhs is not None:
        nd = max(lhs.ndim, rhs.ndim)
        lhs, rhs = _expand(lhs, nd), _expand(rhs, nd)
    return _gsddmm(op, lhs_target, rhs_target, rel, lhs, rhs)


def _gen_sddmm_func(lhs_target, rhs_target, binary_op):
    name = f"{lhs_target}_{binary_op}_{rhs_target}"

    def func(g, x, y, etype=None):
        return gsddmm(
            g, binary_op, x, y, lhs_target=lhs_target, rhs_target=rhs_target, etype=etype
        )

    func.__name__ = name
    func.__doc__ = (
        f"Edge value = {lhs_target} {binary_op} {rhs_target} "
        f"(generated like reference ``ops/sddmm.py``)."
    )
    return func


def _register():
    mod = sys.modules[__name__]
    targets = ["u", "v", "e"]
    for lt in targets:
        for rt in targets:
            if lt == rt:
                continue
            for op in ["add", "sub", "mul", "div", "dot"]:
                func = _gen_sddmm_func(lt, rt, op)
                setattr(mod, func.__name__, func)
                __all__.append(func.__name__)

    def copy_u(g, x, etype=None):
        return gsddmm(g, "copy_lhs", x, None, lhs_target="u", etype=etype)

    def copy_v(g, x, etype=None):
        return gsddmm(g, "copy_lhs", x, None, lhs_target="v", etype=etype)

    copy_u.__name__ = "copy_u"
    copy_v.__name__ = "copy_v"
    setattr(mod, "copy_u", copy_u)
    setattr(mod, "copy_v", copy_v)
    __all__.extend(["copy_u", "copy_v"])


_register()
