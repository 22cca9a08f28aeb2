"""Edge softmax: softmax over incoming edges of each destination node.

Equivalent of ``python/dgl/ops/edge_softmax.py:12`` + the fused
``Edge_softmax_csr_forward/backward`` kernels (``src/array/kernel.cc:542-562``)
and the composed gspmm(max)/gsddmm(sub)/exp/gspmm(sum)/gsddmm(div) path.

The custom VJP saves only the softmax output, mirroring
``EdgeSoftmax.backward`` (``python/dgl/backend/pytorch/sparse.py:685``):
    grad_e = out * (grad_out - sum_per_dst(out * grad_out) gathered at dst)
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..graph import Graph, Relation

__all__ = ["edge_softmax"]


def _seg_to_edges(rel: Relation, node_vals):
    """Gather per-dst-node values back to edges (eid order)."""
    return node_vals[rel.dst]


def _uniform_reshape(rel, logits):
    """(B, f, *feat) view of per-edge values with the validity mask, for
    uniform-stride MFG blocks (no scatter — see ops/spmm.py)."""
    f, B = rel.uniform_stride, rel.num_dst
    E = B * f
    dst = rel.dst[:E]
    stripe = jnp.repeat(jnp.arange(B, dtype=dst.dtype), f)
    valid = (dst == stripe).reshape((B, f) + (1,) * (logits.ndim - 1))
    z = logits[:E].reshape((B, f) + logits.shape[1:])
    return z, valid


@partial(jax.custom_vjp, nondiff_argnums=(1,))
def _edge_softmax(rel: Relation, norm_by, logits):
    # uniform-stride MFG blocks: masked per-stripe softmax, no segment ops
    if rel.uniform_stride > 0 and norm_by == "dst":
        z, valid = _uniform_reshape(rel, logits)
        zm = jnp.where(valid, z, -jnp.inf)
        m = jnp.max(zm, axis=1, keepdims=True)
        m = jnp.where(jnp.isfinite(m), m, 0.0)
        ez = jnp.where(valid, jnp.exp(z - m), 0.0)
        s = jnp.maximum(ez.sum(axis=1, keepdims=True), 1e-38)
        return (ez / s).reshape(logits.shape).astype(logits.dtype)
    # shell fast path (ops/shell_spmm.py): max and exp-sum accumulate over
    # degree-ranked prefixes — no sorted segment reductions at all
    if rel.shell_plan is not None and norm_by in ("dst", "src"):
        from .shell_spmm import shell_edge_softmax

        return shell_edge_softmax(rel.shell_plan, logits, norm_by=norm_by)
    if norm_by == "src":
        rel = rel.reverse()
    # Numerically-stable softmax: segment reductions run over the sorted
    # (CSC) view; the result is re-expressed in eid order with pure gathers
    # (recompute exp rather than scatter-permute — cheaper on TPU).
    m_sorted = logits[rel.csc_eids]
    smax = jax.ops.segment_max(
        m_sorted, rel.csc_dst, num_segments=rel.num_dst, indices_are_sorted=True
    )
    smax = jnp.where(jnp.isfinite(smax), smax, 0.0)
    z_sorted = jnp.exp(m_sorted - smax[rel.csc_dst])
    ssum = jax.ops.segment_sum(
        z_sorted, rel.csc_dst, num_segments=rel.num_dst, indices_are_sorted=True
    )
    return jnp.exp(logits - smax[rel.dst]) / jnp.maximum(ssum, 1e-38)[rel.dst]


def _edge_softmax_fwd(rel, norm_by, logits):
    out = _edge_softmax(rel, norm_by, logits)
    return out, (rel, out)


def _edge_softmax_bwd(norm_by, res, dz):
    rel, out = res
    sds = out * dz
    if rel.uniform_stride > 0 and norm_by == "dst":
        f, B = rel.uniform_stride, rel.num_dst
        sds_r = sds.reshape((B, f) + sds.shape[1:])
        out_r = out.reshape((B, f) + out.shape[1:])
        accum = sds_r.sum(axis=1, keepdims=True)
        return (None, (sds_r - out_r * accum).reshape(out.shape)
                .astype(dz.dtype))
    if rel.shell_plan is not None and norm_by in ("dst", "src"):
        from .shell_spmm import shell_edge_acc

        plan = rel.shell_plan
        if norm_by == "dst":
            shells, resid, n_out, rank_eid = (
                plan.shells, plan.res_dst, plan.num_dst, plan.dst_rank_eid)
        else:
            shells, resid, n_out, rank_eid = (
                plan.rev_shells, plan.res_src, plan.num_src,
                plan.src_rank_eid)
        accum = shell_edge_acc(shells, n_out, sds, kind="sum",
                               residual=resid)[rank_eid]
        while accum.ndim < sds.ndim:
            accum = accum[..., None]
        return (None, (sds - out * accum).astype(dz.dtype))
    if norm_by == "src":
        rel = rel.reverse()
    accum = jax.ops.segment_sum(
        sds[rel.csc_eids],
        rel.csc_dst,
        num_segments=rel.num_dst,
        indices_are_sorted=True,
    )
    grad = sds - out * accum[rel.dst]
    return (None, grad)


_edge_softmax.defvjp(_edge_softmax_fwd, _edge_softmax_bwd)


def edge_softmax(graph, logits, eids=None, norm_by="dst", etype=None):
    """Edge softmax (reference ``python/dgl/ops/edge_softmax.py:12``).

    ``logits``: (E, *) edge logits in eid order. Returns normalized scores of
    the same shape. ``norm_by='dst'`` normalizes over each node's incoming
    edges (the GAT convention); ``'src'`` over outgoing edges.
    """
    rel = graph._relation(etype) if isinstance(graph, Graph) else graph
    if eids is not None:
        # softmax over the edge subset only (reference semantics): other
        # edges contribute -inf logits and receive zeros, shapes stay static
        import numpy as np

        mask = np.zeros(rel.num_edges_padded, bool)
        mask[np.asarray(eids)] = True
        maskj = jnp.asarray(mask).reshape(
            (-1,) + (1,) * (logits.ndim - 1)
        )
        neg = jnp.full_like(logits, -jnp.inf)
        out = _edge_softmax(rel, norm_by, jnp.where(maskj, logits, neg))
        return jnp.where(maskj, out, 0.0)
    return _edge_softmax(rel, norm_by, logits)
