"""Graph-level readout over (batched) graphs.

Reference: ``python/dgl/readout.py:26-775``. All ops reduce node/edge
features per graph in a batch using ``batch_num_nodes``/``batch_num_edges``
as segment lengths — a sorted segment reduction, the same TPU-friendly
primitive as g-SpMM.
"""
from __future__ import annotations

import jax.numpy as jnp

from .base import DGLError
from .graph import Graph
from .ops.segment import segment_reduce, segment_softmax, _seg_ids

__all__ = [
    "readout_nodes",
    "readout_edges",
    "sum_nodes",
    "mean_nodes",
    "max_nodes",
    "sum_edges",
    "mean_edges",
    "max_edges",
    "softmax_nodes",
    "softmax_edges",
    "broadcast_nodes",
    "broadcast_edges",
    "topk_nodes",
    "topk_edges",
]


def _node_feat(g: Graph, feat, ntype):
    nt = ntype or (g.ntypes[0] if len(g.ntypes) == 1 else None)
    if nt is None:
        raise DGLError("ntype required for heterogeneous graphs")
    return g._node_frames[nt][feat], g.batch_num_nodes(nt)


def _edge_feat(g: Graph, feat, etype):
    cet = g.to_canonical_etype(etype)
    return g._edge_frames[cet][feat], g.batch_num_edges(cet)


def _weighted(x, g, weight, kind, type_name):
    if weight is None:
        return x
    if kind == "node":
        w, _ = _node_feat(g, weight, type_name)
    else:
        w, _ = _edge_feat(g, weight, type_name)
    while w.ndim < x.ndim:
        w = w[..., None]
    return x * w


def readout_nodes(g: Graph, feat, weight=None, op="sum", ntype=None):
    """Per-graph node readout (reference ``readout.py:26``)."""
    x, seglen = _node_feat(g, feat, ntype)
    x = _weighted(x, g, weight, "node", ntype)
    return segment_reduce(seglen, x, op)


def readout_edges(g: Graph, feat, weight=None, op="sum", etype=None):
    """Per-graph edge readout (reference ``readout.py:163``)."""
    x, seglen = _edge_feat(g, feat, etype)
    x = _weighted(x, g, weight, "edge", etype)
    return segment_reduce(seglen, x, op)


def sum_nodes(g, feat, weight=None, ntype=None):
    return readout_nodes(g, feat, weight, "sum", ntype)


def mean_nodes(g, feat, weight=None, ntype=None):
    return readout_nodes(g, feat, weight, "mean", ntype)


def max_nodes(g, feat, weight=None, ntype=None):
    return readout_nodes(g, feat, weight, "max", ntype)


def sum_edges(g, feat, weight=None, etype=None):
    return readout_edges(g, feat, weight, "sum", etype)


def mean_edges(g, feat, weight=None, etype=None):
    return readout_edges(g, feat, weight, "mean", etype)


def max_edges(g, feat, weight=None, etype=None):
    return readout_edges(g, feat, weight, "max", etype)


def softmax_nodes(g, feat, ntype=None):
    """Per-graph softmax over nodes (reference ``readout.py:392``)."""
    x, seglen = _node_feat(g, feat, ntype)
    return segment_softmax(seglen, x)


def softmax_edges(g, feat, etype=None):
    x, seglen = _edge_feat(g, feat, etype)
    return segment_softmax(seglen, x)


def broadcast_nodes(g: Graph, graph_feat, ntype=None):
    """Copy per-graph features to every node (reference ``readout.py:493``)."""
    nt = ntype or (g.ntypes[0] if len(g.ntypes) == 1 else None)
    seglen = g.batch_num_nodes(nt)
    total = g.num_nodes(nt)
    ids = _seg_ids(seglen, total)
    return graph_feat[ids]


def broadcast_edges(g: Graph, graph_feat, etype=None):
    cet = g.to_canonical_etype(etype)
    seglen = g.batch_num_edges(cet)
    total = g._relations[cet].num_edges_padded
    ids = _seg_ids(seglen, total)
    return graph_feat[ids]


def _topk(x, seglen, k, descending, sortby):
    """Per-segment top-k with padding (+-inf) for short segments."""
    n = seglen.shape[0]
    total = x.shape[0]
    ids = _seg_ids(seglen, total)
    key = x if sortby is None else x[..., sortby]
    if key.ndim > 1:
        raise DGLError("topk with sortby expects 2D features")
    fill = -jnp.inf if descending else jnp.inf
    # dense (B, max_nodes) matrix of keys
    maxlen = int(jnp.max(seglen)) if total else 0
    maxlen = max(maxlen, k)
    pos = jnp.arange(total) - jnp.cumsum(
        jnp.concatenate([jnp.zeros(1, seglen.dtype), seglen[:-1]])
    )[ids]
    dense = jnp.full((n, maxlen), fill, dtype=key.dtype)
    dense = dense.at[ids, pos].set(key)
    denseidx = jnp.full((n, maxlen), 0, dtype=jnp.int32)
    denseidx = denseidx.at[ids, pos].set(jnp.arange(total, dtype=jnp.int32))
    order = jnp.argsort(-dense if descending else dense, axis=1)[:, :k]
    sel = jnp.take_along_axis(denseidx, order, axis=1)  # (B, k) global ids
    vals = x[sel]  # (B, k, ...) via gather
    return vals, sel


def topk_nodes(g: Graph, feat, k, descending=True, sortby=None, ntype=None):
    """Per-graph top-k nodes by feature (reference ``readout.py:560``)."""
    x, seglen = _node_feat(g, feat, ntype)
    return _topk(x, seglen, k, descending, sortby)


def topk_edges(g: Graph, feat, k, descending=True, sortby=None, etype=None):
    x, seglen = _edge_feat(g, feat, etype)
    return _topk(x, seglen, k, descending, sortby)
