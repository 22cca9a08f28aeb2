"""GraphConv (GCN layer).

Reference: ``python/dgl/nn/pytorch/conv/graphconv.py:157`` (class) and
``:419-457`` (forward): symmetric degree normalization, weight applied on the
smaller side of the aggregation, ``update_all(copy_u, sum)`` lowering to
g-SpMM.
"""
from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...base import DGLError
from ... import function as fn
from ..utils_nn import jax_rsqrt


def expand_as_pair(feat, graph=None):
    """Split a feature into (src, dst) like reference ``utils.py`` helper."""
    if isinstance(feat, tuple):
        return feat
    if graph is not None and graph.is_block:
        # On a block, dst nodes are the first num_dst rows of src features.
        dst = jax.tree_util.tree_map(
            lambda x: x[: graph.num_dst_nodes()], feat
        )
        return feat, dst
    return feat, feat


def check_zero_in_degree(graph, allow: bool):
    if allow:
        return
    deg = graph.in_degrees()
    if isinstance(deg, jax.core.Tracer):
        return  # cannot check under tracing
    import numpy as np

    if graph.num_dst_nodes() > 0 and int(np.min(np.asarray(deg))) == 0:
        raise DGLError(
            "There are 0-in-degree nodes in the graph; output for those "
            "nodes will be invalid. Add self-loops or pass "
            "allow_zero_in_degree=True (reference graphconv.py:440 check)."
        )


def precompute_graphconv(graph, feat, norm: str = "both", edge_weight=None,
                         hops: int = 1):
    """Precompute the (normalized) GraphConv aggregation of STATIC inputs.

    ``GraphConv(g, x) == GraphConv weight/bias applied to
    precompute_graphconv(g, x, norm)`` exactly, because message+sum is
    linear: ``Â (X W) = (Â X) W``. When ``x`` is the (constant) input
    feature table, computing ``Â X`` ONCE removes the first layer's g-SpMM
    — forward AND backward — from every training epoch (the layer-1
    gradient is ``dW = (Â X)^T dZ``, no ``Â^T`` product). On the v5e the
    small-graph GCN epoch is 100% bound by the SpMM gather issue rate
    (benchmarks/probe_r3a), so this exact rewrite halves it.

    ``hops > 1`` gives the SGC k-hop precompute
    (reference ``python/dgl/nn/pytorch/conv/sgconv.py:13``).

    Use with ``GraphConv.__call__(..., precomputed=True)`` or
    ``GCN(static_input_agg=True)``.
    """
    if norm not in ("none", "both", "right", "left"):
        raise DGLError(f'Invalid norm value {norm!r}')
    with graph.local_scope() as g:
        for _ in range(hops):
            feat_src, _ = expand_as_pair(feat, g)
            msg_fn = fn.copy_u("h", "m")
            if edge_weight is not None:
                g.edata["_edge_weight"] = edge_weight
                msg_fn = fn.u_mul_e("h", "_edge_weight", "m")
            if norm in ("left", "both"):
                degs = jnp.clip(g.out_degrees().astype(feat_src.dtype), 1)
                nrm = jax_rsqrt(degs) if norm == "both" else 1.0 / degs
                nrm = nrm.reshape(nrm.shape + (1,) * (feat_src.ndim - 1))
                feat_src = feat_src * nrm
            g.srcdata["h"] = feat_src
            g.update_all(msg_fn, fn.sum("m", "h"))
            rst = g.dstdata["h"]
            if norm in ("right", "both"):
                degs = jnp.clip(g.in_degrees().astype(rst.dtype), 1)
                nrm = jax_rsqrt(degs) if norm == "both" else 1.0 / degs
                nrm = nrm.reshape(nrm.shape + (1,) * (rst.ndim - 1))
                rst = rst * nrm
            feat = rst
        return feat


class GraphConv(nn.Module):
    """GCN convolution (Kipf & Welling), reference ``graphconv.py:157``.

    ``__call__(..., precomputed=True)`` declares ``feat`` to already be the
    normalized aggregate from :func:`precompute_graphconv` — the layer then
    only applies weight/bias (exact static-input optimization; see that
    helper's docstring).
    """

    in_feats: int
    out_feats: int
    norm: str = "both"
    weight: bool = True
    bias: bool = True
    activation: Optional[Callable] = None
    allow_zero_in_degree: bool = False

    @nn.compact
    def __call__(self, graph, feat, edge_weight=None, precomputed=False):
        if precomputed:
            rst = feat
            if self.weight:
                rst = rst @ self.param(
                    "weight", nn.initializers.xavier_uniform(),
                    (self.in_feats, self.out_feats), rst.dtype,
                )
            if self.bias:
                rst = rst + self.param(
                    "bias", nn.initializers.zeros, (self.out_feats,),
                    rst.dtype,
                )
            if self.activation is not None:
                rst = self.activation(rst)
            return rst
        if self.norm not in ("none", "both", "right", "left"):
            raise DGLError(f'Invalid norm value {self.norm!r}')
        check_zero_in_degree(graph, self.allow_zero_in_degree)
        with graph.local_scope() as g:
            feat_src, feat_dst = expand_as_pair(feat, g)
            msg_fn = fn.copy_u("h", "m")
            if edge_weight is not None:
                g.edata["_edge_weight"] = edge_weight
                msg_fn = fn.u_mul_e("h", "_edge_weight", "m")

            if self.norm in ("left", "both"):
                degs = jnp.clip(g.out_degrees().astype(feat_src.dtype), 1)
                norm = jax_rsqrt(degs) if self.norm == "both" else 1.0 / degs
                norm = norm.reshape(norm.shape + (1,) * (feat_src.ndim - 1))
                feat_src = feat_src * norm

            kernel = (
                self.param(
                    "weight",
                    nn.initializers.xavier_uniform(),
                    (self.in_feats, self.out_feats),
                    feat_src.dtype,
                )
                if self.weight
                else None
            )

            if self.in_feats > self.out_feats:
                # project first to shrink the aggregated width
                if kernel is not None:
                    feat_src = feat_src @ kernel
                g.srcdata["h"] = feat_src
                g.update_all(msg_fn, fn.sum("m", "h"))
                rst = g.dstdata["h"]
            else:
                g.srcdata["h"] = feat_src
                g.update_all(msg_fn, fn.sum("m", "h"))
                rst = g.dstdata["h"]
                if kernel is not None:
                    rst = rst @ kernel

            if self.norm in ("right", "both"):
                degs = jnp.clip(g.in_degrees().astype(rst.dtype), 1)
                norm = jax_rsqrt(degs) if self.norm == "both" else 1.0 / degs
                norm = norm.reshape(norm.shape + (1,) * (rst.ndim - 1))
                rst = rst * norm

            if self.bias:
                b = self.param(
                    "bias", nn.initializers.zeros, (self.out_feats,), rst.dtype
                )
                rst = rst + b
            if self.activation is not None:
                rst = self.activation(rst)
            return rst
