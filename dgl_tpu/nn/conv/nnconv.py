"""NNConv (MPNN edge-network convolution), reference ``python/dgl/nn/pytorch/conv/nnconv.py``."""
from __future__ import annotations

from typing import Callable

import jax.numpy as jnp
from flax import linen as nn

from ...base import DGLError
from ... import function as fn
from .graphconv import expand_as_pair


class NNConv(nn.Module):
    """MPNN conv: m_uv = f(e_uv) reshaped to a matrix applied to h_u.

    Reference ``nnconv.py:13``; ``edge_func`` maps (E, edge_feats) ->
    (E, in_feats * out_feats).
    """

    in_feats: int
    out_feats: int
    edge_func: Callable = None
    aggregator_type: str = "mean"
    residual: bool = False
    bias: bool = True

    @nn.compact
    def __call__(self, graph, feat, efeat):
        if self.aggregator_type not in ("sum", "mean", "max"):
            raise DGLError(f"Invalid aggregator {self.aggregator_type!r}")
        reducer = getattr(fn, self.aggregator_type)
        with graph.local_scope() as g:
            feat_src, feat_dst = expand_as_pair(feat, g)
            rel = g._relation()
            # per-edge weight matrix from the edge network
            ew = self.edge_func(efeat).reshape(-1, self.in_feats, self.out_feats)
            h_u = feat_src[rel.src]  # (E, in)
            m = jnp.einsum("ei,eio->eo", h_u, ew)
            g.edata["m"] = m
            g.update_all(fn.copy_e("m", "m"), reducer("m", "neigh"))
            rst = g.dstdata["neigh"]
            if self.residual:
                res_fc = nn.Dense(
                    self.out_feats, use_bias=False,
                    kernel_init=nn.initializers.xavier_uniform(), name="res_fc",
                )
                rst = rst + res_fc(feat_dst)
            if self.bias:
                rst = rst + self.param(
                    "bias", nn.initializers.zeros, (self.out_feats,)
                )
            return rst
