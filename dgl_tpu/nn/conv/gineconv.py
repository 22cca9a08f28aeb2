"""GINE layer (reference ``python/dgl/nn/pytorch/conv/gineconv.py``):
GIN with edge features — message = ReLU(h_u + e)."""
from __future__ import annotations

from typing import Callable, Optional

import jax
from flax import linen as nn

from ... import function as fn
from .graphconv import expand_as_pair


class GINEConv(nn.Module):
    """(reference ``gineconv.py:10``)."""

    apply_func: Optional[Callable] = None
    init_eps: float = 0.0
    learn_eps: bool = False

    @nn.compact
    def __call__(self, graph, feat, edge_feat):
        import jax.numpy as jnp

        if self.learn_eps:
            eps = self.param(
                "eps", lambda k: jnp.array([self.init_eps], jnp.float32)
            )
        else:
            eps = self.init_eps
        with graph.local_scope() as g:
            feat_src, feat_dst = expand_as_pair(feat, g)
            g.srcdata["hn"] = feat_src
            g.edata["he"] = edge_feat
            g.apply_edges(fn.u_add_e("hn", "he", "m"))
            g.edata["m"] = jax.nn.relu(g.edata["m"])
            g.update_all(fn.copy_e("m", "x"), fn.sum("x", "neigh"))
            rst = (1 + eps) * feat_dst + g.dstdata["neigh"]
            if self.apply_func is not None:
                rst = self.apply_func(rst)
            return rst
