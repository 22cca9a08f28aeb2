"""Dot-product graph attention (reference
``python/dgl/nn/pytorch/conv/dotgatconv.py``): a = softmax(<Wh_u, Wh_v>/sqrt(d))."""
from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from ... import function as fn
from ...ops import edge_softmax
from .graphconv import expand_as_pair, check_zero_in_degree


class DotGatConv(nn.Module):
    """(reference ``dotgatconv.py:11``)."""

    in_feats: int
    out_feats: int
    num_heads: int
    allow_zero_in_degree: bool = False

    @nn.compact
    def __call__(self, graph, feat, get_attention: bool = False):
        check_zero_in_degree(graph, self.allow_zero_in_degree)
        H, O = self.num_heads, self.out_feats
        with graph.local_scope() as g:
            feat_src, feat_dst = expand_as_pair(feat, g)
            fc = nn.Dense(
                H * O,
                use_bias=False,
                kernel_init=nn.initializers.xavier_uniform(),
                name="fc",
            )
            h_src = fc(feat_src).reshape(-1, H, O)
            h_dst = fc(feat_dst).reshape(-1, H, O)
            g.srcdata["ft"] = h_src
            g.dstdata["ft"] = h_dst
            g.apply_edges(fn.u_dot_v("ft", "ft", "a"))
            a = g.edata["a"] / jnp.sqrt(O)  # (E, H, 1)
            sa = edge_softmax(g, a)
            g.edata["sa"] = sa
            g.update_all(fn.u_mul_e("ft", "sa", "m"), fn.sum("m", "agg_u"))
            rst = g.dstdata["agg_u"]
            if get_attention:
                return rst, sa
            return rst
