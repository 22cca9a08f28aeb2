"""GAT with edge features folded into attention and messages (reference
``python/dgl/nn/pytorch/conv/edgegatconv.py``)."""
from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from ... import function as fn
from ...ops import edge_softmax
from .graphconv import expand_as_pair, check_zero_in_degree


class EdgeGATConv(nn.Module):
    """(reference ``edgegatconv.py:12``)."""

    in_feats: int
    edge_feats: int
    out_feats: int
    num_heads: int
    feat_drop: float = 0.0
    attn_drop: float = 0.0
    negative_slope: float = 0.2
    residual: bool = True
    activation: Optional[Callable] = None
    allow_zero_in_degree: bool = False
    bias: bool = True

    @nn.compact
    def __call__(self, graph, feat, edge_feat, get_attention: bool = False,
                 deterministic: bool = True):
        check_zero_in_degree(graph, self.allow_zero_in_degree)
        H, O = self.num_heads, self.out_feats
        xavier = nn.initializers.xavier_normal()
        with graph.local_scope() as g:
            feat_src, feat_dst = expand_as_pair(feat, g)
            if self.feat_drop > 0 and not deterministic:
                drop = nn.Dropout(self.feat_drop, deterministic=False)
                feat_src, feat_dst = drop(feat_src), drop(feat_dst)
            fc = nn.Dense(H * O, use_bias=False, kernel_init=xavier, name="fc")
            fc_edge = nn.Dense(H * O, use_bias=False, kernel_init=xavier,
                               name="fc_edge")
            h_src = fc(feat_src).reshape(-1, H, O)
            h_dst = fc(feat_dst).reshape(-1, H, O)
            f = fc_edge(edge_feat).reshape(-1, H, O)
            attn_l = self.param("attn_l", xavier, (1, H, O), jnp.float32)
            attn_r = self.param("attn_r", xavier, (1, H, O), jnp.float32)
            attn_e = self.param("attn_e", xavier, (1, H, O), jnp.float32)
            el = (h_src * attn_l).sum(-1, keepdims=True)
            er = (h_dst * attn_r).sum(-1, keepdims=True)
            ee = (f * attn_e).sum(-1, keepdims=True)
            g.srcdata.update({"ft": h_src, "el": el})
            g.dstdata.update({"er": er})
            g.apply_edges(fn.u_add_v("el", "er", "e"))
            e = jax.nn.leaky_relu(
                g.edata["e"] + ee, negative_slope=self.negative_slope
            )
            a = edge_softmax(g, e)
            if self.attn_drop > 0 and not deterministic:
                a = nn.Dropout(self.attn_drop, deterministic=False)(a)
            g.edata["a"] = a
            g.update_all(fn.u_mul_e("ft", "a", "m"), fn.sum("m", "ft"))
            rst = g.dstdata["ft"]
            if self.residual:
                res_fc = nn.Dense(H * O, use_bias=False, kernel_init=xavier,
                                  name="res_fc")
                rst = rst + res_fc(feat_dst).reshape(-1, H, O)
            if self.bias:
                rst = rst + self.param(
                    "bias", nn.initializers.zeros, (1, H, O), rst.dtype
                )
            if self.activation is not None:
                rst = self.activation(rst)
            if get_attention:
                return rst, a
            return rst
