"""GATv2 layer (Brody et al.) — dynamic attention.

Reference: ``python/dgl/nn/pytorch/conv/gatv2conv.py``.
"""
from __future__ import annotations

from typing import Callable, Optional

from flax import linen as nn

from ... import function as fn
from ...ops import edge_softmax
from .graphconv import expand_as_pair, check_zero_in_degree


class GATv2Conv(nn.Module):
    """GATv2 (reference ``gatv2conv.py:15``)."""

    in_feats: int
    out_feats: int
    num_heads: int
    feat_drop: float = 0.0
    attn_drop: float = 0.0
    negative_slope: float = 0.2
    residual: bool = False
    activation: Optional[Callable] = None
    allow_zero_in_degree: bool = False
    bias: bool = True
    share_weights: bool = False

    @nn.compact
    def __call__(self, graph, feat, get_attention=False, deterministic=True):
        check_zero_in_degree(graph, self.allow_zero_in_degree)
        H, O = self.num_heads, self.out_feats
        with graph.local_scope() as g:
            feat_src, feat_dst = expand_as_pair(feat, g)
            if self.feat_drop > 0 and not deterministic:
                drop = nn.Dropout(self.feat_drop, deterministic=False)
                feat_src, feat_dst = drop(feat_src), drop(feat_dst)
            fc_src = nn.Dense(
                H * O, use_bias=self.bias,
                kernel_init=nn.initializers.xavier_uniform(), name="fc_src",
            )
            if self.share_weights:
                fc_dst = fc_src
            else:
                fc_dst = nn.Dense(
                    H * O, use_bias=self.bias,
                    kernel_init=nn.initializers.xavier_uniform(), name="fc_dst",
                )
            h_src = fc_src(feat_src).reshape(-1, H, O)
            h_dst = fc_dst(feat_dst).reshape(-1, H, O)
            g.srcdata.update({"el": h_src})
            g.dstdata.update({"er": h_dst})
            g.apply_edges(fn.u_add_v("el", "er", "e"))
            e = nn.leaky_relu(g.edata["e"], negative_slope=self.negative_slope)
            attn = self.param(
                "attn", nn.initializers.xavier_uniform(), (1, H, O), e.dtype
            )
            e = (e * attn).sum(-1, keepdims=True)  # (E, H, 1)
            a = edge_softmax(g, e)
            if self.attn_drop > 0 and not deterministic:
                a = nn.Dropout(self.attn_drop, deterministic=False)(a)
            g.edata["a"] = a
            g.srcdata["ft"] = h_src
            g.update_all(fn.u_mul_e("ft", "a", "m"), fn.sum("m", "ft"))
            rst = g.dstdata["ft"]
            if self.residual:
                res_fc = nn.Dense(
                    H * O, use_bias=False,
                    kernel_init=nn.initializers.xavier_uniform(), name="res_fc",
                )
                rst = rst + res_fc(feat_dst).reshape(-1, H, O)
            if self.activation is not None:
                rst = self.activation(rst)
            if get_attention:
                return rst, a
            return rst
