"""EGAT: GAT with edge features, producing updated node AND edge features
(reference ``python/dgl/nn/pytorch/conv/egatconv.py``)."""
from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from ... import function as fn
from ...ops import edge_softmax
from .graphconv import expand_as_pair


class EGATConv(nn.Module):
    """(reference ``egatconv.py:12``)."""

    in_node_feats: int
    in_edge_feats: int
    out_node_feats: int
    out_edge_feats: int
    num_heads: int
    bias: bool = True

    @nn.compact
    def __call__(self, graph, nfeats, efeats, get_attention: bool = False):
        H = self.num_heads
        On, Oe = self.out_node_feats, self.out_edge_feats
        xavier = nn.initializers.xavier_normal()
        with graph.local_scope() as g:
            f_src, f_dst = expand_as_pair(nfeats, g)
            fc_node_src = nn.Dense(H * On, use_bias=False, kernel_init=xavier,
                                   name="fc_node_src")
            fc_ni = nn.Dense(H * Oe, use_bias=False, kernel_init=xavier, name="fc_ni")
            fc_fij = nn.Dense(H * Oe, use_bias=False, kernel_init=xavier, name="fc_fij")
            fc_nj = nn.Dense(H * Oe, use_bias=False, kernel_init=xavier, name="fc_nj")
            attn = self.param("attn", xavier, (1, H, Oe), jnp.float32)
            g.srcdata["f_ni"] = fc_ni(f_src)
            g.dstdata["f_nj"] = fc_nj(f_dst)
            g.apply_edges(fn.u_add_v("f_ni", "f_nj", "f_tmp"))
            f_out = g.edata["f_tmp"] + fc_fij(efeats)
            if self.bias:
                f_out = f_out + self.param(
                    "bias", nn.initializers.zeros, (H * Oe,), f_out.dtype
                )
            f_out = jax.nn.leaky_relu(f_out).reshape(-1, H, Oe)
            e = (f_out * attn).sum(-1, keepdims=True)  # (E, H, 1)
            g.edata["a"] = edge_softmax(g, e)
            g.srcdata["h_out"] = fc_node_src(f_src).reshape(-1, H, On)
            g.update_all(fn.u_mul_e("h_out", "a", "m"), fn.sum("m", "h_out"))
            h_out = g.dstdata["h_out"].reshape(-1, H, On)
            if get_attention:
                return h_out, f_out, g.edata["a"]
            return h_out, f_out
