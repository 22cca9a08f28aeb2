"""AGNN layer (reference ``python/dgl/nn/pytorch/conv/agnnconv.py``):
attention = softmax over edges of beta * cosine(h_u, h_v)."""
from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from ... import function as fn
from ...ops import edge_softmax
from .graphconv import expand_as_pair


class AGNNConv(nn.Module):
    """(reference ``agnnconv.py:12``)."""

    init_beta: float = 1.0
    learn_beta: bool = True
    allow_zero_in_degree: bool = False

    @nn.compact
    def __call__(self, graph, feat):
        with graph.local_scope() as g:
            feat_src, feat_dst = expand_as_pair(feat, g)
            if self.learn_beta:
                beta = self.param(
                    "beta", lambda k: jnp.array([self.init_beta], jnp.float32)
                )
            else:
                beta = jnp.array([self.init_beta], jnp.float32)
            g.srcdata["h"] = feat_src
            norm_h = feat_src / (
                jnp.linalg.norm(feat_src, axis=-1, keepdims=True) + 1e-12
            )
            g.srcdata["norm_h"] = norm_h
            if g.is_block:
                g.dstdata["norm_h"] = norm_h[: g.num_dst_nodes()]
            else:
                g.dstdata["norm_h"] = norm_h
            # cos = <u/|u|, v/|v|> per edge
            g.apply_edges(fn.u_dot_v("norm_h", "norm_h", "cos"))
            cos = g.edata["cos"]
            e = beta * cos
            g.edata["p"] = edge_softmax(g, e)
            g.update_all(fn.u_mul_e("h", "p", "m"), fn.sum("m", "h"))
            return g.dstdata["h"]
