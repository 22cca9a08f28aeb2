"""Heterogeneous Graph Transformer conv (reference
``python/dgl/nn/pytorch/conv/hgtconv.py``): typed Q/K/V projections,
per-relation attention/message matrices, typed skip with learned gate.

Operates on a homogeneous graph + ntype/etype id arrays like the reference
(use ``dgl.to_homogeneous`` for heterographs).
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp
from flax import linen as nn

from ... import function as fn
from ...ops import edge_softmax
from ..linear import TypedLinear


class HGTConv(nn.Module):
    """(reference ``hgtconv.py:14``)."""

    in_size: int
    head_size: int
    num_heads: int
    num_ntypes: int
    num_etypes: int
    dropout: float = 0.2
    use_norm: bool = False

    @nn.compact
    def __call__(self, g, x, ntype, etype, *, presorted: bool = False,
                 deterministic: bool = True):
        H, D = self.num_heads, self.head_size
        OUT = H * D
        sqrt_d = math.sqrt(D)
        lin_q = TypedLinear(self.in_size, OUT, self.num_ntypes, name="linear_q")
        lin_k = TypedLinear(self.in_size, OUT, self.num_ntypes, name="linear_k")
        lin_v = TypedLinear(self.in_size, OUT, self.num_ntypes, name="linear_v")
        relation_pri = self.param(
            "relation_pri", nn.initializers.ones, (self.num_etypes, H), jnp.float32
        )
        relation_att = self.param(
            "relation_att", nn.initializers.xavier_uniform(),
            (self.num_etypes, H, D, D), jnp.float32,
        )
        relation_msg = self.param(
            "relation_msg", nn.initializers.xavier_uniform(),
            (self.num_etypes, H, D, D), jnp.float32,
        )
        skip = self.param("skip", nn.initializers.ones, (self.num_ntypes,), jnp.float32)
        with g.local_scope() as graph:
            q = lin_q(x, ntype).reshape(-1, H, D)
            k = lin_k(x, ntype).reshape(-1, H, D)
            v = lin_v(x, ntype).reshape(-1, H, D)
            graph.srcdata["k"] = k
            graph.dstdata["q"] = q
            graph.srcdata["v"] = v

            def edge_attn(edges):
                # per-edge typed bilinear attention + typed message
                kk = edges.src["k"]                          # (E, H, D)
                qq = edges.dst["q"]
                vv = edges.src["v"]
                att_w = relation_att[etype]                  # (E, H, D, D)
                msg_w = relation_msg[etype]
                pri = relation_pri[etype]                    # (E, H)
                kt = jnp.einsum("ehd,ehdf->ehf", kk, att_w)
                a = (kt * qq).sum(-1) * pri / sqrt_d         # (E, H)
                m = jnp.einsum("ehd,ehdf->ehf", vv, msg_w)   # (E, H, D)
                return {"a": a[..., None], "m": m}

            graph.apply_edges(edge_attn)
            graph.edata["sa"] = edge_softmax(graph, graph.edata["a"]) / sqrt_d
            graph.edata["ma"] = graph.edata["m"] * graph.edata["sa"]
            graph.update_all(fn.copy_e("ma", "x"), fn.sum("x", "t"))
            t = graph.dstdata["t"].reshape(-1, OUT)
            if self.dropout > 0 and not deterministic:
                t = nn.Dropout(self.dropout, deterministic=False)(t)
            if self.in_size == OUT:
                alpha = jax.nn.sigmoid(skip[ntype])[:, None]
                t = t * alpha + x * (1 - alpha)
            if self.use_norm:
                t = nn.LayerNorm(name="norm")(t)
            return t
