"""Gated GCN / ResGatedGCN layer (reference
``python/dgl/nn/pytorch/conv/gatedgcnconv.py``): edge gates
e' = A h_u + B h_v + C e; h' = U h_v + sum(sigma(e') * V h_u) / sum sigma(e')."""
from __future__ import annotations

from typing import Callable

import jax
from flax import linen as nn

from ... import function as fn


class GatedGCNConv(nn.Module):
    """(reference ``gatedgcnconv.py:12``)."""

    input_feats: int
    edge_feats: int
    output_feats: int
    dropout: float = 0.0
    batch_norm: bool = True
    residual: bool = True
    activation: Callable = jax.nn.relu

    @nn.compact
    def __call__(self, graph, feat, edge_feat, deterministic: bool = True):
        with graph.local_scope() as g:
            h, e = feat, edge_feat
            xavier = nn.initializers.xavier_normal()
            A = nn.Dense(self.output_feats, kernel_init=xavier, name="A")
            B = nn.Dense(self.output_feats, kernel_init=xavier, name="B")
            C = nn.Dense(self.output_feats, kernel_init=xavier, name="C")
            D = nn.Dense(self.output_feats, kernel_init=xavier, name="D")
            E = nn.Dense(self.output_feats, kernel_init=xavier, name="E")
            g.srcdata["Dh"] = D(h)
            g.dstdata["Eh"] = E(h[: g.num_dst_nodes()] if g.is_block else h)
            g.edata["Ce"] = C(e)
            g.apply_edges(fn.u_add_v("Dh", "Eh", "DEh"))
            e_new = g.edata["DEh"] + g.edata["Ce"]
            sigma = jax.nn.sigmoid(e_new)
            g.edata["sigma"] = sigma
            g.srcdata["Bh"] = B(h)
            g.update_all(fn.u_mul_e("Bh", "sigma", "m"), fn.sum("m", "sum_sigma_h"))
            g.update_all(fn.copy_e("sigma", "m"), fn.sum("m", "sum_sigma"))
            h_dst = h[: g.num_dst_nodes()] if g.is_block else h
            h_new = A(h_dst) + g.dstdata["sum_sigma_h"] / (
                g.dstdata["sum_sigma"] + 1e-6
            )
            if self.batch_norm:
                h_new = nn.LayerNorm(name="bn_h")(h_new)
                e_new = nn.LayerNorm(name="bn_e")(e_new)
            h_new = self.activation(h_new)
            e_new = self.activation(e_new)
            if self.residual and self.input_feats == self.output_feats:
                h_new = h_dst + h_new
            if self.residual and self.edge_feats == self.output_feats:
                e_new = e + e_new
            if self.dropout > 0 and not deterministic:
                drop = nn.Dropout(self.dropout, deterministic=False)
                h_new, e_new = drop(h_new), drop(e_new)
            return h_new, e_new
