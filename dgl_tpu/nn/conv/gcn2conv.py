"""GCNII layer (reference ``python/dgl/nn/pytorch/conv/gcn2conv.py``):
initial residual + identity mapping,
rst = (1-beta) * ((1-a) P h + a h0) + beta * proj, beta = log(lambda/l + 1)."""
from __future__ import annotations

import math
from typing import Callable, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from ... import function as fn
from .graphconv import check_zero_in_degree


class GCN2Conv(nn.Module):
    """(reference ``gcn2conv.py:14``)."""

    in_feats: int
    layer: int = 1
    alpha: float = 0.1
    lambda_: float = 1.0
    project_initial_features: bool = True
    allow_zero_in_degree: bool = False
    bias: bool = True
    activation: Optional[Callable] = None

    @nn.compact
    def __call__(self, graph, feat, feat_0, edge_weight=None):
        check_zero_in_degree(graph, self.allow_zero_in_degree)
        beta = math.log(self.lambda_ / self.layer + 1)
        D = self.in_feats
        winit = nn.initializers.normal(1.0)
        w1 = self.param("weight1", winit, (D, D), feat.dtype)
        with graph.local_scope() as g:
            if edge_weight is None:
                degs = jnp.maximum(g.in_degrees().astype(feat.dtype), 1)
                norm = jax.lax.rsqrt(degs)[:, None]
                out_degs = jnp.maximum(g.out_degrees().astype(feat.dtype), 1)
                out_norm = jax.lax.rsqrt(out_degs)[:, None]
                g.srcdata["h"] = feat * out_norm
                g.update_all(fn.copy_u("h", "m"), fn.sum("m", "h"))
                h = g.dstdata["h"] * norm
            else:
                g.srcdata["h"] = feat
                g.edata["_w"] = edge_weight
                g.update_all(fn.u_mul_e("h", "_w", "m"), fn.sum("m", "h"))
                h = g.dstdata["h"]
            h = h * (1 - self.alpha)
            f0 = feat_0[: h.shape[0]] * self.alpha
            feat_sum = h + f0
            if self.project_initial_features:
                proj = feat_sum @ w1
            else:
                w2 = self.param("weight2", winit, (D, D), feat.dtype)
                proj = h @ w1 + f0 @ w2
            rst = (1 - beta) * feat_sum + beta * proj
            if self.bias:
                rst = rst + self.param(
                    "bias_param", nn.initializers.zeros, (D,), rst.dtype
                )
            if self.activation is not None:
                rst = self.activation(rst)
            return rst
