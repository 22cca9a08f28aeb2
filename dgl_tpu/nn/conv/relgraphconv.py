"""Relational GCN layer.

Reference: ``python/dgl/nn/pytorch/conv/relgraphconv.py`` — per-relation
weights with optional basis decomposition, applied on a homogeneous graph
carrying an edge-type array. The per-edge typed projection lowers to the
one-hot MXU ``gather_mm`` (reference uses ``gather_mm``/``segment_mm``
CUDA kernels, ``src/array/cuda/gather_mm.cu``).
"""
from __future__ import annotations

from typing import Callable, Optional

import jax.numpy as jnp
from flax import linen as nn

from ...base import DGLError
from ... import function as fn
from ...ops import gather_mm
from .graphconv import expand_as_pair


class RelGraphConv(nn.Module):
    """R-GCN layer (reference ``relgraphconv.py:14``)."""

    in_feats: int
    out_feats: int
    num_rels: int
    regularizer: Optional[str] = None  # None | 'basis'
    num_bases: Optional[int] = None
    bias: bool = True
    activation: Optional[Callable] = None
    self_loop: bool = True
    dropout: float = 0.0
    layer_norm: bool = False

    @nn.compact
    def __call__(self, graph, feat, etypes, norm=None, deterministic=True):
        """``etypes``: (E,) int array of relation ids (eid order)."""
        if self.regularizer not in (None, "basis"):
            raise DGLError(
                f"Unsupported regularizer {self.regularizer!r}; use None or 'basis'"
            )
        if self.regularizer == "basis":
            nb = self.num_bases or self.num_rels
            basis = self.param(
                "basis",
                nn.initializers.xavier_uniform(),
                (nb, self.in_feats, self.out_feats),
            )
            coeff = self.param(
                "coeff", nn.initializers.xavier_uniform(), (self.num_rels, nb)
            )
            weight = jnp.einsum("rb,bio->rio", coeff, basis)
        else:
            weight = self.param(
                "weight",
                nn.initializers.xavier_uniform(),
                (self.num_rels, self.in_feats, self.out_feats),
            )
        with graph.local_scope() as g:
            feat_src, feat_dst = expand_as_pair(feat, g)
            # typed per-edge projection: m_e = W[etype_e] @ h_src(e)
            rel = g._relation()
            h_src_e = feat_src[rel.src]  # (E, in)
            m = gather_mm(h_src_e, weight, etypes)  # (E, out)
            if norm is not None:
                m = m * norm.reshape(-1, *([1] * (m.ndim - 1)))
            g.edata["m"] = m
            g.update_all(fn.copy_e("m", "m"), fn.sum("m", "h"))
            rst = g.dstdata["h"]
            if self.layer_norm:
                rst = nn.LayerNorm(name="layer_norm")(rst)
            if self.self_loop:
                loop_w = self.param(
                    "loop_weight",
                    nn.initializers.xavier_uniform(),
                    (self.in_feats, self.out_feats),
                )
                rst = rst + feat_dst @ loop_w
            if self.bias:
                rst = rst + self.param(
                    "h_bias", nn.initializers.zeros, (self.out_feats,)
                )
            if self.activation is not None:
                rst = self.activation(rst)
            if self.dropout > 0 and not deterministic:
                rst = nn.Dropout(self.dropout, deterministic=False)(rst)
            return rst
