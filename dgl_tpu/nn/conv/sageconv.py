"""GraphSAGE convolution.

Reference: ``python/dgl/nn/pytorch/conv/sageconv.py`` — aggregators
mean / gcn / pool / lstm, separate self and neighbor projections.
"""
from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...base import DGLError
from ... import function as fn
from .graphconv import expand_as_pair


class _MaskedLSTMStep(nn.Module):
    """One LSTM step that freezes the carry on padded mailbox slots."""

    feats: int

    @nn.compact
    def __call__(self, carry, xs):
        x, valid = xs
        new_carry, out = nn.OptimizedLSTMCell(self.feats)(carry, x)
        new_carry = jax.tree_util.tree_map(
            lambda nc, c: jnp.where(valid[:, None], nc, c), new_carry, carry
        )
        return new_carry, out


def precompute_sage_neigh(graph, feat, edge_weight=None):
    """Precompute the mean-aggregated neighborhood of STATIC input features
    for :class:`SAGEConv` (mean aggregator): since the mean aggregation is
    linear, ``fc_neigh(mean_agg(X)) == fc_neigh . precompute`` exactly, and
    a constant input table makes the first layer's g-SpMM (fwd + bwd)
    disappear from the epoch. Pass the result as
    ``SAGEConv(..., precomputed_neigh=...)``."""
    from ... import function as fn

    with graph.local_scope() as g:
        msg_fn = fn.copy_u("h", "m")
        if edge_weight is not None:
            g.edata["_edge_weight"] = edge_weight
            msg_fn = fn.u_mul_e("h", "_edge_weight", "m")
        g.srcdata["h"] = feat
        g.update_all(msg_fn, fn.mean("m", "neigh"))
        return g.dstdata["neigh"]


class SAGEConv(nn.Module):
    """GraphSAGE layer (reference ``sageconv.py:13``)."""

    in_feats: int
    out_feats: int
    aggregator_type: str = "mean"
    feat_drop: float = 0.0
    bias: bool = True
    norm: Optional[Callable] = None
    activation: Optional[Callable] = None

    @nn.compact
    def __call__(self, graph, feat, edge_weight=None, deterministic: bool = True,
                 precomputed_neigh=None):
        if precomputed_neigh is not None:
            if self.aggregator_type != "mean":
                raise DGLError(
                    "precomputed_neigh requires the mean aggregator")
            feat_src, feat_dst = expand_as_pair(feat, graph)
            fc_neigh = nn.Dense(
                self.out_feats, use_bias=False,
                kernel_init=nn.initializers.xavier_uniform(),
                name="fc_neigh",
            )
            fc_self = nn.Dense(
                self.out_feats, use_bias=False,
                kernel_init=nn.initializers.xavier_uniform(),
                name="fc_self",
            )
            rst = fc_self(feat_dst) + fc_neigh(precomputed_neigh)
            if self.bias:
                rst = rst + self.param(
                    "bias", nn.initializers.zeros, (self.out_feats,),
                    rst.dtype,
                )
            if self.activation is not None:
                rst = self.activation(rst)
            if self.norm is not None:
                rst = self.norm(rst)
            return rst
        if self.aggregator_type not in ("mean", "gcn", "pool", "lstm"):
            raise DGLError(
                f"Invalid aggregator_type {self.aggregator_type!r}"
            )
        with graph.local_scope() as g:
            feat_src, feat_dst = expand_as_pair(feat, g)
            if self.feat_drop > 0 and not deterministic:
                feat_src = nn.Dropout(self.feat_drop, deterministic=False)(feat_src)
                feat_dst = nn.Dropout(self.feat_drop, deterministic=False)(feat_dst)
            msg_fn = fn.copy_u("h", "m")
            if edge_weight is not None:
                g.edata["_edge_weight"] = edge_weight
                msg_fn = fn.u_mul_e("h", "_edge_weight", "m")

            lin_before_mp = self.in_feats > self.out_feats
            fc_neigh = nn.Dense(
                self.out_feats,
                use_bias=False,
                kernel_init=nn.initializers.xavier_uniform(),
                name="fc_neigh",
            )

            if self.aggregator_type == "mean":
                g.srcdata["h"] = fc_neigh(feat_src) if lin_before_mp else feat_src
                g.update_all(msg_fn, fn.mean("m", "neigh"))
                h_neigh = g.dstdata["neigh"]
                if not lin_before_mp:
                    h_neigh = fc_neigh(h_neigh)
            elif self.aggregator_type == "gcn":
                g.srcdata["h"] = fc_neigh(feat_src) if lin_before_mp else feat_src
                if g.is_block:
                    g.dstdata["h"] = g.srcdata["h"][: g.num_dst_nodes()]
                else:
                    g.dstdata["h"] = g.srcdata["h"]
                g.update_all(msg_fn, fn.sum("m", "neigh"))
                degs = g.in_degrees().astype(feat_dst.dtype)
                h_neigh = (g.dstdata["neigh"] + g.dstdata["h"]) / (
                    degs[..., None] + 1
                )
                if not lin_before_mp:
                    h_neigh = fc_neigh(h_neigh)
            elif self.aggregator_type == "pool":
                fc_pool = nn.Dense(
                    self.in_feats,
                    kernel_init=nn.initializers.xavier_uniform(),
                    name="fc_pool",
                )
                g.srcdata["h"] = jax.nn.relu(fc_pool(feat_src))
                g.update_all(msg_fn, fn.max("m", "neigh"))
                h_neigh = fc_neigh(g.dstdata["neigh"])
            else:  # lstm over the padded mailbox (reference _lstm_reducer)
                scanned = nn.scan(
                    _MaskedLSTMStep,
                    variable_broadcast="params",
                    split_rngs={"params": False},
                    in_axes=0,
                    out_axes=0,
                )(self.in_feats, name="lstm")

                def reducer(nodes):
                    m = nodes.mailbox["m"]  # (N, D, in_feats), zero-padded
                    mask = nodes.mailbox_mask  # (N, D)
                    n = m.shape[0]
                    carry = nn.OptimizedLSTMCell(
                        self.in_feats, parent=None
                    ).initialize_carry(jax.random.PRNGKey(0), (n, self.in_feats))
                    (c_final, h_final), _ = scanned(
                        carry, (m.transpose(1, 0, 2), mask.T)
                    )
                    return {"neigh": h_final}

                g.srcdata["h"] = feat_src
                g.update_all(msg_fn, reducer)
                h_neigh = fc_neigh(g.dstdata["neigh"])

            if self.aggregator_type == "gcn":
                rst = h_neigh
            else:
                fc_self = nn.Dense(
                    self.out_feats,
                    use_bias=False,
                    kernel_init=nn.initializers.xavier_uniform(),
                    name="fc_self",
                )
                rst = fc_self(feat_dst) + h_neigh
            if self.bias:
                rst = rst + self.param(
                    "bias", nn.initializers.zeros, (self.out_feats,), rst.dtype
                )
            if self.activation is not None:
                rst = self.activation(rst)
            if self.norm is not None:
                rst = self.norm(rst)
            return rst
