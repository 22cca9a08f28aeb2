"""Spectral-flavored convolutions: SGConv, APPNPConv, TAGConv, ChebConv.

References: ``python/dgl/nn/pytorch/conv/{sgconv,appnpconv,tagconv,chebconv}.py``.
All are compositions of symmetric-normalized copy_u/sum g-SpMM hops — ideal
for XLA fusion (hops unrolled statically).
"""
from __future__ import annotations

from typing import Callable, Optional

import jax.numpy as jnp
from flax import linen as nn

from ... import function as fn
from ..utils_nn import jax_rsqrt


def _sym_norm_hop(g, x, msg_fn=None):
    """One D^-1/2 A D^-1/2 hop via g-SpMM."""
    degs_out = jnp.clip(g.out_degrees().astype(x.dtype), 1)
    degs_in = jnp.clip(g.in_degrees().astype(x.dtype), 1)
    shape = (-1,) + (1,) * (x.ndim - 1)
    x = x * jax_rsqrt(degs_out).reshape(shape)
    g.srcdata["_h"] = x
    g.update_all(msg_fn or fn.copy_u("_h", "m"), fn.sum("m", "_h"))
    return g.dstdata["_h"] * jax_rsqrt(degs_in).reshape(shape)


class SGConv(nn.Module):
    """Simplified GCN: X' = (D^-1/2 A D^-1/2)^k X W (reference ``sgconv.py``)."""

    in_feats: int
    out_feats: int
    k: int = 1
    bias: bool = True

    @nn.compact
    def __call__(self, graph, feat, edge_weight=None):
        with graph.local_scope() as g:
            msg_fn = None
            if edge_weight is not None:
                g.edata["_ew"] = edge_weight
                msg_fn = fn.u_mul_e("_h", "_ew", "m")
            h = feat
            for _ in range(self.k):
                h = _sym_norm_hop(g, h, msg_fn)
            return nn.Dense(
                self.out_feats,
                use_bias=self.bias,
                kernel_init=nn.initializers.xavier_uniform(),
                name="fc",
            )(h)


class APPNPConv(nn.Module):
    """Approximate personalized PageRank propagation (reference ``appnpconv.py``)."""

    k: int = 10
    alpha: float = 0.1
    edge_drop: float = 0.0

    @nn.compact
    def __call__(self, graph, feat):
        with graph.local_scope() as g:
            h0 = feat
            h = feat
            for _ in range(self.k):
                h = (1 - self.alpha) * _sym_norm_hop(g, h) + self.alpha * h0
            return h


class TAGConv(nn.Module):
    """Topology-adaptive GCN (reference ``tagconv.py``)."""

    in_feats: int
    out_feats: int
    k: int = 2
    bias: bool = True
    activation: Optional[Callable] = None

    @nn.compact
    def __call__(self, graph, feat):
        with graph.local_scope() as g:
            hops = [feat]
            h = feat
            for _ in range(self.k):
                h = _sym_norm_hop(g, h)
                hops.append(h)
            stacked = jnp.concatenate(hops, axis=-1)
            rst = nn.Dense(
                self.out_feats,
                use_bias=self.bias,
                kernel_init=nn.initializers.xavier_uniform(),
                name="lin",
            )(stacked)
            if self.activation is not None:
                rst = self.activation(rst)
            return rst


class ChebConv(nn.Module):
    """Chebyshev spectral conv (reference ``chebconv.py``).

    Uses the scaled Laplacian approximation with lambda_max=2 (the
    reference's default when not provided).
    """

    in_feats: int
    out_feats: int
    k: int = 2
    bias: bool = True
    activation: Optional[Callable] = None

    @nn.compact
    def __call__(self, graph, feat, lambda_max=None):
        with graph.local_scope() as g:
            lam = 2.0 if lambda_max is None else lambda_max

            def laplacian_hop(x):
                # L~ x = (2/lam)(x - D^-1/2 A D^-1/2 x) - x
                ax = _sym_norm_hop(g, x)
                return (2.0 / lam) * (x - ax) - x

            t0 = feat
            out = nn.Dense(
                self.out_feats, use_bias=False,
                kernel_init=nn.initializers.xavier_uniform(), name="w0",
            )(t0)
            if self.k > 1:
                t1 = laplacian_hop(t0)
                out = out + nn.Dense(
                    self.out_feats, use_bias=False,
                    kernel_init=nn.initializers.xavier_uniform(), name="w1",
                )(t1)
                tk_prev, tk = t0, t1
                for i in range(2, self.k):
                    tk_next = 2 * laplacian_hop(tk) - tk_prev
                    out = out + nn.Dense(
                        self.out_feats, use_bias=False,
                        kernel_init=nn.initializers.xavier_uniform(), name=f"w{i}",
                    )(tk_next)
                    tk_prev, tk = tk, tk_next
            if self.bias:
                out = out + self.param(
                    "bias", nn.initializers.zeros, (self.out_feats,)
                )
            if self.activation is not None:
                out = self.activation(out)
            return out
