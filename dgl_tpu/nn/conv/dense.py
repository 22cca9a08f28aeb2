"""Dense-adjacency conv layers (reference
``python/dgl/nn/pytorch/conv/densegraphconv.py``, ``densesageconv.py``,
``densechebconv.py``) — these take a dense adjacency matrix instead of a
Graph. On TPU these are the *fast path* for small/batched graphs: pure MXU
matmuls with no gather at all."""
from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn


class DenseGraphConv(nn.Module):
    """(reference ``densegraphconv.py:10``)."""

    in_feats: int
    out_feats: int
    norm: str = "both"
    bias: bool = True
    activation: Optional[Callable] = None

    @nn.compact
    def __call__(self, adj, feat):
        adj = adj.astype(feat.dtype)
        src_deg = adj.sum(axis=-2)  # out-degree of sources (cols... rows)
        in_deg = adj.sum(axis=-1)
        if self.norm == "both":
            norm_src = jax.lax.rsqrt(jnp.maximum(src_deg, 1.0))
            feat = feat * norm_src[..., None]
        w = self.param(
            "weight", nn.initializers.xavier_uniform(),
            (self.in_feats, self.out_feats), feat.dtype,
        )
        if self.in_feats > self.out_feats:
            feat = feat @ w
            rst = adj @ feat
        else:
            rst = (adj @ feat) @ w
        if self.norm != "none":
            if self.norm == "both":
                n = jax.lax.rsqrt(jnp.maximum(in_deg, 1.0))
            else:
                n = 1.0 / jnp.maximum(in_deg, 1.0)
            rst = rst * n[..., None]
        if self.bias:
            rst = rst + self.param(
                "bias", nn.initializers.zeros, (self.out_feats,), rst.dtype
            )
        if self.activation is not None:
            rst = self.activation(rst)
        return rst


class DenseSAGEConv(nn.Module):
    """(reference ``densesageconv.py:10``) — mean aggregator over dense adj
    including self (the reference adds self-loops)."""

    in_feats: int
    out_feats: int
    feat_drop: float = 0.0
    bias: bool = True
    norm: Optional[Callable] = None
    activation: Optional[Callable] = None

    @nn.compact
    def __call__(self, adj, feat, deterministic: bool = True):
        adj = adj.astype(feat.dtype)
        n = adj.shape[-1]
        adj = adj + jnp.eye(n, dtype=feat.dtype)
        if self.feat_drop > 0 and not deterministic:
            feat = nn.Dropout(self.feat_drop, deterministic=False)(feat)
        in_deg = adj.sum(axis=-1, keepdims=True)
        h = (adj @ feat) / jnp.maximum(in_deg, 1.0)
        rst = nn.Dense(
            self.out_feats, use_bias=self.bias,
            kernel_init=nn.initializers.xavier_uniform(), name="fc",
        )(jnp.concatenate([feat, h], axis=-1))
        if self.activation is not None:
            rst = self.activation(rst)
        if self.norm is not None:
            rst = self.norm(rst)
        return rst


class DenseChebConv(nn.Module):
    """(reference ``densechebconv.py:10``) — Chebyshev polynomial filters on
    the scaled Laplacian of a dense adjacency."""

    in_feats: int
    out_feats: int
    k: int
    bias: bool = True

    @nn.compact
    def __call__(self, adj, feat, lambda_max: Optional[float] = None):
        adj = adj.astype(feat.dtype)
        n = adj.shape[-1]
        in_deg = adj.sum(axis=-1)
        dinv = jax.lax.rsqrt(jnp.maximum(in_deg, 1.0))
        eye = jnp.eye(n, dtype=feat.dtype)
        lap = eye - dinv[..., :, None] * adj * dinv[..., None, :]
        if lambda_max is None:
            lambda_max = 2.0
        lap_hat = (2.0 / lambda_max) * lap - eye
        w = self.param(
            "W", nn.initializers.xavier_normal(),
            (self.k, self.in_feats, self.out_feats), feat.dtype,
        )
        t_prev2 = feat
        out = t_prev2 @ w[0]
        if self.k > 1:
            t_prev1 = lap_hat @ feat
            out = out + t_prev1 @ w[1]
        for i in range(2, self.k):
            t_cur = 2 * (lap_hat @ t_prev1) - t_prev2
            out = out + t_cur @ w[i]
            t_prev2, t_prev1 = t_prev1, t_cur
        if self.bias:
            out = out + self.param(
                "bias", nn.initializers.zeros, (self.out_feats,), out.dtype
            )
        return out
