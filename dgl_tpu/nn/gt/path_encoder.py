"""Graphormer edge/path encoder (reference
``python/dgl/nn/pytorch/gt/path_encoder.py``): attention bias from mean
dot-product of edge features along shortest paths."""
from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn


class PathEncoder(nn.Module):
    """(reference ``path_encoder.py:10``).

    Input: ``dist`` (B, N, N) path lengths; ``path_data`` (B, N, N, max_len,
    feat_dim) edge features along each path (zero-padded).
    Output: (B, N, N, num_heads).
    """

    max_len: int
    feat_dim: int
    num_heads: int = 1

    @nn.compact
    def __call__(self, dist, path_data):
        w = self.param(
            "embedding_table",
            nn.initializers.normal(0.02),
            (self.max_len * self.num_heads, self.feat_dim),
        )
        shortest = jnp.clip(dist, -1, self.max_len)
        # per-step dot with learned edge weights
        edge_emb = w.reshape(self.max_len, self.num_heads, self.feat_dim)
        # (B,N,N,L,F) x (L,H,F) -> (B,N,N,L,H)
        dots = jnp.einsum("bxyld,lhd->bxylh", path_data[..., : self.max_len, :], edge_emb)
        L = jnp.arange(self.max_len)
        valid = L[None, None, None, :] < shortest[..., None]  # (B,N,N,L)
        summed = jnp.where(valid[..., None], dots, 0.0).sum(axis=-2)
        denom = jnp.maximum(shortest, 1)[..., None].astype(summed.dtype)
        bias = summed / denom
        return jnp.where((shortest > 0)[..., None], bias, 0.0)
