"""Graphormer degree encoder (reference
``python/dgl/nn/pytorch/gt/degree_encoder.py``): learned embeddings of
(clipped) in/out degrees added to node features."""
from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn


class DegreeEncoder(nn.Module):
    """(reference ``degree_encoder.py:10``).

    Input: degrees (B, N) for undirected ('both') or a (B, N, 2) stack of
    (in, out) degrees for directed graphs. Output: (B, N, embedding_dim).
    """

    max_degree: int
    embedding_dim: int
    direction: str = "both"

    @nn.compact
    def __call__(self, degrees):
        clipped = jnp.clip(degrees, 0, self.max_degree)
        if self.direction == "both":
            emb = nn.Embed(self.max_degree + 1, self.embedding_dim, name="encoder1")
            if clipped.ndim == 3:
                return emb(clipped).sum(axis=-2)
            return emb(clipped)
        if self.direction == "in":
            return nn.Embed(
                self.max_degree + 1, self.embedding_dim, name="encoder1"
            )(clipped[..., 0] if clipped.ndim == 3 else clipped)
        if self.direction == "out":
            return nn.Embed(
                self.max_degree + 1, self.embedding_dim, name="encoder2"
            )(clipped[..., 1] if clipped.ndim == 3 else clipped)
        raise ValueError(f"Unknown direction {self.direction!r}")
