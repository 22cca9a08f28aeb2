"""Graphormer spatial encoder (reference
``python/dgl/nn/pytorch/gt/spatial_encoder.py``): learned bias per
(clipped) shortest-path distance added to attention scores."""
from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn


class SpatialEncoder(nn.Module):
    """(reference ``spatial_encoder.py:10``).

    Input: ``dist`` (B, N, N) shortest-path distances (-1 = unreachable).
    Output: (B, N, N, num_heads) attention bias.
    """

    max_dist: int
    num_heads: int = 1

    @nn.compact
    def __call__(self, dist):
        # bucket: -1 (unreachable) -> 0, 0..max_dist -> 1..max_dist+1
        bucket = jnp.clip(dist, -1, self.max_dist) + 1
        emb = nn.Embed(self.max_dist + 2, self.num_heads, name="embedding")
        return emb(bucket)
