"""Graphormer spatial encoder (reference
``python/dgl/nn/pytorch/gt/spatial_encoder.py``): learned bias per
(clipped) shortest-path distance added to attention scores."""
from __future__ import annotations

import jax
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


class SpatialEncoder3d(nn.Module):
    """3D spatial attention bias from Gaussian basis kernels over pairwise
    euclidean distances (reference
    ``python/dgl/nn/pytorch/gt/spatial_encoder.py:88``, Transformer-M).

    ``__call__(coord (B,N,3), node_type (B,N) or None) -> (B,N,N,H)``.
    """

    num_kernels: int
    num_heads: int = 1
    max_node_type: int = 100

    @nn.compact
    def __call__(self, coord, node_type=None):
        B, N = coord.shape[:2]
        K = self.num_kernels
        diff = coord[:, :, None, :] - coord[:, None, :, :]
        euc = jnp.sqrt(jnp.sum(diff * diff, axis=-1) + 1e-12)  # (B,N,N)
        gamma_tbl = nn.Embed(2 * self.max_node_type + 4, 1, name="gamma")
        beta_tbl = nn.Embed(2 * self.max_node_type + 4, 1, name="beta")
        if node_type is None:
            nt = jnp.zeros((B, N, N, 2), jnp.int32)
        else:
            src_t = jnp.repeat(node_type[:, :, None], N, axis=2)
            tgt_t = jnp.repeat(node_type[:, None, :], N, axis=1)
            nt = jnp.stack(
                [src_t + 2, tgt_t + self.max_node_type + 3], axis=-1
            )
        gamma = gamma_tbl(nt).sum(axis=-2)      # (B,N,N,1)
        beta = beta_tbl(nt).sum(axis=-2)
        scaled = gamma * euc[..., None] + beta  # (B,N,N,1)
        means = self.param("means", nn.initializers.uniform(3.0), (K,))
        stds = self.param("stds", nn.initializers.uniform(3.0), (K,))
        sigma = jnp.abs(stds) + 1e-2
        x = (scaled - means) / sigma
        gauss = jnp.exp(-0.5 * x * x) / (
            jnp.sqrt(2 * jnp.pi) * sigma
        )                                        # (B,N,N,K)
        h = nn.Dense(K, name="proj1")(gauss)
        h = jax.nn.gelu(h)
        return nn.Dense(self.num_heads, name="proj2")(h)


def gaussian(x, mean, std):
    """Gaussian basis value (reference ``gt/spatial_encoder.py:8``)."""
    const = 0.3989422804014327  # 1/sqrt(2*pi)
    std = std + 1e-2
    return jnp.exp(-0.5 * (((x - mean) / std) ** 2)) * (const / std)
