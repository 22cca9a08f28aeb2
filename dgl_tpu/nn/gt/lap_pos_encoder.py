"""Laplacian positional encoder (reference
``python/dgl/nn/pytorch/gt/lap_pos_encoder.py``): project the k smallest
Laplacian eigenvectors (from ``dgl.lap_pe``) with a linear map or a
transformer/DeepSet over the frequency axis."""
from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn


class LapPosEncoder(nn.Module):
    """(reference ``lap_pos_encoder.py:9``)."""

    model_type: str  # 'Transformer' | 'DeepSet'
    num_layer: int
    k: int
    dim: int
    n_head: int = 1
    batch_norm: bool = False
    num_post_layer: int = 0

    @nn.compact
    def __call__(self, eigvals, eigvecs):
        # eigvals (N, k), eigvecs (N, k) -> (N, k, 2)
        pos = jnp.stack([eigvecs, eigvals], axis=-1)
        mask = jnp.isnan(pos).any(axis=-1)
        pos = jnp.where(jnp.isnan(pos), 0.0, pos)
        h = nn.Dense(self.dim, name="linear_a")(pos)  # (N, k, dim)
        if self.model_type == "Transformer":
            for i in range(self.num_layer):
                attn = nn.SelfAttention(
                    num_heads=self.n_head, name=f"attn{i}"
                )(h, mask=None)
                h = h + attn
        else:  # DeepSet
            for i in range(self.num_layer):
                h = nn.Dense(self.dim, name=f"ds{i}")(h)
                h = nn.relu(h)
        h = jnp.where(mask[..., None], 0.0, h)
        h = h.sum(axis=-2)  # sum over frequencies
        for i in range(self.num_post_layer):
            h = nn.Dense(self.dim, name=f"post{i}")(h)
            if i < self.num_post_layer - 1:
                h = nn.relu(h)
        return h
