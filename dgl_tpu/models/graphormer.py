"""Graphormer graph-level model (reference ``examples/core/Graphormer`` and
``python/dgl/nn/pytorch/gt/``): degree + spatial encodings, stacked biased
MHA layers, virtual-node ([CLS]-style) graph readout.

Operates on dense padded batches — built with ``prepare_batch`` from a list
of Graphs (the natural TPU layout for molecule-scale graphs)."""
from __future__ import annotations

from typing import List

import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..nn.gt import DegreeEncoder, GraphormerLayer, SpatialEncoder


def prepare_batch(graphs: List, feat_key: str = "feat", max_dist: int = 5):
    """Host-side featurization: pad node feats, degrees, shortest-path
    distances to (B, N_max, ...); slot 0 is the virtual node."""
    from ..transforms.functional import shortest_dist

    B = len(graphs)
    n_max = max(g.num_nodes() for g in graphs) + 1  # +1 virtual node
    F = np.asarray(graphs[0].ndata[feat_key]).shape[-1]
    x = np.zeros((B, n_max, F), np.float32)
    deg = np.zeros((B, n_max, 2), np.int32)
    dist = np.full((B, n_max, n_max), -1, np.int64)
    mask = np.zeros((B, n_max, n_max), bool)
    for b, g in enumerate(graphs):
        n = g.num_nodes()
        x[b, 1 : n + 1] = np.asarray(g.ndata[feat_key])
        deg[b, 1 : n + 1, 0] = np.asarray(g.in_degrees())
        deg[b, 1 : n + 1, 1] = np.asarray(g.out_degrees())
        d = np.asarray(shortest_dist(g))
        dist[b, 1 : n + 1, 1 : n + 1] = d
        # virtual node connects to everything at distance 0 bucket
        dist[b, 0, : n + 1] = 0
        dist[b, : n + 1, 0] = 0
        mask[b, : n + 1, : n + 1] = True
    attn_mask = ~mask  # True = masked out
    return (
        jnp.asarray(x),
        jnp.asarray(deg),
        jnp.asarray(np.clip(dist, -1, max_dist)),
        jnp.asarray(attn_mask),
    )


class Graphormer(nn.Module):
    """(reference Graphormer example model)."""

    feat_size: int
    hidden_size: int
    num_classes: int
    num_layers: int = 4
    num_heads: int = 8
    max_degree: int = 64
    max_dist: int = 5
    dropout: float = 0.1

    @nn.compact
    def __call__(self, x, degrees, dist, attn_mask=None,
                 deterministic: bool = True):
        h = nn.Dense(self.hidden_size, name="proj_in")(x)
        h = h + DegreeEncoder(
            self.max_degree, self.hidden_size, name="degree_enc"
        )(degrees)
        bias = SpatialEncoder(
            self.max_dist, num_heads=self.num_heads, name="spatial_enc"
        )(dist)
        for i in range(self.num_layers):
            h = GraphormerLayer(
                self.hidden_size,
                self.hidden_size * 2,
                self.num_heads,
                dropout=self.dropout,
                attn_dropout=self.dropout,
                name=f"layer{i}",
            )(h, bias, attn_mask, deterministic=deterministic)
        # graph readout at the virtual node (slot 0)
        return nn.Dense(self.num_classes, name="head")(h[:, 0])
