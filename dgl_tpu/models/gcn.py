"""GCN model (reference ``examples/core/gcn/train.py``: two GraphConv layers)."""
from __future__ import annotations


import jax
from flax import linen as nn

from ..nn.conv.graphconv import GraphConv


class GCN(nn.Module):
    """2+-layer GCN. With ``static_input_agg=True``, pass
    ``x = precompute_graphconv(graph, raw_x)`` (computed once, outside the
    epoch loop) and layer 0 skips its g-SpMM — an exact rewrite since the
    aggregation is linear and the input features are constant during
    training (see ``nn/conv/graphconv.py::precompute_graphconv``)."""

    in_feats: int
    hidden_feats: int
    num_classes: int
    num_layers: int = 2
    dropout: float = 0.5
    static_input_agg: bool = False

    @nn.compact
    def __call__(self, graph, x, deterministic: bool = True):
        dims = (
            [self.in_feats]
            + [self.hidden_feats] * (self.num_layers - 1)
            + [self.num_classes]
        )
        for i in range(self.num_layers):
            x = GraphConv(dims[i], dims[i + 1], name=f"conv{i}")(
                graph, x, precomputed=(i == 0 and self.static_input_agg)
            )
            if i != self.num_layers - 1:
                x = jax.nn.relu(x)
                x = nn.Dropout(self.dropout, deterministic=deterministic)(x)
        return x
