"""GraphSAGE model — the flagship minibatch model.

Reference: ``examples/graphbolt/node_classification.py`` (SAGE over MFG
blocks, fanout [10, 25]) and ``examples/multigpu/node_classification_sage.py``.
Accepts either one graph for full-graph training, or a list of blocks (MFGs)
for neighbor-sampled minibatch training.
"""
from __future__ import annotations


import jax
from flax import linen as nn

from ..nn.conv.sageconv import SAGEConv


class GraphSAGE(nn.Module):
    in_feats: int
    hidden_feats: int
    num_classes: int
    num_layers: int = 3
    aggregator_type: str = "mean"
    dropout: float = 0.5

    @nn.compact
    def __call__(self, graph_or_blocks, x, deterministic: bool = True):
        blocks = (
            graph_or_blocks
            if isinstance(graph_or_blocks, (list, tuple))
            else [graph_or_blocks] * self.num_layers
        )
        dims = (
            [self.in_feats]
            + [self.hidden_feats] * (self.num_layers - 1)
            + [self.num_classes]
        )
        h = x
        for i, block in enumerate(blocks):
            h = SAGEConv(
                dims[i],
                dims[i + 1],
                aggregator_type=self.aggregator_type,
                name=f"sage{i}",
            )(block, h)
            if i != self.num_layers - 1:
                h = jax.nn.relu(h)
                h = nn.Dropout(self.dropout, deterministic=deterministic)(h)
        return h
