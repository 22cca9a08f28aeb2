"""R-GCN entity-classification model (reference ``examples/pytorch/rgcn``)."""
from __future__ import annotations

import jax
from flax import linen as nn

from ..nn.conv.relgraphconv import RelGraphConv


class RGCN(nn.Module):
    in_feats: int
    hidden_feats: int
    num_classes: int
    num_rels: int
    num_bases: int = -1
    num_layers: int = 2
    self_loop: bool = True
    dropout: float = 0.0

    @nn.compact
    def __call__(self, graph, x, etypes, deterministic: bool = True):
        dims = (
            [self.in_feats]
            + [self.hidden_feats] * (self.num_layers - 1)
            + [self.num_classes]
        )
        h = x
        for i in range(self.num_layers):
            h = RelGraphConv(
                dims[i],
                dims[i + 1],
                self.num_rels,
                regularizer="basis" if self.num_bases > 0 else None,
                num_bases=self.num_bases if self.num_bases > 0 else None,
                self_loop=self.self_loop,
                name=f"rgcn{i}",
            )(graph, h, etypes)
            if i != self.num_layers - 1:
                h = jax.nn.relu(h)
                h = nn.Dropout(self.dropout, deterministic=deterministic)(h)
        return h
