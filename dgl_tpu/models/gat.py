"""GAT model (reference ``examples/core/gat/train.py``: stacked GATConv)."""
from __future__ import annotations

import jax
from flax import linen as nn

from ..nn.conv.gatconv import GATConv


class GAT(nn.Module):
    in_feats: int
    hidden_feats: int
    num_classes: int
    heads: int = 8
    num_layers: int = 2
    feat_drop: float = 0.6
    attn_drop: float = 0.6

    @nn.compact
    def __call__(self, graph, x, deterministic: bool = True):
        h = x
        for i in range(self.num_layers - 1):
            in_f = self.in_feats if i == 0 else self.hidden_feats * self.heads
            h = GATConv(
                in_f,
                self.hidden_feats,
                self.heads,
                feat_drop=self.feat_drop,
                attn_drop=self.attn_drop,
                activation=jax.nn.elu,
                name=f"gat{i}",
            )(graph, h, deterministic=deterministic)
            h = h.reshape(h.shape[0], -1)  # concat heads
        in_f = self.in_feats if self.num_layers == 1 else self.hidden_feats * self.heads
        h = GATConv(
            in_f,
            self.num_classes,
            1,
            feat_drop=self.feat_drop,
            attn_drop=self.attn_drop,
            name=f"gat{self.num_layers - 1}",
        )(graph, h, deterministic=deterministic)
        return h.mean(axis=1)
