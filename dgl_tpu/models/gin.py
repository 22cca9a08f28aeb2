"""GIN graph-classification model (reference
``examples/pytorch/gin/train.py``: 5 GINConv layers with 2-layer MLPs,
batch norm, sum readout per layer, summed jumping-knowledge logits)."""
from __future__ import annotations

from flax import linen as nn
import jax

from ..nn.conv.ginconv import GINConv
from ..readout import sum_nodes, mean_nodes


class _MLP(nn.Module):
    hidden: int
    out: int

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.hidden)(x)
        x = nn.LayerNorm()(x)
        x = jax.nn.relu(x)
        return nn.Dense(self.out)(x)


class GIN(nn.Module):
    """Returns per-graph logits for a batched graph.

    ``__call__(graph, x, deterministic=True)``; the graph must be a
    ``dgl.batch`` result (readout uses its batch structure).
    """

    in_feats: int
    hidden_feats: int
    num_classes: int
    num_layers: int = 5
    dropout: float = 0.5
    readout: str = "sum"
    learn_eps: bool = False

    @nn.compact
    def __call__(self, graph, x, deterministic: bool = True):
        pool = sum_nodes if self.readout == "sum" else mean_nodes
        score = 0.0
        h = x
        for i in range(self.num_layers):
            out_dim = self.hidden_feats
            mlp = _MLP(self.hidden_feats, out_dim, name=f"mlp{i}")
            h = GINConv(apply_func=mlp, learn_eps=self.learn_eps,
                        name=f"gin{i}")(graph, h)
            h = jax.nn.relu(h)
            with graph.local_scope() as g:
                g.ndata["_gin_h"] = h
                hg = pool(g, "_gin_h")
            hg = nn.Dropout(self.dropout, deterministic=deterministic)(hg)
            score = score + nn.Dense(self.num_classes, name=f"pred{i}")(hg)
        return score
