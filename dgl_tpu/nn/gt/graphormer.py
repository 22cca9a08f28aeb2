"""Graphormer layer (reference ``python/dgl/nn/pytorch/gt/graphormer.py``):
BiasedMHA + FFN with pre/post layer norm."""
from __future__ import annotations

import jax
from flax import linen as nn

from .biased_mha import BiasedMHA


class GraphormerLayer(nn.Module):
    """(reference ``graphormer.py:9``)."""

    feat_size: int
    hidden_size: int
    num_heads: int
    attn_bias_type: str = "add"
    norm_first: bool = False
    dropout: float = 0.1
    attn_dropout: float = 0.1
    activation=jax.nn.relu

    @nn.compact
    def __call__(self, nfeat, attn_bias=None, attn_mask=None,
                 deterministic: bool = True):
        attn = BiasedMHA(
            self.feat_size, self.num_heads,
            attn_bias_type=self.attn_bias_type,
            attn_drop=self.attn_dropout, name="attn",
        )
        norm1 = nn.LayerNorm(name="attn_layer_norm")
        norm2 = nn.LayerNorm(name="ffn_layer_norm")

        def ffn(x):
            h = nn.Dense(self.hidden_size, name="ffn0")(x)
            h = jax.nn.relu(h)
            if self.dropout > 0 and not deterministic:
                h = nn.Dropout(self.dropout, deterministic=False)(h)
            h = nn.Dense(self.feat_size, name="ffn1")(h)
            if self.dropout > 0 and not deterministic:
                h = nn.Dropout(self.dropout, deterministic=False)(h)
            return h

        if self.norm_first:
            h = nfeat + attn(norm1(nfeat), attn_bias, attn_mask, deterministic)
            h = h + ffn(norm2(h))
        else:
            h = norm1(nfeat + attn(nfeat, attn_bias, attn_mask, deterministic))
            h = norm2(h + ffn(h))
        return h
