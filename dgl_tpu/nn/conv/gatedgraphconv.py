"""Gated Graph Convolution (GGNN), reference ``python/dgl/nn/pytorch/conv/gatedgraphconv.py``."""
from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from ... import function as fn
from ...ops import gather_mm


class GatedGraphConv(nn.Module):
    """GGNN layer (reference ``gatedgraphconv.py:13``).

    ``etypes`` is an (E,) int array of edge type ids; per-step messages use a
    per-type weight (one-hot MXU gather_mm) followed by a GRU update.
    """

    in_feats: int
    out_feats: int
    n_steps: int
    n_etypes: int = 1

    @nn.compact
    def __call__(self, graph, feat, etypes=None):
        with graph.local_scope() as g:
            if etypes is None:
                etypes = jnp.zeros(
                    (g._relation().num_edges_padded,), dtype=jnp.int32
                )
            zero_pad = jnp.zeros(
                feat.shape[:-1] + (self.out_feats - self.in_feats,), feat.dtype
            ) if self.out_feats > self.in_feats else None
            h = jnp.concatenate([feat, zero_pad], -1) if zero_pad is not None else feat
            weight = self.param(
                "weight",
                nn.initializers.xavier_uniform(),
                (self.n_etypes, self.out_feats, self.out_feats),
            )
            gru = nn.GRUCell(self.out_feats, name="gru")
            rel = g._relation()
            for _ in range(self.n_steps):
                m = gather_mm(h[rel.src], weight, etypes)
                g.edata["m"] = m
                g.update_all(fn.copy_e("m", "m"), fn.sum("m", "a"))
                a = g.dstdata["a"]
                h, _ = gru(h, a)
            return h
