"""Link prediction scorers (reference ``python/dgl/nn/pytorch/link/``:
``edgepred.py``, ``transe.py``, ``transr.py``)."""
from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
from flax import linen as nn


__all__ = ["EdgePredictor", "TransE", "TransR"]


class EdgePredictor(nn.Module):
    """Pairwise scorer for (src, dst) representation pairs (reference
    ``edgepred.py:10``): op in {dot, cos, ele, cat}."""

    op: str = "dot"
    in_feats: Optional[int] = None
    out_feats: Optional[int] = None
    bias: bool = False

    @nn.compact
    def __call__(self, h_src, h_dst):
        if self.op == "dot":
            out = (h_src * h_dst).sum(-1, keepdims=True)
        elif self.op == "cos":
            s = h_src / (jnp.linalg.norm(h_src, axis=-1, keepdims=True) + 1e-12)
            d = h_dst / (jnp.linalg.norm(h_dst, axis=-1, keepdims=True) + 1e-12)
            out = (s * d).sum(-1, keepdims=True)
        elif self.op == "ele":
            out = h_src * h_dst
        elif self.op == "cat":
            out = jnp.concatenate([h_src, h_dst], axis=-1)
        else:
            raise ValueError(f"Unknown op {self.op!r}")
        if self.out_feats is not None:
            out = nn.Dense(self.out_feats, use_bias=self.bias, name="lin")(out)
        return out


class TransE(nn.Module):
    """TransE KG scorer: -||h + r - t|| (reference ``transe.py:8``)."""

    num_rels: int
    feats: int
    p: int = 1

    @nn.compact
    def __call__(self, h_head, h_tail, rels):
        r = nn.Embed(self.num_rels, self.feats, name="rel_emb")(rels)
        diff = h_head + r - h_tail
        if self.p == 1:
            return -jnp.abs(diff).sum(-1)
        return -jnp.sqrt((diff * diff).sum(-1) + 1e-12)


class TransR(nn.Module):
    """TransR KG scorer: project entities into relation space first
    (reference ``transr.py:8``)."""

    num_rels: int
    rfeats: int
    nfeats: int
    p: int = 1

    @nn.compact
    def __call__(self, h_head, h_tail, rels):
        r = nn.Embed(self.num_rels, self.rfeats, name="rel_emb")(rels)
        proj = nn.Embed(
            self.num_rels, self.rfeats * self.nfeats, name="rel_project"
        )(rels).reshape(-1, self.nfeats, self.rfeats)
        hh = jnp.einsum("ed,edr->er", h_head, proj)
        ht = jnp.einsum("ed,edr->er", h_tail, proj)
        diff = hh + r - ht
        if self.p == 1:
            return -jnp.abs(diff).sum(-1)
        return -jnp.sqrt((diff * diff).sum(-1) + 1e-12)
