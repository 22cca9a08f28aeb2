"""nn utilities (reference ``python/dgl/nn/pytorch/conv/graphconv.py:16``)."""
from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from ..base import DGLError
from .. import ops


class EdgeWeightNorm(nn.Module):
    """Normalize scalar edge weights like GCN symmetric norm.

    Reference ``python/dgl/nn/pytorch/conv/graphconv.py:16`` (EdgeWeightNorm):
    ``norm='both'`` gives w_uv / sqrt(deg_u * deg_v) with weighted degrees.
    """

    norm: str = "both"
    eps: float = 0.0

    @nn.compact
    def __call__(self, graph, edge_weight):
        if edge_weight.ndim > 1:
            raise DGLError("edge_weight must be 1D (scalar per edge)")
        rel = graph._relation()
        w = edge_weight
        # weighted degrees
        deg_dst = ops.gspmm(rel, "copy_rhs", "sum", None, w) + self.eps
        if self.norm == "both":
            deg_src = ops.gspmm(rel.reverse(), "copy_rhs", "sum", None, w) + self.eps
            inv_src = jnp.where(deg_src > 0, jax_rsqrt(deg_src), 0.0)
            inv_dst = jnp.where(deg_dst > 0, jax_rsqrt(deg_dst), 0.0)
            return w * inv_src[rel.src] * inv_dst[rel.dst]
        if self.norm == "right":
            inv = jnp.where(deg_dst > 0, 1.0 / deg_dst, 0.0)
            return w * inv[rel.dst]
        raise DGLError(f"Unknown norm {self.norm!r}")


def jax_rsqrt(x):
    return 1.0 / jnp.sqrt(x)
