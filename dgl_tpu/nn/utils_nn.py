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


class Identity(nn.Module):
    """(reference ``nn/pytorch/utils.py:99``)."""

    @nn.compact
    def __call__(self, x):
        return x


class Sequential(nn.Module):
    """Graph-aware sequential container (reference ``utils.py:113``):
    each layer is called as ``layer(graph, *feats)``."""

    layers: tuple

    @nn.compact
    def __call__(self, graph, *feats):
        for layer in self.layers:
            if isinstance(feats, tuple):
                feats = layer(graph, *feats)
            else:
                feats = layer(graph, feats)
            if not isinstance(feats, tuple):
                feats = (feats,)
        return feats[0] if len(feats) == 1 else feats


class WeightBasis(nn.Module):
    """Basis-decomposed weight bank (reference ``utils.py:235``):
    W_r = sum_b a_rb V_b."""

    shape: tuple
    num_bases: int
    num_outputs: int

    @nn.compact
    def __call__(self):
        basis = self.param(
            "weight", nn.initializers.xavier_uniform(),
            (self.num_bases,) + tuple(self.shape),
        )
        coeff = self.param(
            "w_comp", nn.initializers.xavier_uniform(),
            (self.num_outputs, self.num_bases),
        )
        return jnp.einsum("ob,b...->o...", coeff, basis)


class JumpingKnowledge(nn.Module):
    """Combine per-layer representations (reference ``utils.py:296``):
    mode in {cat, max, lstm-free 'sum'/'mean'}."""

    mode: str = "cat"
    in_feats: int = 0
    num_layers: int = 0

    @nn.compact
    def __call__(self, feat_list):
        if self.mode == "cat":
            return jnp.concatenate(feat_list, axis=-1)
        stacked = jnp.stack(feat_list, axis=0)
        if self.mode == "max":
            return stacked.max(axis=0)
        if self.mode == "sum":
            return stacked.sum(axis=0)
        if self.mode == "mean":
            return stacked.mean(axis=0)
        raise ValueError(f"Unknown JK mode {self.mode!r}")


class LabelPropagation(nn.Module):
    """Iterative label propagation (reference ``utils.py:425``):
    Y' = alpha D^-1/2 A D^-1/2 Y + (1-alpha) Y, k iterations, clamped."""

    k: int = 3
    alpha: float = 0.9
    clamp: bool = True
    normalize: bool = False

    @nn.compact
    def __call__(self, g, labels, mask=None):
        import jax as _jax

        from .. import function as fn

        n = g.num_nodes()
        if labels.ndim == 1:
            num_classes = int(jnp.max(labels)) + 1 if labels.size else 1
            y = _jax.nn.one_hot(labels, num_classes)
        else:
            y = labels.astype(jnp.float32)
        if mask is not None:
            m = mask.astype(y.dtype)[:, None]
            y = y * m
        init = y
        deg_in = jnp.maximum(g.in_degrees().astype(y.dtype), 1)
        deg_out = jnp.maximum(g.out_degrees().astype(y.dtype), 1)
        ni = _jax.lax.rsqrt(deg_in)[:, None]
        no = _jax.lax.rsqrt(deg_out)[:, None]
        for _ in range(self.k):
            with g.local_scope() as gg:
                gg.srcdata["h"] = y * no
                gg.update_all(fn.copy_u("h", "m"), fn.sum("m", "h"))
                y = self.alpha * gg.dstdata["h"] * ni + (1 - self.alpha) * init
            if self.clamp:
                y = jnp.clip(y, 0.0, 1.0)
            if self.normalize:
                y = y / jnp.maximum(y.sum(-1, keepdims=True), 1e-12)
        return y
