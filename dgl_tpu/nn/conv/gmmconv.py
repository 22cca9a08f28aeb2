"""Gaussian Mixture Model conv / MoNet (reference
``python/dgl/nn/pytorch/conv/gmmconv.py``): per-edge mixture weights over
pseudo-coordinates gate K projected copies of the source features."""
from __future__ import annotations


import jax.numpy as jnp
from flax import linen as nn

from ... import function as fn
from ...base import DGLError
from .graphconv import expand_as_pair


class GMMConv(nn.Module):
    """(reference ``gmmconv.py:13``)."""

    in_feats: int
    out_feats: int
    dim: int            # pseudo-coordinate dimensionality
    n_kernels: int
    aggregator_type: str = "sum"
    residual: bool = False
    bias: bool = True

    @nn.compact
    def __call__(self, graph, feat, pseudo):
        if self.aggregator_type not in ("sum", "mean", "max"):
            raise DGLError(f"Invalid aggregator {self.aggregator_type!r}")
        reducer = {
            "sum": fn.sum, "mean": fn.mean, "max": fn.max
        }[self.aggregator_type]
        K = self.n_kernels
        mu = self.param(
            "mu", nn.initializers.normal(0.1), (K, self.dim), jnp.float32
        )
        inv_sigma = self.param(
            "inv_sigma", nn.initializers.constant(1.0), (K, self.dim), jnp.float32
        )
        fc = nn.Dense(
            K * self.out_feats,
            use_bias=False,
            kernel_init=nn.initializers.xavier_normal(),
            name="fc",
        )
        with graph.local_scope() as g:
            feat_src, feat_dst = expand_as_pair(feat, g)
            g.srcdata["h"] = fc(feat_src).reshape(-1, K, self.out_feats)
            # gaussian weights per edge/kernel
            E = pseudo.shape[0]
            diff = pseudo[:, None, :] - mu[None, :, :]       # (E, K, dim)
            gw = jnp.exp(
                -0.5 * jnp.sum((diff * inv_sigma[None]) ** 2, axis=-1)
            )                                                 # (E, K)
            g.edata["w"] = gw[:, :, None]
            g.update_all(fn.u_mul_e("h", "w", "m"), reducer("m", "h"))
            rst = g.dstdata["h"].sum(axis=1)                  # sum over kernels
            if self.residual:
                rst = rst + nn.Dense(
                    self.out_feats, use_bias=False,
                    kernel_init=nn.initializers.xavier_normal(),
                    name="res_fc",
                )(feat_dst)
            if self.bias:
                rst = rst + self.param(
                    "bias", nn.initializers.zeros, (self.out_feats,), rst.dtype
                )
            return rst
