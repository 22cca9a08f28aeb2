"""GIN layer (reference ``python/dgl/nn/pytorch/conv/ginconv.py``)."""
from __future__ import annotations

from typing import Callable, Optional

import jax.numpy as jnp
from flax import linen as nn

from ...base import DGLError
from ... import function as fn
from .graphconv import expand_as_pair


class GINConv(nn.Module):
    """Graph Isomorphism Network layer (reference ``ginconv.py:14``).

    ``apply_func`` is any callable (e.g. a flax MLP submodule instance).
    """

    apply_func: Optional[Callable] = None
    aggregator_type: str = "sum"
    init_eps: float = 0.0
    learn_eps: bool = False
    activation: Optional[Callable] = None

    @nn.compact
    def __call__(self, graph, feat, edge_weight=None):
        if self.aggregator_type not in ("sum", "max", "mean"):
            raise DGLError(f"Invalid aggregator_type {self.aggregator_type!r}")
        reducer = getattr(fn, self.aggregator_type)
        with graph.local_scope() as g:
            feat_src, feat_dst = expand_as_pair(feat, g)
            msg_fn = fn.copy_u("h", "m")
            if edge_weight is not None:
                g.edata["_edge_weight"] = edge_weight
                msg_fn = fn.u_mul_e("h", "_edge_weight", "m")
            if self.learn_eps:
                eps = self.param(
                    "eps",
                    lambda rng, shape: jnp.full(shape, self.init_eps),
                    (1,),
                )
            else:
                eps = self.init_eps
            g.srcdata["h"] = feat_src
            g.update_all(msg_fn, reducer("m", "neigh"))
            rst = (1 + eps) * feat_dst + g.dstdata["neigh"]
            if self.apply_func is not None:
                rst = self.apply_func(rst)
            if self.activation is not None:
                rst = self.activation(rst)
            return rst
