"""SchNet continuous-filter convolution (reference
``python/dgl/nn/pytorch/conv/cfconv.py``): filter-generating network on edge
(distance) features gates projected node features."""
from __future__ import annotations

import jax
from flax import linen as nn

from ... import function as fn


class ShiftedSoftplus(nn.Module):
    """softplus(x) - log(shift) (reference ``cfconv.py:14``)."""

    beta: float = 1.0
    shift: float = 2.0

    @nn.compact
    def __call__(self, x):
        import jax.numpy as jnp

        return jax.nn.softplus(self.beta * x) / self.beta - jnp.log(self.shift)


class CFConv(nn.Module):
    """(reference ``cfconv.py:42``)."""

    node_in_feats: int
    edge_in_feats: int
    hidden_feats: int
    out_feats: int

    @nn.compact
    def __call__(self, g, node_feats, edge_feats):
        ssp = ShiftedSoftplus()
        with g.local_scope() as graph:
            e = nn.Dense(self.hidden_feats, name="project_edge0")(edge_feats)
            e = ssp(e)
            e = nn.Dense(self.hidden_feats, name="project_edge1")(e)
            e = ssp(e)
            h = nn.Dense(self.hidden_feats, use_bias=False, name="project_node")(
                node_feats
            )
            graph.srcdata["hv"] = h
            graph.edata["he"] = e
            graph.update_all(fn.u_mul_e("hv", "he", "m"), fn.sum("m", "h"))
            rst = graph.dstdata["h"]
            rst = nn.Dense(self.out_feats, name="project_out0")(rst)
            rst = ssp(rst)
            return rst
