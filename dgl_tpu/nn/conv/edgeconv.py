"""EdgeConv (Dynamic Graph CNN), reference ``python/dgl/nn/pytorch/conv/edgeconv.py``."""
from __future__ import annotations

from flax import linen as nn

from ... import function as fn
from .graphconv import expand_as_pair


class EdgeConv(nn.Module):
    """EdgeConv: max_j MLP(theta (x_j - x_i) + phi x_i) (reference ``edgeconv.py:12``)."""

    in_feats: int
    out_feats: int
    batch_norm: bool = False

    @nn.compact
    def __call__(self, graph, feat):
        with graph.local_scope() as g:
            h_src, h_dst = expand_as_pair(feat, g)
            g.srcdata["x"] = h_src
            g.dstdata["x"] = h_dst
            # message from neighbor u to center v: theta(x_u - x_v) + phi(x_v)
            g.apply_edges(fn.u_sub_v("x", "x", "theta"))
            theta = nn.Dense(
                self.out_feats, kernel_init=nn.initializers.xavier_uniform(),
                name="theta",
            )(g.edata["theta"])
            phi = nn.Dense(
                self.out_feats, kernel_init=nn.initializers.xavier_uniform(),
                name="phi",
            )(h_dst)[g._relation().dst]
            e = theta + phi
            if self.batch_norm:
                e = nn.BatchNorm(use_running_average=True, name="bn")(e)
            g.edata["e"] = e
            g.update_all(fn.copy_e("e", "m"), fn.max("m", "x"))
            return g.dstdata["x"]
