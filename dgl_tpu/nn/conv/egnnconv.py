"""E(n)-equivariant graph conv (reference
``python/dgl/nn/pytorch/conv/egnnconv.py``): messages from invariant
squared distances; coordinates updated equivariantly."""
from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from ... import function as fn


class EGNNConv(nn.Module):
    """(reference ``egnnconv.py:10``).

    ``__call__(g, node_feat, coord_feat, edge_feat=None)`` returns
    ``(h', x')``.
    """

    in_size: int
    hidden_size: int
    out_size: int
    edge_feat_size: int = 0

    @nn.compact
    def __call__(self, graph, node_feat, coord_feat, edge_feat=None):
        act = jax.nn.silu

        def mlp(sizes, name):
            layers = []
            for i, s in enumerate(sizes):
                layers.append(nn.Dense(s, name=f"{name}{i}"))
            return layers

        edge_mlp = mlp([self.hidden_size, self.hidden_size], "edge_mlp")
        node_mlp = mlp([self.hidden_size, self.out_size], "node_mlp")
        coord_mlp0 = nn.Dense(self.hidden_size, name="coord_mlp0")
        coord_mlp1 = nn.Dense(1, use_bias=False, name="coord_mlp1")

        with graph.local_scope() as g:
            g.ndata["h"] = node_feat
            g.ndata["x"] = coord_feat
            if self.edge_feat_size > 0:
                if edge_feat is None:
                    raise ValueError("edge_feat required")
                g.edata["a"] = edge_feat

            def message(edges):
                diff = edges.src["x"] - edges.dst["x"]
                radial = jnp.sum(diff * diff, axis=-1, keepdims=True)
                parts = [edges.src["h"], edges.dst["h"], radial]
                if self.edge_feat_size > 0:
                    parts.append(edges.data["a"])
                f = jnp.concatenate(parts, axis=-1)
                for i, layer in enumerate(edge_mlp):
                    f = act(layer(f))
                msg_h = f
                w = coord_mlp1(act(coord_mlp0(f)))
                msg_x = diff * w
                return {"msg_h": msg_h, "msg_x": msg_x}

            g.apply_edges(message)
            g.update_all(fn.copy_e("msg_h", "m"), fn.sum("m", "h_neigh"))
            g.update_all(fn.copy_e("msg_x", "m"), fn.mean("m", "x_neigh"))
            h_neigh = g.ndata["h_neigh"]
            x_neigh = g.ndata["x_neigh"]
            x_out = coord_feat + x_neigh
            inp = jnp.concatenate([node_feat, h_neigh], axis=-1)
            h = inp
            for i, layer in enumerate(node_mlp):
                h = layer(h)
                if i < len(node_mlp) - 1:
                    h = act(h)
            return h, x_out
