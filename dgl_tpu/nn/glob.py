"""Global pooling / readout layers (reference ``python/dgl/nn/pytorch/glob.py:31-1305``)."""
from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from .. import readout

__all__ = [
    "SumPooling",
    "AvgPooling",
    "MaxPooling",
    "SortPooling",
    "GlobalAttentionPooling",
    "Set2Set",
]


class SumPooling(nn.Module):
    """(reference ``glob.py:31``)"""

    @nn.compact
    def __call__(self, graph, feat):
        with graph.local_scope() as g:
            g.ndata["_pool"] = feat
            return readout.sum_nodes(g, "_pool")


class AvgPooling(nn.Module):
    """(reference ``glob.py:81``)"""

    @nn.compact
    def __call__(self, graph, feat):
        with graph.local_scope() as g:
            g.ndata["_pool"] = feat
            return readout.mean_nodes(g, "_pool")


class MaxPooling(nn.Module):
    """(reference ``glob.py:131``)"""

    @nn.compact
    def __call__(self, graph, feat):
        with graph.local_scope() as g:
            g.ndata["_pool"] = feat
            return readout.max_nodes(g, "_pool")


class SortPooling(nn.Module):
    """Sort nodes by last feature channel, keep top-k (reference ``glob.py:182``)."""

    k: int

    @nn.compact
    def __call__(self, graph, feat):
        with graph.local_scope() as g:
            feat = jnp.sort(feat, axis=-1)
            g.ndata["_pool"] = feat
            vals, _ = readout.topk_nodes(g, "_pool", self.k, sortby=-1)
            return vals.reshape(graph.batch_size, -1)


class GlobalAttentionPooling(nn.Module):
    """Gated attention pooling (reference ``glob.py:238``).

    ``gate_nn``/``feat_nn`` are callables (flax submodules).
    """

    gate_nn: nn.Module
    feat_nn: nn.Module = None

    @nn.compact
    def __call__(self, graph, feat, get_attention=False):
        with graph.local_scope() as g:
            gate = self.gate_nn(feat)
            feat = self.feat_nn(feat) if self.feat_nn is not None else feat
            g.ndata["_gate"] = gate
            gate = readout.softmax_nodes(g, "_gate")
            g.ndata.pop("_gate")
            g.ndata["_r"] = feat * gate
            out = readout.sum_nodes(g, "_r")
            if get_attention:
                return out, gate
            return out


class Set2Set(nn.Module):
    """Set2Set pooling via LSTM queries (reference ``glob.py:316``)."""

    input_dim: int
    n_iters: int
    n_layers: int = 1

    @nn.compact
    def __call__(self, graph, feat):
        with graph.local_scope() as g:
            B = graph.batch_size
            lstm = nn.OptimizedLSTMCell(self.input_dim, name="lstm")
            carry = lstm.initialize_carry(
                jax.random.PRNGKey(0), (B, self.input_dim)
            )
            q_star = jnp.zeros((B, 2 * self.input_dim), feat.dtype)
            for _ in range(self.n_iters):
                # project q_star down with the LSTM
                carry, q = lstm(carry, q_star)
                e = (feat * readout.broadcast_nodes(g, q)).sum(-1, keepdims=True)
                g.ndata["_e"] = e
                alpha = readout.softmax_nodes(g, "_e")
                g.ndata["_r"] = feat * alpha
                r = readout.sum_nodes(g, "_r")
                q_star = jnp.concatenate([q, r], axis=-1)
            return q_star
