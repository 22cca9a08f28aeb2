"""GraphSAGE over on-device fixed-shape MFGs (:class:`DeviceMFG`).

Same math as :class:`dgl_tpu.nn.SAGEConv` with the mean aggregator
(reference ``python/dgl/nn/pytorch/conv/sageconv.py:13``):
``h = fc_self(h_dst) + fc_neigh(masked_mean(h_nbrs)) + bias`` — but the
neighbor mean is a static reshape over the fixed-fanout frontier instead
of a g-SpMM, so the whole step (sampling included) compiles into one XLA
program. Parity with SAGEConv is locked by
``tests/test_device_sampler.py`` (fanout >= max in-degree => take-all =>
identical outputs).
"""
from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

__all__ = ["DeviceSAGE"]


class DeviceSAGE(nn.Module):
    """Multi-layer mean-aggregator GraphSAGE on a :class:`DeviceMFG`.

    ``__call__(mfg, x)`` where ``x`` are input features for
    ``mfg.frontiers[-1]`` (use ``feats[mfg.input_nodes()]``). Returns
    per-seed logits, aligned with ``mfg.frontiers[0]``.
    """

    in_feats: int
    hidden_feats: int
    num_classes: int
    num_layers: int = 2
    dropout: float = 0.0

    @nn.compact
    def __call__(self, mfg, x, deterministic: bool = True):
        L = mfg.num_layers
        if L != self.num_layers:
            raise ValueError(
                f"MFG has {L} layers but model expects {self.num_layers}"
            )
        dims = ([self.in_feats] + [self.hidden_feats] * (self.num_layers - 1)
                + [self.num_classes])
        h = x
        # depth L-1 (innermost frontier) applies GNN layer 0
        for depth in range(L - 1, -1, -1):
            layer = L - 1 - depth
            num = mfg.frontiers[depth].shape[0]
            fanout = mfg.nbrs[depth].shape[1]
            h_self = h[:num]
            h_nbr = h[num:num + num * fanout].reshape(num, fanout, -1)
            m = mfg.masks[depth].astype(h.dtype)[..., None]
            mean = (h_nbr * m).sum(1) / jnp.maximum(m.sum(1), 1.0)
            fc_neigh = nn.Dense(
                dims[layer + 1], use_bias=False,
                kernel_init=nn.initializers.xavier_uniform(),
                name=f"sage{layer}_fc_neigh",
            )
            fc_self = nn.Dense(
                dims[layer + 1], use_bias=False,
                kernel_init=nn.initializers.xavier_uniform(),
                name=f"sage{layer}_fc_self",
            )
            h = fc_self(h_self) + fc_neigh(mean)
            h = h + self.param(f"sage{layer}_bias", nn.initializers.zeros,
                               (dims[layer + 1],), h.dtype)
            if layer != self.num_layers - 1:
                h = jax.nn.relu(h)
                if self.dropout > 0:
                    h = nn.Dropout(self.dropout,
                                   deterministic=deterministic)(h)
        return h
