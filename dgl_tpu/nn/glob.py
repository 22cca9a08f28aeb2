"""Global pooling / readout layers (reference ``python/dgl/nn/pytorch/glob.py:31-1305``)."""
from __future__ import annotations

from typing import Optional

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
    "WeightAndSum",
    "MultiHeadAttention",
    "SetAttentionBlock",
    "InducedSetAttentionBlock",
    "PMALayer",
    "SetTransformerEncoder",
    "SetTransformerDecoder",
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


class WeightAndSum(nn.Module):
    """Per-node learned weights then weighted sum readout (reference
    ``glob.py:1305``)."""

    in_feats: int

    @nn.compact
    def __call__(self, graph, feat):
        w = jax.nn.sigmoid(
            nn.Dense(1, name="atom_weighting")(feat)
        )
        from ..readout import readout_nodes

        with graph.local_scope() as g:
            g.ndata["_wx"] = feat * w
            return readout_nodes(g, "_wx", op="sum")


class MultiHeadAttention(nn.Module):
    """Vanilla MHA block with FFN for set transformers (reference
    ``glob.py:660``)."""

    d_model: int
    num_heads: int
    d_head: int
    d_ff: int
    dropouth: float = 0.0
    dropouta: float = 0.0

    @nn.compact
    def __call__(self, x, mem, lengths_x=None, lengths_mem=None,
                 deterministic: bool = True):
        H, Dh = self.num_heads, self.d_head
        q = nn.Dense(H * Dh, name="proj_q", use_bias=False)(x)
        k = nn.Dense(H * Dh, name="proj_k", use_bias=False)(mem)
        v = nn.Dense(H * Dh, name="proj_v", use_bias=False)(mem)
        B, Nx = x.shape[0], x.shape[1]
        Nm = mem.shape[1]
        q = q.reshape(B, Nx, H, Dh)
        k = k.reshape(B, Nm, H, Dh)
        v = v.reshape(B, Nm, H, Dh)
        score = jnp.einsum("bxhd,bmhd->bxmh", q, k) / jnp.sqrt(Dh)
        att = jax.nn.softmax(score, axis=2)
        out = jnp.einsum("bxmh,bmhd->bxhd", att, v).reshape(B, Nx, H * Dh)
        out = nn.Dense(self.d_model, name="proj_o")(out)
        x = nn.LayerNorm(name="norm_in")(x + out)
        ff = nn.Dense(self.d_ff, name="ffn0")(x)
        ff = jax.nn.relu(ff)
        ff = nn.Dense(self.d_model, name="ffn1")(ff)
        return nn.LayerNorm(name="norm_inter")(x + ff)


class SetAttentionBlock(nn.Module):
    """SAB (reference ``glob.py:779``)."""

    d_model: int
    num_heads: int
    d_head: int
    d_ff: int

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        return MultiHeadAttention(
            self.d_model, self.num_heads, self.d_head, self.d_ff, name="mha"
        )(x, x, deterministic=deterministic)


class InducedSetAttentionBlock(nn.Module):
    """ISAB (reference ``glob.py:830``): attention through m inducing points."""

    m: int
    d_model: int
    num_heads: int
    d_head: int
    d_ff: int

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        B = x.shape[0]
        ind = self.param(
            "inducing_points", nn.initializers.xavier_uniform(),
            (1, self.m, self.d_model),
        )
        ind = jnp.broadcast_to(ind, (B, self.m, self.d_model))
        h = MultiHeadAttention(
            self.d_model, self.num_heads, self.d_head, self.d_ff, name="mha0"
        )(ind, x, deterministic=deterministic)
        return MultiHeadAttention(
            self.d_model, self.num_heads, self.d_head, self.d_ff, name="mha1"
        )(x, h, deterministic=deterministic)


class PMALayer(nn.Module):
    """Pooling by multi-head attention with k seed vectors (reference
    ``glob.py:918``)."""

    k: int
    d_model: int
    num_heads: int
    d_head: int
    d_ff: int

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        B = x.shape[0]
        seed = self.param(
            "seed_vectors", nn.initializers.xavier_uniform(),
            (1, self.k, self.d_model),
        )
        seed = jnp.broadcast_to(seed, (B, self.k, self.d_model))
        ff = nn.Dense(self.d_model, name="rff")(x)
        ff = jax.nn.relu(ff)
        return MultiHeadAttention(
            self.d_model, self.num_heads, self.d_head, self.d_ff, name="mha"
        )(seed, ff, deterministic=deterministic)


class SetTransformerEncoder(nn.Module):
    """(reference ``glob.py:1006``): stack of SAB/ISAB blocks over the dense
    padded node batch of each graph."""

    d_model: int
    n_heads: int
    d_head: int
    d_ff: int
    n_layers: int = 1
    block_type: str = "sab"
    m: Optional[int] = None

    @nn.compact
    def __call__(self, graph, feat, deterministic: bool = True):
        x, mask = _to_dense_batch(graph, feat)
        for i in range(self.n_layers):
            if self.block_type == "isab":
                x = InducedSetAttentionBlock(
                    self.m or 16, self.d_model, self.n_heads, self.d_head,
                    self.d_ff, name=f"isab{i}",
                )(x, deterministic=deterministic)
            else:
                x = SetAttentionBlock(
                    self.d_model, self.n_heads, self.d_head, self.d_ff,
                    name=f"sab{i}",
                )(x, deterministic=deterministic)
        return _from_dense_batch(graph, x, feat.shape[0])


class SetTransformerDecoder(nn.Module):
    """(reference ``glob.py:1168``): PMA pooling + SAB, flattened readout."""

    d_model: int
    num_heads: int
    d_head: int
    d_ff: int
    n_layers: int
    k: int

    @nn.compact
    def __call__(self, graph, feat, deterministic: bool = True):
        x, mask = _to_dense_batch(graph, feat)
        x = PMALayer(
            self.k, self.d_model, self.num_heads, self.d_head, self.d_ff,
            name="pma",
        )(x, deterministic=deterministic)
        for i in range(self.n_layers):
            x = SetAttentionBlock(
                self.d_model, self.num_heads, self.d_head, self.d_ff,
                name=f"sab{i}",
            )(x, deterministic=deterministic)
        return x.reshape(x.shape[0], self.k * self.d_model)


def _to_dense_batch(graph, feat):
    """(B, N_max, F) dense batch + mask from a batched graph's node feats."""
    import numpy as _np

    bnn = _np.asarray(graph.batch_num_nodes())
    B = bnn.shape[0]
    n_max = int(bnn.max())
    offs = _np.concatenate([[0], _np.cumsum(bnn)])
    idx = _np.zeros((B, n_max), _np.int64)
    mask = _np.zeros((B, n_max), bool)
    for b in range(B):
        k = int(bnn[b])
        idx[b, :k] = _np.arange(offs[b], offs[b] + k)
        mask[b, :k] = True
    x = feat[jnp.asarray(idx)] * jnp.asarray(mask)[..., None]
    return x, jnp.asarray(mask)


def _from_dense_batch(graph, x, total_nodes):
    import numpy as _np

    bnn = _np.asarray(graph.batch_num_nodes())
    B = bnn.shape[0]
    offs = _np.concatenate([[0], _np.cumsum(bnn)])
    out = jnp.zeros((total_nodes,) + x.shape[2:], x.dtype)
    for b in range(B):
        k = int(bnn[b])
        out = out.at[offs[b] : offs[b] + k].set(x[b, :k])
    return out
