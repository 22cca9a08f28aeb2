"""Edge-augmented Graph Transformer layer (reference
``python/dgl/nn/pytorch/gt/egt.py``): node and edge (pair) channels update
each other through gated attention."""
from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn


class EGTLayer(nn.Module):
    """(reference ``egt.py:12``)."""

    feat_size: int
    edge_feat_size: int
    num_heads: int
    num_virtual_nodes: int = 0
    dropout: float = 0.0
    attn_dropout: float = 0.0
    activation=jax.nn.elu
    edge_update: bool = True

    @nn.compact
    def __call__(self, nfeat, efeat, mask=None, deterministic: bool = True):
        H = self.num_heads
        D = self.feat_size // H
        B, N = nfeat.shape[0], nfeat.shape[1]
        norm_n = nn.LayerNorm(name="mha_ln_h")(nfeat)
        norm_e = nn.LayerNorm(name="mha_ln_e")(efeat)
        qkv = nn.Dense(self.feat_size * 3, name="qkv_proj")(norm_n)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        E_bias = nn.Dense(H, name="e_bias")(norm_e)          # (B,N,N,H)
        gates = nn.Dense(H, name="e_gate")(norm_e)           # (B,N,N,H)
        q = q.reshape(B, N, H, D)
        k = k.reshape(B, N, H, D)
        v = v.reshape(B, N, H, D)
        attn_hat = jnp.einsum("bnhd,bmhd->bnmh", q, k) / jnp.sqrt(D)
        attn_hat = attn_hat + E_bias
        if mask is not None:
            attn_hat = attn_hat + mask[..., None]
        gated = jax.nn.sigmoid(gates)
        attn = jax.nn.softmax(attn_hat, axis=2) * gated
        if self.attn_dropout > 0 and not deterministic:
            attn = nn.Dropout(self.attn_dropout, deterministic=False)(attn)
        out = jnp.einsum("bnmh,bmhd->bnhd", attn, v).reshape(B, N, self.feat_size)
        out = nn.Dense(self.feat_size, name="mha_out")(out)
        if self.dropout > 0 and not deterministic:
            out = nn.Dropout(self.dropout, deterministic=False)(out)
        nfeat = nfeat + out
        # node FFN
        h = nn.LayerNorm(name="ffn_ln_h")(nfeat)
        h = nn.Dense(self.feat_size * 2, name="ffn_h0")(h)
        h = jax.nn.elu(h)
        h = nn.Dense(self.feat_size, name="ffn_h1")(h)
        if self.dropout > 0 and not deterministic:
            h = nn.Dropout(self.dropout, deterministic=False)(h)
        nfeat = nfeat + h
        if self.edge_update:
            e_out = nn.Dense(self.edge_feat_size, name="e_out")(attn_hat)
            if self.dropout > 0 and not deterministic:
                e_out = nn.Dropout(self.dropout, deterministic=False)(e_out)
            efeat = efeat + e_out
            e = nn.LayerNorm(name="ffn_ln_e")(efeat)
            e = nn.Dense(self.edge_feat_size * 2, name="ffn_e0")(e)
            e = jax.nn.elu(e)
            e = nn.Dense(self.edge_feat_size, name="ffn_e1")(e)
            if self.dropout > 0 and not deterministic:
                e = nn.Dropout(self.dropout, deterministic=False)(e)
            efeat = efeat + e
            return nfeat, efeat
        return nfeat
