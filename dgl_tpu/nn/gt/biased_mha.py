"""Dense multi-head attention with additive structural bias (reference
``python/dgl/nn/pytorch/gt/biased_mha.py``) — the Graphormer attention core.
Pure MXU matmuls on (B, N, D) padded batches."""
from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn


class BiasedMHA(nn.Module):
    """(reference ``biased_mha.py:9``)."""

    feat_size: int
    num_heads: int
    bias: bool = True
    attn_bias_type: str = "add"  # 'add' | 'mul'
    attn_drop: float = 0.1

    @nn.compact
    def __call__(self, ndata, attn_bias=None, attn_mask=None,
                 deterministic: bool = True):
        H = self.num_heads
        D = self.feat_size // H
        scaling = D ** -0.5
        q = nn.Dense(self.feat_size, use_bias=self.bias, name="q_proj")(ndata)
        k = nn.Dense(self.feat_size, use_bias=self.bias, name="k_proj")(ndata)
        v = nn.Dense(self.feat_size, use_bias=self.bias, name="v_proj")(ndata)
        B, N = ndata.shape[0], ndata.shape[1]
        q = q.reshape(B, N, H, D).transpose(0, 2, 1, 3) * scaling
        k = k.reshape(B, N, H, D).transpose(0, 2, 3, 1)
        v = v.reshape(B, N, H, D).transpose(0, 2, 1, 3)
        attn = jnp.einsum("bhnd,bhdm->bhnm", q, k)  # (B,H,N,N)
        if attn_bias is not None:
            ab = attn_bias.transpose(0, 3, 1, 2)  # (B,H,N,N)
            if self.attn_bias_type == "add":
                attn = attn + ab
            else:
                attn = attn * ab
        if attn_mask is not None:
            # large-negative (not -inf): fully-masked padding rows would
            # otherwise produce NaN through softmax
            attn = jnp.where(attn_mask[:, None, :, :], -1e9, attn)
        attn = jax.nn.softmax(attn, axis=-1)
        if self.attn_drop > 0 and not deterministic:
            attn = nn.Dropout(self.attn_drop, deterministic=False)(attn)
        out = jnp.einsum("bhnm,bhmd->bhnd", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(B, N, self.feat_size)
        return nn.Dense(self.feat_size, name="out_proj")(out)
